from .oracle import render_oracle, project_draw_np, assemble_stream_np
