"""CLI end-to-end: headless fly-path render on a tiny synthetic scene."""

import json
import os

import numpy as np
import pytest

from gswt_renderer_tpu.viewer import cli


def test_cli_render_headless(tmp_path):
    fp = [
        dict(timestamp=0.0, position_x=0.0, position_y=0.0, position_z=5.0,
             target_x=0.0, target_y=5.0, target_z=1.0),
        dict(timestamp=0.5, position_x=1.0, position_y=1.0, position_z=5.0,
             target_x=1.0, target_y=6.0, target_z=1.0),
    ]
    fp_path = tmp_path / "path.json"
    fp_path.write_text(json.dumps(fp))
    out_dir = tmp_path / "frames"
    cli.main([
        "render",
        "--fly-path", str(fp_path),
        "--out", str(out_dir),
        "--size", "64x64",
        "--half", "1",
        "--surface", "none",
        "--merge", "none",
        "--tile-sort", "distance",
        "--synth-lods", "2",
        "--synth-splats", "32",
        "--fps", "4",
        "--sync",
    ])
    frames = sorted(os.listdir(out_dir))
    assert len(frames) >= 1
    data = (out_dir / frames[0]).read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"


def test_cli_bench_headless(tmp_path, capsys):
    cli.main([
        "bench",
        "--size", "64x64",
        "--half", "1",
        "--surface", "none",
        "--merge", "none",
        "--tile-sort", "distance",
        "--synth-lods", "2",
        "--synth-splats", "32",
        "--sync",
    ])
    out = capsys.readouterr().out
    assert "fps" in out and "\\pm" in out
