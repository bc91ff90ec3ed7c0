from .project import assemble_and_project, cull_draws, build_uniform_table
from .binning import bin_pairs
from .raster import rasterize_reference, rasterize_pallas
