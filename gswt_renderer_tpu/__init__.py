"""gswt_renderer_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the GSWT renderer.

GSWT: "Gaussian Splatting Wang Tiles" (SIGGRAPH Asia 2025). The upstream
reference (zengyf131/gswt_renderer) is a Rust/WASM/wgpu real-time renderer for
infinite Gaussian-splat terrains built from Wang-tile sets. This package is a
ground-up TPU-first re-design with the same capabilities:

- ``io``        splat tile loading (PLY / .splat / zip), 32-byte packing,
                covariance precompute          (reference: scene.rs)
- ``tiles``     the Wang-tile engine: procedural tiling, 9-view presorting,
                LOD selection/blending, selective merging, tile ordering,
                surface mapping               (reference: wangtile.rs)
- ``ops``       device kernels: projection + EWA conic, stream assembly,
                tile binning, Pallas tile rasterizer, skybox/proxy passes
                                               (reference: gswt.wgsl & friends)
- ``render``    the jitted per-frame pipeline  (reference: renderer.rs)
- ``engine``    session loop, async builder thread, camera controls,
                fly-path benchmark             (reference: state.rs, control.rs)
- ``parallel``  multi-camera batching and multi-chip meshes (new, TPU-only)
- ``refrender`` a slow, exact NumPy transcription of the reference's WGSL
                math — the golden oracle for parity tests
- ``native``    C++ host runtime (counting sorts, PLY packing) via ctypes

Design stance: the wgpu architecture (vertex-shader splatting, per-tile draw
calls, CPU worker) is *not* transplanted. The TPU shape is a single jitted
frame function over dense HBM arrays, with ordered alpha compositing done via
a transmittance scan inside a Pallas kernel, and the branchy host logic
(graph toposort, greedy merging) kept on a builder thread exactly as the
reference overlaps its worker with rendering.
"""

__version__ = "0.1.0"
