#!/usr/bin/env python
"""A/B raster scan implementations (GSWT_SCAN_IMPL=concat|roll) on realistic
synthetic binned input (micro_raster.make_binned). Run each arm in its own
process (the toggle is read at import):

    GSWT_SCAN_IMPL=concat python benchmarks/micro_scan_ab.py
    GSWT_SCAN_IMPL=roll   python benchmarks/micro_scan_ab.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from micro_raster import make_binned  # noqa: E402

from gswt_renderer_tpu.ops import raster  # noqa: E402


def main():
    image_wh = (1920, 1080)
    tile_wh = (64, 32)
    chunk = int(os.environ.get("GSWT_AB_CHUNK", "256"))
    tw, th = tile_wh
    ntx = -(-image_wh[0] // tw)
    nty = -(-image_wh[1] // th)
    binned = make_binned(1 << 22, image_wh, tile_wh, chunk)
    depth = jnp.ones((ntx * nty, th * tw), jnp.float32)
    ne = int(binned["entry_tf"].shape[0])
    print(f"scan_impl={raster._SCAN_IMPL} chunk={chunk} worklist entries={ne}")

    def render(b, d, exact):
        return raster.rasterize_pallas(
            b, d, image_wh=image_wh, tile_wh=tile_wh, chunk=chunk,
            exact=exact, use_depth=False)

    def run(exact, n=10):
        f = jax.jit(lambda b, d: jnp.sum(render(b, d, exact)))
        _ = jax.device_get(f(binned, depth))
        ts = []
        for _ in range(n):
            t0 = time.time()
            _ = jax.device_get(f(binned, depth))
            ts.append((time.time() - t0) * 1e3)
        return float(np.median(ts))

    if os.environ.get("GSWT_AB_FAST_ONLY", "0") != "1":
        t_exact = run(True)
        print(f"exact  (blocked scan, HIGHEST): {t_exact:7.1f} ms")
    t_fast = run(False)
    print(f"fast   (scan_impl={raster._SCAN_IMPL}):     {t_fast:7.1f} ms")
    if os.environ.get("GSWT_AB_FAST_ONLY", "0") == "1":
        return

    # error vs the exact kernel (the parity anchor)
    img_e = np.asarray(jax.device_get(
        jax.jit(lambda b, d: render(b, d, True))(binned, depth)))
    img_f = np.asarray(jax.device_get(
        jax.jit(lambda b, d: render(b, d, False))(binned, depth)))
    err = np.abs(img_e - img_f).max()
    print(f"fast-vs-exact max abs err: {err:.3e} (pipeline budget: max 8/255, see tests/test_fastmode.py)")


if __name__ == "__main__":
    main()
