#!/usr/bin/env python
"""A/B the blocked raster kernel's entries-per-step (rasterize_pallas
step=1|2|4|8) on realistic synthetic binned input at the 1080p headline
scale, all in one process (step is a call parameter, not an import-time
toggle). step=1 is the per-entry kernel (BlockSpec table fetch + one
output flush per grid step); step>1 amortizes Mosaic's fixed per-step
cost (~0.8-1.7 us measured) across S entries via paired table
superblocks.

Timing: dispatch N frames back-to-back, fetch ONE dependent scalar at the
end (the dev harness's block_until_ready does not block; per-call fetches
would add a ~30 ms round trip per frame).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    print(f"scan_impl={raster._SCAN_IMPL} chunk={chunk} entries={ne}")

    use_depth = os.environ.get("GSWT_AB_DEPTH", "0") == "1"

    def render(b, d, step):
        return raster.rasterize_pallas(
            b, d, image_wh=image_wh, tile_wh=tile_wh, chunk=chunk,
            exact=False, use_depth=use_depth, step=step)

    def run(step, n=30, reps=3):
        f = jax.jit(lambda b, d: jnp.sum(render(b, d, step)))
        _ = jax.device_get(f(binned, depth))  # compile + warm
        best = []
        for _ in range(reps):
            t0 = time.time()
            acc = None
            for _ in range(n):
                acc = f(binned, depth)
            # dispatches execute in order on the single core; fetching
            # the last result is a completion barrier for all of them
            _ = jax.device_get(acc)
            best.append((time.time() - t0) / n * 1e3)
        return float(np.min(best))

    ref = None
    for step in (1, 2, 4, 8):
        ms = run(step)
        img = np.asarray(jax.device_get(
            jax.jit(lambda b, d: render(b, d, step))(binned, depth)))
        if ref is None:
            ref = img
            err = 0.0
        else:
            err = float(np.abs(img - ref).max())
        print(f"step={step}: {ms:7.2f} ms/frame   max|err| vs step1: {err:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
