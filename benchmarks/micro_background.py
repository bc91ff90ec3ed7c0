#!/usr/bin/env python
"""Microbenchmark the background passes at 1080p: skybox sampling, proxy
grid raster, mip sampling — the config-4 adders — plus raw gather cost
reference points (the dominant primitive).

    python benchmarks/micro_background.py [-n 8]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(name, fn, args, n):
    import jax

    jf = jax.jit(fn)
    t0 = time.time()
    out = jf(*args)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    print(f"[bg] {name}: compile+1st {time.time()-t0:.1f}s", file=sys.stderr)
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = jf(*args)
        _ = jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        ts.append((time.time() - t0) * 1e3)
    med = float(np.median(ts))
    print(f"[bg] {name}: median {med:.1f} ms", file=sys.stderr)
    return med


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=8)
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    from gswt_renderer_tpu.core.camera import Camera, CameraUniforms
    from gswt_renderer_tpu.io.textures import build_mip_chain
    from gswt_renderer_tpu.ops.proxy import (
        make_map_grid, pack_mip_atlas, raster_map_grid, sample_mip_trilinear,
        _uv_footprint,
    )
    from gswt_renderer_tpu.ops.skybox import render_skybox
    from gswt_renderer_tpu.render.pipeline import Renderer

    W, H = 1920, 1080
    image_wh = (W, H)
    n = args.n

    cam = Camera((W, H), np.array([0, 0, 5], np.float32), (0, 30, 2),
                 (0, 0, 1), np.deg2rad(45.0), 0.1, 2400.0)
    cu = CameraUniforms(cam)
    cam_d = Renderer.cam_dict(cu)

    # --- raw gather reference points ---
    P = W * H
    idx = jnp.asarray(np.random.randint(0, 1 << 20, P, np.int32))
    tab1 = jnp.asarray(np.random.rand(1 << 20).astype(np.float32))
    tab4 = jnp.asarray(np.random.rand(4, 1 << 20).astype(np.float32))
    bench("gather 2M idx x 1 comp", lambda t, i: t[i], (tab1, idx), n)
    bench("gather 2M idx x 4 comp", lambda t, i: t[:, i], (tab4, idx), n)
    idx_half = idx[: P // 4]
    bench("gather 0.5M idx x 4 comp", lambda t, i: t[:, i], (tab4, idx_half), n)

    # --- skybox (current equirect path) ---
    sky = jnp.asarray(np.clip(
        np.linspace(0, 4, 64)[:, None, None] * np.ones((64, 128, 3), np.float32),
        0, 4))
    bench("skybox equirect 1080p",
          lambda c, t: render_skybox(c, image_wh, t, equirect=True),
          (cam_d, sky), n)

    # --- proxy: grid raster alone, then mip sample alone ---
    checker = np.kron(np.indices((64, 64)).sum(0) % 2,
                      np.ones((8, 8))).astype(np.float32)
    ptex = np.stack([checker * 0.8 + 0.1, checker * 0.5 + 0.2,
                     checker * 0.3 + 0.1], axis=-1)
    mips = build_mip_chain(ptex)
    atlas, meta = pack_mip_atlas(mips)
    atlas = jnp.asarray(atlas)
    gv, gt = make_map_grid((97, 97), (48, 48), 4.0)
    print(f"[bg] map grid: {gv.shape[1]} verts, {gt.shape[1]} tris",
          file=sys.stderr)
    gv = jnp.asarray(gv)
    gt = jnp.asarray(gt)
    hm = np.random.rand(4, 1024 * 1024).astype(np.float32)
    hm4 = jnp.asarray(hm)
    scene = dict(
        map_half_wh=jnp.asarray([48, 48], jnp.int32),
        center_coord=jnp.asarray([0, 0], jnp.int32),
        tile_width=jnp.float32(4.0),
        height_map_scale=jnp.asarray([1.0, 1.0, 0.3], jnp.float32),
    )

    def grid_only(c, s, h, v, t):
        z, u, vv, mh, hit, npx, ovf = raster_map_grid(
            c, s, image_wh, h, (1024, 1024), v, t,
            surface_type=1, height_offset=0.0, tile_wh=(64, 32),
            chunk=128, interpret=False, max_pairs=1 << 17,
        )
        return z, u, vv

    bench("proxy grid raster (z+uv)", grid_only,
          (cam_d, scene, hm4, gv, gt), n)

    # mip sample alone on a synthetic smooth uv field
    uu = jnp.asarray(np.random.rand(H, W).astype(np.float32) * 4)
    vv = jnp.asarray(np.random.rand(H, W).astype(np.float32) * 4)

    def mip_only(a, u, v):
        rho = _uv_footprint(u, v, float(meta[0][0]), float(meta[0][1]))
        return sample_mip_trilinear(a, meta, u, v, rho)

    bench("mip trilinear sample 1080p", mip_only, (atlas, uu, vv), n)


if __name__ == "__main__":
    main()
