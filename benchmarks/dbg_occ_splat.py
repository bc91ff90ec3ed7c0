#!/usr/bin/env python
"""Diagnose the splat-level proxy-occlusion cull on the real bench scene:
why does the pair-level cull remove 85% of pairs while the splat-level
cull (bbox <= 2x2 + dilated max) removes ~0 splats?

Prints the live-splat bbox-size distribution, the fraction of live splats
whose z clears the per-tile max everywhere vs the dilated max, and where
the dilated max is contaminated by far (non-proxy) values.
"""

import os
import sys
import functools

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    from gswt_renderer_tpu.core import Camera, UserData
    from gswt_renderer_tpu.core.camera import CameraUniforms
    from gswt_renderer_tpu.core.config import RenderConfig, SurfaceType
    from gswt_renderer_tpu.io.synth import synthetic_scene_vec
    from gswt_renderer_tpu.ops import binning, project
    from gswt_renderer_tpu.render.pipeline import Renderer, RendererConfig
    from gswt_renderer_tpu.render.uniforms import SceneParams
    from gswt_renderer_tpu.tiles import WangTileEngine

    scene_vec = synthetic_scene_vec(n_lod=3, splats_per_tile=512, seed=0)
    eng = WangTileEngine(scene_vec)
    ud = UserData.from_ui(
        tile_map_half_wh=(48, 48), tile_width=4.0,
        surface_type=SurfaceType.HEIGHT_MAP, height_map_wh=(10, 10),
        height_map_scale=(1.0, 0.3), lod_max_dist=96.0,
        lod_transition_width_ratio=0.05, merge_dot_threshold=0.2,
        merge_topk=100, cache_size=1024,
    )
    eng.configure(ud)
    cam_pos = np.array([0.0, 0.0, 5.0], np.float32)
    eng.build_tiles(cam_pos)
    camera = Camera((1920, 1080), cam_pos, (0.0, 30.0, 2.0), (0.0, 0.0, 1.0),
                    np.deg2rad(45.0), 0.1, 1000.0)
    dt = eng.sort_tiles(cam_pos, camera.view_proj())
    sky = np.clip(np.linspace(0, 4, 64)[:, None, None]
                  * np.ones((64, 128, 3), np.float32), 0, 4)
    checker = np.kron(np.indices((64, 64)).sum(0) % 2,
                      np.ones((8, 8))).astype(np.float32)
    tex = np.stack([checker * 0.8 + 0.1, checker * 0.5 + 0.2,
                    checker * 0.3 + 0.1], axis=-1)

    r = Renderer(eng, RendererConfig(width=1920, height=1080))
    r.configure(ud)
    r.set_skybox(sky, equirect=True)
    r.set_proxy(tex)
    rc = RenderConfig.new(eng.n_tiles[0])
    sp = SceneParams.from_data(ud, eng.center_coord, rc)
    staged = r.stage(dt, camera, rc.culling_dist)
    # one real render to set buckets + proxy buffers
    img = r.render(None, camera, sp, rc, staged=staged, as_numpy=False,
                   use_skybox=True, use_proxy=True)
    _ = jax.device_get(img[..., 3].sum())

    c = r.cfg
    prox = dict(
        atlas=r.proxy_tex,
        verts=getattr(r, "proxy_verts", jnp.zeros((2, 4), jnp.float32)),
        tris=getattr(r, "proxy_tris", jnp.zeros((3, 2), jnp.int32)),
    )
    uniforms = jnp.asarray(r.pack_frame_uniforms(
        sp, CameraUniforms(camera), list(rc.lod_enable or [True] * 16),
        rc.culling_dist))
    proxy_opts = (
        ("height_offset", float(rc.proxy_height)),
        ("brightness", float(rc.proxy_brightness)),
        ("black_background", bool(rc.proxy_black_background)),
        ("use_clip", bool(rc.use_clip)),
        ("clip_height", float(rc.clip_height)),
        ("mip_meta", getattr(r, "proxy_mip_meta", ((1, 1, 0),))),
        ("proxy_pairs", r._proxy_bucket()),
    )

    @functools.partial(jax.jit, static_argnames=())
    def extract(store, panels, blocks, merged, draw, uniforms, hm4, sky,
                prox, hm_src):
        scene, cam, lod_enable, culling_dist, gs_enable = (
            r.unpack_frame_uniforms(uniforms))
        with jax.default_matmul_precision("highest"):
            keep = project.cull_draws(draw, cam, culling_dist, lod_enable)
            p = project.assemble_and_project(
                blocks, dict(merged)["merged"] if isinstance(merged, dict)
                else merged, panels, keep, store, scene, cam, hm4,
                r.height_map_wh, surface_type=int(sp.surface_type),
                draw_mode=int(rc.draw_mode), image_wh=(c.width, c.height),
                point_cloud=False, gs_enable=gs_enable, interpret=False,
                exact=c.exact, hm_src=hm_src,
            )
        return dict(cx=p["cx"], cy=p["cy"], ex=p["ext_x"], ey=p["ext_y"],
                    z=p["z"], valid=p["valid"])

    hm_src = getattr(r, "hm_src", None)
    if hm_src is None:
        hm_src = jnp.zeros((1, 1), jnp.float32)
    px = extract(r.store_packed, r.panels, staged["stream"]["blocks"],
                 staged["stream"]["merged"], staged["draw"], uniforms,
                 r.hm4, r.skybox_tex, r.proxy_tex, hm_src)
    px = {k: np.asarray(v) for k, v in px.items()}

    # occ_zimg via the real frame-front program
    statics = dict(surface_type=int(sp.surface_type),
                   draw_mode=int(rc.draw_mode), point_cloud=False,
                   use_skybox=True, use_proxy=True,
                   proxy_opts=dict(proxy_opts))
    front = jax.jit(functools.partial(r._frame_front, **statics))
    binned, bg, depth_tiles, aux = front(
        r.store_packed, r.panels, staged["stream"], staged["draw"], uniforms,
        r.hm4, r.skybox_tex, prox, hm_src)
    depth_tiles = np.asarray(depth_tiles)
    ntx = -(-c.width // c.tile_w)
    nty = -(-c.height // c.tile_h)
    zimg = depth_tiles.max(axis=1).reshape(nty, ntx)
    zmin = depth_tiles.min(axis=1).reshape(nty, ntx)

    print("zimg stats: min %.4f max %.4f  far(=1.0 fraction) %.3f" % (
        zimg.min(), zimg.max(), float((zimg >= 0.9999).mean())))
    print("zimg rows (max per row):",
          np.array2string(zimg.max(axis=1), precision=3))

    w_img, h_img = c.width, c.height
    tw, th = c.tile_w, c.tile_h
    cx, cy, ex, ey = px["cx"], px["cy"], px["ex"], px["ey"]
    x0 = np.clip(np.floor((cx - ex) / tw).astype(np.int32), 0, ntx - 1)
    x1 = np.clip(np.floor((cx + ex) / tw).astype(np.int32), 0, ntx - 1)
    y0 = np.clip(np.floor((cy - ey) / th).astype(np.int32), 0, nty - 1)
    y1 = np.clip(np.floor((cy + ey) / th).astype(np.int32), 0, nty - 1)
    onscreen = ((cx + ex >= 0) & (cx - ex < w_img) & (cy + ey >= 0)
                & (cy - ey < h_img))
    ok = px["valid"] & onscreen
    print("cfg.exact =", c.exact)
    zk_f32 = px["z"]
    # true bf16 round-to-nearest (what binning/_pz use in the fast profile)
    zk_bf = np.asarray(
        jnp.asarray(px["z"]).astype(jnp.bfloat16).astype(jnp.float32))
    zk = zk_f32 if c.exact else zk_bf
    nxs = x1 - x0 + 1
    nys = y1 - y0 + 1
    live = ok
    print("live splats:", live.sum())
    print("z stats (live): f32 [%.5f, %.5f]; bf16==1.0 fraction %.3f; "
          "bf16>=0.9961 fraction %.3f" % (
              zk_f32[live].min(), zk_f32[live].max(),
              (zk_bf[live] >= 1.0).mean(), (zk_bf[live] >= 0.9961).mean()))
    bb = (nxs * nys)[live]
    print("bbox tile-count distribution (live):",
          {int(k): int(v) for k, v in
           zip(*np.unique(np.minimum(bb, 9), return_counts=True))})
    small = (x1 - x0 <= 1) & (y1 - y0 <= 1)
    print("small (<=2x2) fraction of live: %.3f" % small[live].mean())

    zdil = np.asarray(binning._dilate_max2(zimg))
    lk_dil = zdil[np.clip(y0, 0, nty - 1), np.clip(x0, 0, ntx - 1)]
    culled_splat = live & small & (zk >= lk_dil)
    print("splat-level culled:", culled_splat.sum())
    # replicate the EXACT binning condition on-device (one-hot lookup
    # path) to rule out numpy-emulation drift
    occ_dev = np.asarray(binning._zmax_lookup(
        jnp.asarray(x0), jnp.asarray(y0),
        binning._dilate_max2(jnp.asarray(zimg))))
    culled_dev = live & small & (zk >= occ_dev)
    print("splat-level culled (device lookup):", culled_dev.sum(),
          "lookup mismatch vs numpy:",
          int((np.abs(occ_dev - lk_dil) > 1e-6).sum()))
    # pair-level comparison at the splat's own (x0, y0) tile
    lk00_ = zimg[y0, x0]
    print("pairs at (x0,y0) culled (z>=tile max):",
          int((live & (zk >= lk00_)).sum()), "of", int(live.sum()))

    # exact per-splat occlusion: z >= per-tile max for EVERY bbox tile
    # (vectorized over the <=2x2 window for small splats)
    lk00 = zimg[y0, x0]
    lk01 = zimg[y0, np.minimum(x0 + 1, ntx - 1)]
    lk10 = zimg[np.minimum(y0 + 1, nty - 1), x0]
    lk11 = zimg[np.minimum(y0 + 1, nty - 1), np.minimum(x0 + 1, ntx - 1)]
    use01 = nxs > 1
    use10 = nys > 1
    use11 = use01 & use10
    exact_max = np.maximum.reduce([
        lk00,
        np.where(use01, lk01, -np.inf),
        np.where(use10, lk10, -np.inf),
        np.where(use11, lk11, -np.inf),
    ])
    fully_occ_small = live & small & (zk >= exact_max)
    print("exact fully-occluded small splats:", fully_occ_small.sum(),
          "(missed by dilation: %d)" %
          (fully_occ_small & ~culled_splat).sum())
    # margin distribution for the missed ones
    missed = fully_occ_small & ~culled_splat
    if missed.sum():
        print("  dilated-max at missed splats (far fraction):",
              float((lk_dil[missed] >= 0.9999).mean()))
    print("aux:", {k: (int(v) if np.ndim(v) == 0 else list(np.asarray(v)))
                   for k, v in
                   {k: jax.device_get(v) for k, v in aux.items()}.items()})


if __name__ == "__main__":
    main()
