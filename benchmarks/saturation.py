#!/usr/bin/env python
"""Measure the raster's per-tile saturation / occlusion structure.

VERDICT r4 lead #2: "most tiles saturate long before their pair run ends
— measure the distribution first". This walks one staged bench frame's
worklist with the SAME per-entry math as the Pallas kernel
(ops/raster._entry_body) via lax.scan and reports:

  - how many worklist entries the in-kernel saturation early-exit
    (max pixel T < MIN_T) already skips, and the pair-lanes inside them
  - the per-tile saturation profile: fraction of each tile's chunk run
    actually needed before the whole 64x32 tile saturates
  - the proxy-depth occlusion mass: pairs whose z >= the tile's MAX
    proxy depth contribute nothing anywhere in the tile (the kernel's
    per-pixel depth test zeroes them) — the upper bound for a pair-level
    depth cull in binning

Run: python benchmarks/saturation.py [--dense]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dense", action="store_true",
                    help="8k-splat 5-LOD dense scene instead of headline")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        ),
    )
    from gswt_renderer_tpu.core import Camera, UserData
    from gswt_renderer_tpu.core.config import RenderConfig, SurfaceType
    from gswt_renderer_tpu.io.synth import synthetic_scene_vec
    from gswt_renderer_tpu.ops import raster
    from gswt_renderer_tpu.render.pipeline import Renderer, RendererConfig
    from gswt_renderer_tpu.render.uniforms import SceneParams
    from gswt_renderer_tpu.tiles import WangTileEngine

    if args.dense:
        scene_vec = synthetic_scene_vec(n_lod=5, splats_per_tile=8192,
                                        lod_decay=4)
    else:
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

    r = Renderer(eng, RendererConfig(width=1920, height=1080))
    r.configure(ud)
    sky = np.clip(np.linspace(0, 4, 64)[:, None, None]
                  * np.ones((64, 128, 3), np.float32), 0, 4)
    r.set_skybox(sky, equirect=True)
    checker = np.kron(np.indices((64, 64)).sum(0) % 2,
                      np.ones((8, 8))).astype(np.float32)
    r.set_proxy(np.stack([checker * 0.8 + 0.1, checker * 0.5 + 0.2,
                          checker * 0.3 + 0.1], axis=-1))

    rc = RenderConfig.new(eng.n_tiles[0])
    sp = SceneParams.from_data(ud, eng.center_coord, rc)
    staged = r.stage(dt, camera, rc.culling_dist)
    # one full render to settle adaptive buckets, then grab the front
    # program's outputs exactly as Renderer.render would
    r.render(None, camera, sp, rc, staged=staged, as_numpy=False,
             use_skybox=True, use_proxy=True)
    binned, depth_tiles = _front_outputs(r, staged, camera, sp, rc)

    c = r.cfg
    chunk = c.chunk
    tw, th = c.tile_w, c.tile_h
    table = binned["table"]
    e_tf = binned["entry_tf"]
    e_chunk = binned["entry_chunk"]
    r_start = binned["range_start"]
    r_end = binned["range_end"]
    dt3 = depth_tiles.reshape(depth_tiles.shape[0], 1, -1)
    zmax = jnp.max(dt3[:, 0, :], axis=1)  # [T] per-tile max proxy depth

    min_t = raster.MIN_T

    def step(arrs, carry, e):
        table, e_tf, e_chunk, r_start, r_end, dt3, zmax = arrs
        t_carry = carry
        tf = e_tf[e]
        tile = tf & 0xFFFFFF
        first = ((tf >> 24) & 1) == 1
        alive = ((tf >> 26) & 1) == 1
        ec = e_chunk[e]
        t0 = jnp.where(first, jnp.ones_like(t_carry), t_carry)
        sat = jnp.max(t0) < min_t
        slot = ec * chunk + jnp.arange(chunk, dtype=jnp.int32)[:, None]
        in_run = (slot >= r_start[tile]) & (slot < r_end[tile])
        n_in = jnp.sum(in_run.astype(jnp.int32))
        tbl = jax.lax.dynamic_slice(
            table, (0, ec * chunk), (table.shape[0], chunk))
        z = tbl[6, :][:, None]
        occ = jnp.sum((in_run & (z >= zmax[tile])).astype(jnp.int32))
        run_live = r_start[tile] < r_end[tile]
        do = alive & run_live & (~sat)

        def live(_):
            _, t_next, _ = raster._entry_body(
                tbl, dt3[tile], tile, ec, t0, r_start, r_end,
                tw=tw, th=th, chunk=chunk, exact=c.exact, use_depth=True)
            return t_next

        t_next = jax.lax.cond(do, live, lambda _: t0, None)
        out = dict(
            n_in=jnp.where(alive, n_in, 0),
            n_in_sat=jnp.where(alive & sat, n_in, 0),
            skipped=(alive & run_live & sat).astype(jnp.int32),
            live=(alive & run_live).astype(jnp.int32),
            occ=jnp.where(alive, occ, 0),
            tile=tile,
            min_t0=jnp.max(t0),
        )
        return t_next, out

    ne = int(e_tf.shape[0])
    p_n = tw * th
    import functools
    scan = jax.jit(lambda arrs: jax.lax.scan(
        functools.partial(step, arrs),
        jnp.ones((1, p_n), jnp.float32), jnp.arange(ne)))
    _, outs = scan((table, e_tf, e_chunk, r_start, r_end, dt3, zmax))
    outs = jax.device_get(outs)

    n_in = outs["n_in"]
    total_pairs = int(n_in.sum())
    sat_pairs = int(outs["n_in_sat"].sum())
    occ_pairs = int(outs["occ"].sum())
    n_live_entries = int(outs["live"].sum())
    n_skipped = int(outs["skipped"].sum())

    # per-tile profile: entries needed / entries present
    tiles = outs["tile"]
    live_m = outs["live"].astype(bool)
    skip_m = outs["skipped"].astype(bool)
    prof = {}
    for t, lv, sk in zip(tiles, live_m, skip_m):
        if lv:
            a, b = prof.get(int(t), (0, 0))
            prof[int(t)] = (a + 1, b + (0 if sk else 1))
    fracs = np.array([needed / tot for tot, needed in prof.values()
                      if tot >= 4])
    print(json.dumps({
        "scene": "dense" if args.dense else "headline",
        "n_entries": ne,
        "live_entries": n_live_entries,
        "entries_skipped_by_saturation": n_skipped,
        "skip_frac_entries": round(n_skipped / max(n_live_entries, 1), 4),
        "pairs_total": total_pairs,
        "pairs_in_skipped_entries": sat_pairs,
        "skip_frac_pairs": round(sat_pairs / max(total_pairs, 1), 4),
        "pairs_fully_proxy_occluded": occ_pairs,
        "occ_frac_pairs": round(occ_pairs / max(total_pairs, 1), 4),
        "tiles_with_runs_ge4_entries": int(len(fracs)),
        "needed_frac_per_tile": {
            "p10": round(float(np.percentile(fracs, 10)), 3),
            "p50": round(float(np.percentile(fracs, 50)), 3),
            "p90": round(float(np.percentile(fracs, 90)), 3),
            "mean": round(float(fracs.mean()), 3),
        } if len(fracs) else None,
    }), flush=True)


def _front_outputs(r, staged, camera, sp, rc):
    """Re-run the (already compiled) front program the way render() does
    and return (binned, depth_tiles)."""
    import jax.numpy as jnp
    import numpy as np

    from gswt_renderer_tpu.render.uniforms import CameraUniforms

    proxy_opts = (
        ("height_offset", float(rc.proxy_height)),
        ("brightness", float(rc.proxy_brightness)),
        ("black_background", bool(rc.proxy_black_background)),
        ("use_clip", bool(rc.use_clip)),
        ("clip_height", float(rc.clip_height)),
        ("mip_meta", getattr(r, "proxy_mip_meta", ((1, 1, 0),))),
        ("mip_pyr", getattr(r, "proxy_pyr_meta", None)
         if not r.cfg.exact else None),
        ("proxy_pairs", r._proxy_bucket()),
    )
    mp = r._pairs_bucket(staged["s_pad"])
    ml = r._live_bucket(staged["s_pad"])
    key = (staged["s_pad"], mp, r._ne_bucket(staged["s_pad"], mp, ml), ml,
           int(sp.surface_type), int(rc.draw_mode),
           bool(rc.draw_point_cloud), True, True, proxy_opts,
           r._live_path_buckets(staged["s_pad"], ml))
    fn = r._get_jit(key)
    prox = dict(atlas=r.proxy_tex, verts=r.proxy_verts, tris=r.proxy_tris)
    if not r.cfg.exact and getattr(r, "proxy_pyr", None) is not None:
        prox["pyr"] = r.proxy_pyr
    uniforms = jnp.asarray(r.pack_frame_uniforms(
        sp, CameraUniforms(camera), list(rc.lod_enable or [True] * 16),
        rc.culling_dist, render_gs=True))
    binned, bg, depth_tiles, aux = fn(
        r.store_packed, r.panels, staged["stream"], staged["draw"],
        uniforms, r.hm4, r.skybox_tex, prox, getattr(r, "hm_src", None))
    return binned, depth_tiles


if __name__ == "__main__":
    main()
