#!/usr/bin/env python
"""Saturation-cull POTENTIAL at sub-tile granularity and looser
thresholds: walks the staged bench frame's worklist with the kernel's
math, tracking per-pixel transmittance, and reports for each
(threshold, band split) the pair mass at entries where ALL bands are
saturated (tile-grain equivalent = what the shipped cull removes) vs
where the entry's pairs could be culled per band (upper bound).

Run: python benchmarks/dbg_satbands.py
"""

import functools
import json
import os
import sys

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
    from gswt_renderer_tpu.core.config import RenderConfig, SurfaceType
    from gswt_renderer_tpu.io.synth import synthetic_scene_vec
    from gswt_renderer_tpu.ops import raster
    from gswt_renderer_tpu.render.pipeline import Renderer, RendererConfig
    from gswt_renderer_tpu.render.uniforms import SceneParams
    from gswt_renderer_tpu.tiles import WangTileEngine
    from saturation import _front_outputs

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
    r.render(None, camera, sp, rc, staged=staged, as_numpy=False,
             use_skybox=True, use_proxy=True)
    binned, depth_tiles = _front_outputs(r, staged, camera, sp, rc)

    c = r.cfg
    chunk, tw, th = c.chunk, c.tile_w, c.tile_h
    p_n = tw * th
    dt3 = depth_tiles.reshape(depth_tiles.shape[0], 1, -1)
    table = binned["table"]
    e_tf = binned["entry_tf"]
    e_chunk = binned["entry_chunk"]
    r_start = binned["range_start"]
    r_end = binned["range_end"]
    n_bands = 4
    bh = th // n_bands

    def step(arrs, t_carry, e):
        table, e_tf, e_chunk, r_start, r_end, dt3 = arrs
        tf = e_tf[e]
        tile = tf & 0xFFFFFF
        first = ((tf >> 24) & 1) == 1
        alive = ((tf >> 26) & 1) == 1
        ec = e_chunk[e]
        t0 = jnp.where(first, jnp.ones_like(t_carry), t_carry)
        # per-band max T BEFORE this entry (flat p = y*tw + x -> band =
        # p // (bh*tw)); outside Mosaic a reshape is fine
        bmax = jnp.max(t0.reshape(n_bands, bh * tw), axis=1)  # [4]
        slot = ec * chunk + jnp.arange(chunk, dtype=jnp.int32)[:, None]
        in_run = (slot >= r_start[tile]) & (slot < r_end[tile])
        n_in = jnp.sum(in_run.astype(jnp.int32))
        tbl = jax.lax.dynamic_slice(
            table, (0, ec * chunk), (table.shape[0], chunk))
        run_live = r_start[tile] < r_end[tile]
        sat_hard = jnp.max(t0) < raster.MIN_T
        do = alive & run_live & (~sat_hard)

        def live(_):
            _, t_next, _ = raster._entry_body(
                tbl, dt3[tile], tile, ec, t0, r_start, r_end,
                tw=tw, th=th, chunk=chunk, exact=c.exact, use_depth=True)
            return t_next

        t_next = jax.lax.cond(do, live, lambda _: t0, None)
        out = dict(n_in=jnp.where(alive & run_live, n_in, 0),
                   bmax=bmax, tile=tile,
                   alive=(alive & run_live).astype(jnp.int32))
        return t_next, out

    ne = int(e_tf.shape[0])
    scan = jax.jit(lambda arrs: jax.lax.scan(
        functools.partial(step, arrs),
        jnp.ones((1, p_n), jnp.float32), jnp.arange(ne)))
    _, outs = scan((table, e_tf, e_chunk, r_start, r_end, dt3))
    outs = jax.device_get(outs)

    n_in = outs["n_in"]
    bmax = outs["bmax"]  # [ne, 4]
    total = int(n_in.sum())
    res = {"pairs_total": total}
    for name, eps in (("0.5/255", 0.5 / 255), ("1/255", 1 / 255),
                      ("2/255", 2 / 255), ("4/255", 4 / 255)):
        all_sat = (bmax < eps).all(axis=1)
        any_sat = (bmax < eps).any(axis=1)
        # fraction of bands saturated weights the upper bound per entry
        frac_sat = (bmax < eps).mean(axis=1)
        res[name] = {
            "tile_grain_pairs": int(n_in[all_sat].sum()),
            "tile_grain_frac": round(float(n_in[all_sat].sum()) / total, 3),
            "band_any_pairs": int(n_in[any_sat].sum()),
            "band_any_frac": round(float(n_in[any_sat].sum()) / total, 3),
            "band_weighted_frac": round(
                float((n_in * frac_sat).sum()) / total, 3),
        }
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
