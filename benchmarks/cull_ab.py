#!/usr/bin/env python
"""Same-session end-to-end A/B of the round-4 work-reduction culls on the
full-config (skybox + proxy) 1080p bench scene (VERDICT r4 next-round #2):

    variant "off"  — depth_cull=0, sat_cull=0 (round-3 configuration)
    variant "dc"   — depth_cull=1, sat_cull=0 (proxy-depth occlusion cull)
    variant "sat"  — depth_cull=1, sat_cull=1 (banded SAT_BANDS temporal
                     saturation cull; HEAD's shipped combination)

Each variant is its own Renderer over ONE shared engine/scene; measured at
TWO cameras (the bench fly path's t=0 pose and a mid-path pose) with warm
frames first so the sat cut converges (static camera = the cull's best
case). Reports device-complete frame ms + the binning pair counters.

Run: python benchmarks/cull_ab.py [-n 16]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=16)
    args = ap.parse_args()
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    from gswt_renderer_tpu.core import Camera, UserData, hintstore
    from gswt_renderer_tpu.core.config import RenderConfig, SurfaceType
    from gswt_renderer_tpu.io.synth import synthetic_scene_vec
    from gswt_renderer_tpu.render.pipeline import Renderer, RendererConfig
    from gswt_renderer_tpu.render.uniforms import SceneParams
    from gswt_renderer_tpu.tiles import WangTileEngine

    width, height = 1920, 1080
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
    sky = np.clip(np.linspace(0, 4, 64)[:, None, None]
                  * np.ones((64, 128, 3), np.float32), 0, 4)
    checker = np.kron(np.indices((64, 64)).sum(0) % 2,
                      np.ones((8, 8))).astype(np.float32)
    tex = np.stack([checker * 0.8 + 0.1, checker * 0.5 + 0.2,
                    checker * 0.3 + 0.1], axis=-1)
    rc = RenderConfig.new(eng.n_tiles[0])
    sp = SceneParams.from_data(ud, eng.center_coord, rc)

    # bench fly-path poses (bench.py keyframes at t=0 and t=10)
    cams = [
        ((0.0, 0.0, 5.0), (0.0, 30.0, 2.0)),
        ((2.0, 40.0, 6.0), (-20.0, 60.0, 1.0)),
    ]

    def measure(name, dc, sat, hint_key_suffix):
        rcfg = RendererConfig(width=width, height=height,
                              depth_cull=dc, sat_cull=sat)
        r = Renderer(eng, rcfg)
        r.configure(ud)
        r.set_skybox(sky, equirect=True)
        r.set_proxy(tex)
        hkey = (f"v1_{width}x{height}_s512_l3_full"
                f"_t{rcfg.tile_w}x{rcfg.tile_h}_c{rcfg.chunk}"
                + ("_cull" if rcfg.cull_exact else "") + hint_key_suffix)
        hints = hintstore.load(hkey)
        if hints:
            r.set_bucket_hints(hints)
        out = {"variant": name, "hints": bool(hints), "cams": []}
        for ci, (pos, tgt) in enumerate(cams):
            cam_pos = np.array(pos, np.float32)
            eng.build_tiles(cam_pos)
            camera = Camera((width, height), cam_pos, tgt,
                            (0.0, 0.0, 1.0), np.deg2rad(45.0), 0.1, 1000.0)
            dt = eng.sort_tiles(cam_pos, camera.view_proj())
            staged = r.stage(dt, camera, rc.culling_dist)

            def frame():
                img = r.render(None, camera, sp, rc, staged=staged,
                               as_numpy=False, use_skybox=True,
                               use_proxy=True)
                jax.block_until_ready(img)

            t0 = time.time()
            frame()
            print(f"[{name}/cam{ci}] first frame (incl. compile) "
                  f"{time.time() - t0:.1f}s", file=sys.stderr)
            for _ in range(6):  # converge sat cut + buckets
                frame()
            ts = []
            for _ in range(args.n):
                t0 = time.time()
                frame()
                ts.append((time.time() - t0) * 1e3)
            ts = np.array(ts)
            aux = {k: (np.asarray(v).tolist() if hasattr(v, "tolist") else v)
                   for k, v in (r.last_aux or {}).items()}
            row = dict(
                cam=ci, mean_ms=round(float(ts.mean()), 1),
                median_ms=round(float(np.median(ts)), 1),
                min_ms=round(float(ts.min()), 1),
                n_pairs=aux.get("n_pairs"),
                n_pairs_kept=aux.get("n_pairs_kept"),
                n_entries=aux.get("n_entries"),
                n_live=aux.get("n_live"),
            )
            out["cams"].append(row)
            print(f"[{name}/cam{ci}] {row}", file=sys.stderr)
        print(json.dumps(out), flush=True)
        return out

    measure("off", dc=False, sat=False, hint_key_suffix="")
    measure("dc", dc=True, sat=False, hint_key_suffix="_dc")
    measure("sat", dc=True, sat=True, hint_key_suffix="_dc_sat")
    # session-drift check: re-measure the baseline last
    measure("off2", dc=False, sat=False, hint_key_suffix="")


if __name__ == "__main__":
    main()
