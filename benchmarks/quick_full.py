#!/usr/bin/env python
"""Quick full-config (skybox+proxy) 1080p frame timer for same-session
A/Bs: builds the bench config-4 scene at a fixed camera, times N
device-complete frames, prints ms stats + the renderer aux (pair domains).

    GSWT_DEPTH_CULL=0 python benchmarks/quick_full.py   # cull off
    python benchmarks/quick_full.py                     # default (on)
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=12)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--ab", action="store_true",
                    help="same-session A/B: sat cull on vs off")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    from gswt_renderer_tpu.core import Camera, UserData
    from gswt_renderer_tpu.core.config import RenderConfig, SurfaceType
    from gswt_renderer_tpu.io.synth import synthetic_scene_vec
    from gswt_renderer_tpu.render.pipeline import Renderer, RendererConfig
    from gswt_renderer_tpu.render.uniforms import SceneParams
    from gswt_renderer_tpu.tiles import WangTileEngine

    width, height = (960, 540) if args.small else (1920, 1080)
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
    camera = Camera((width, height), cam_pos, (0.0, 30.0, 2.0),
                    (0.0, 0.0, 1.0), np.deg2rad(45.0), 0.1, 1000.0)
    dt = eng.sort_tiles(cam_pos, camera.view_proj())

    sky = np.clip(np.linspace(0, 4, 64)[:, None, None]
                  * np.ones((64, 128, 3), np.float32), 0, 4)
    checker = np.kron(np.indices((64, 64)).sum(0) % 2,
                      np.ones((8, 8))).astype(np.float32)
    tex = np.stack([checker * 0.8 + 0.1, checker * 0.5 + 0.2,
                    checker * 0.3 + 0.1], axis=-1)

    rc = RenderConfig.new(eng.n_tiles[0])
    sp = SceneParams.from_data(ud, eng.center_coord, rc)

    def measure(sat: bool):
        r = Renderer(eng, RendererConfig(width=width, height=height,
                                         sat_cull=sat))
        r.configure(ud)
        r.set_skybox(sky, equirect=True)
        r.set_proxy(tex)
        staged = r.stage(dt, camera, rc.culling_dist)

        def frame():
            img = r.render(None, camera, sp, rc, staged=staged,
                           as_numpy=False, use_skybox=True, use_proxy=True)
            _ = jax.device_get(img[..., 3].sum())

        t0 = time.time()
        frame()
        print(f"[sat={sat}] first frame (incl. compile) "
              f"{time.time()-t0:.1f}s", file=sys.stderr)
        for _ in range(3):
            frame()
        aux = {k: (np.asarray(v).tolist() if hasattr(v, "tolist") else v)
               for k, v in (r.last_aux or {}).items()}
        print(f"[sat={sat}] aux:", aux, file=sys.stderr)
        ts = []
        for _ in range(args.n):
            t0 = time.time()
            frame()
            ts.append((time.time() - t0) * 1000.0)
        ts = np.array(ts)
        print(f"[sat={sat}] frame ms: mean {ts.mean():.1f}  "
              f"median {np.median(ts):.1f}  min {ts.min():.1f}  "
              f"(n={args.n}, incl. ~sync overhead)")
        return ts

    if args.ab:
        measure(False)
        measure(True)
        measure(False)  # session-drift check
    else:
        measure(RendererConfig().sat_cull)


if __name__ == "__main__":
    main()
