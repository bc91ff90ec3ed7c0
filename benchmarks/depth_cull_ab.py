#!/usr/bin/env python
"""Same-session A/B of the proxy-depth occlusion cull on the full-config
(skybox + proxy) 1080p bench scene: two Renderers over ONE engine + ONE
staged sort, depth_cull off vs on, device-complete frame times + the
binning aux counters.

Run: python benchmarks/depth_cull_ab.py [--dense] [-n 12]
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
    ap.add_argument("--dense", action="store_true")
    ap.add_argument("-n", type=int, default=12)
    args = ap.parse_args()
    import jax

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
    sky = np.clip(np.linspace(0, 4, 64)[:, None, None]
                  * np.ones((64, 128, 3), np.float32), 0, 4)
    checker = np.kron(np.indices((64, 64)).sum(0) % 2,
                      np.ones((8, 8))).astype(np.float32)
    tex = np.stack([checker * 0.8 + 0.1, checker * 0.5 + 0.2,
                    checker * 0.3 + 0.1], axis=-1)

    results = {}
    for dc in (False, True):
        r = Renderer(eng, RendererConfig(width=1920, height=1080,
                                         depth_cull=dc))
        r.configure(ud)
        r.set_skybox(sky, equirect=True)
        r.set_proxy(tex)
        rc = RenderConfig.new(eng.n_tiles[0])
        sp = SceneParams.from_data(ud, eng.center_coord, rc)
        staged = r.stage(dt, camera, rc.culling_dist)
        t0 = time.time()
        for _ in range(3):  # settle adaptive buckets / overflow retries
            img = r.render(None, camera, sp, rc, staged=staged,
                           as_numpy=False, use_skybox=True, use_proxy=True)
        _ = jax.device_get(img[..., 3].sum())
        print(f"[ab] dc={dc} warm (incl. compiles) {time.time()-t0:.1f}s",
              file=sys.stderr)
        times = []
        for _ in range(args.n):
            t0 = time.time()
            img = r.render(None, camera, sp, rc, staged=staged,
                           as_numpy=False, use_skybox=True, use_proxy=True)
            _ = jax.device_get(img[..., 3].sum())
            times.append((time.time() - t0) * 1000.0)
        ts = np.array(times)
        aux = {k: (int(v) if np.ndim(v) == 0 else [int(x) for x in v])
               for k, v in r.last_aux.items()}
        results[str(dc)] = dict(
            frame_ms_median=float(np.median(ts)),
            frame_ms_min=float(ts.min()),
            aux=aux,
            alpha_mean=float(jax.device_get(img[..., 3].mean())),
        )
        print(f"[ab] dc={dc}: median {np.median(ts):.1f} ms  "
              f"min {ts.min():.1f}  aux {aux}", file=sys.stderr)
    off = results["False"]; on = results["True"]
    print(json.dumps(dict(
        scene="dense" if args.dense else "headline",
        off_ms=off["frame_ms_median"], on_ms=on["frame_ms_median"],
        speedup=round(off["frame_ms_median"] / on["frame_ms_median"], 3),
        pairs_kept_off=off["aux"].get("n_pairs_kept"),
        pairs_kept_on=on["aux"].get("n_pairs_kept"),
        entries_off=off["aux"].get("n_entries"),
        entries_on=on["aux"].get("n_entries"),
        live_off=off["aux"].get("n_live"), live_on=on["aux"].get("n_live"),
    )), flush=True)


if __name__ == "__main__":
    main()
