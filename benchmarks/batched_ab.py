#!/usr/bin/env python
"""Batched-camera (config 5) vs interactive path A/B (VERDICT r4 #5).

Measures, same session, gs-only 1080p on the bench scene:
  - interactive: Renderer.render per frame, device-complete
  - batched scan:   render_cameras_sharded, GSWT_DP_UNROLL=0
  - batched unroll: render_cameras_sharded, GSWT_DP_UNROLL=B
each for IDENTICAL cameras (isolates per-camera overhead from scene
content) and DISTINCT cameras (the dataset-generation case). Done
criteria: batched <= 1.15x interactive for identical cameras, <= 1.3x
for distinct.

    python benchmarks/batched_ab.py [-b 4] [-n 8]
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
    ap.add_argument("-b", type=int, default=4, help="camera batch")
    ap.add_argument("-n", type=int, default=8, help="timed iterations")
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
    from gswt_renderer_tpu.parallel import make_mesh, render_cameras_sharded
    from gswt_renderer_tpu.parallel.batched import pack_camera_batch
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
    cam_pos = np.array([0.0, 0.0, 5.0], np.float32)
    eng.build_tiles(cam_pos)
    camera = Camera((width, height), cam_pos, (0.0, 30.0, 2.0),
                    (0.0, 0.0, 1.0), np.deg2rad(45.0), 0.1, 1000.0)
    dt = eng.sort_tiles(cam_pos, camera.view_proj())

    rcfg = RendererConfig(width=width, height=height)
    r = Renderer(eng, rcfg)
    r.configure(ud)
    hk = (f"v1_{width}x{height}_s512_l3_full_t{rcfg.tile_w}x{rcfg.tile_h}"
          f"_c{rcfg.chunk}" + ("_cull" if rcfg.cull_exact else ""))
    h = hintstore.load(hk)
    if h:
        r.set_bucket_hints(h)
    rc = RenderConfig.new(eng.n_tiles[0])
    sp = SceneParams.from_data(ud, eng.center_coord, rc)
    staged = r.stage(dt, camera, rc.culling_dist)

    # --- interactive baseline (device-complete frames) ---
    def iframe():
        img = r.render(None, camera, sp, rc, staged=staged, as_numpy=False)
        jax.block_until_ready(img)

    t0 = time.time()
    iframe()
    print(f"[interactive] first frame {time.time()-t0:.1f}s",
          file=sys.stderr)
    for _ in range(3):
        iframe()
    ts = []
    for _ in range(args.n):
        t0 = time.time()
        iframe()
        ts.append((time.time() - t0) * 1e3)
    inter_ms = float(np.median(ts))
    print(json.dumps({"variant": "interactive", "ms_per_cam": round(
        inter_ms, 1)}), flush=True)

    mesh = make_mesh((len(jax.devices()), 1))
    b = args.b
    cams_same = [camera] * b
    cams_diff = [
        Camera((width, height),
               np.array([0.5 * i, 0.3 * i, 5.0], np.float32),
               (0.5 * i, 30.0, 2.0), (0.0, 0.0, 1.0), np.deg2rad(45.0),
               0.1, 1000.0)
        for i in range(b)
    ]

    def run_batched(name, cams, unroll):
        os.environ["GSWT_DP_UNROLL"] = str(unroll)
        cb = pack_camera_batch(r, sp, cams, rc)
        t0 = time.time()
        imgs = render_cameras_sharded(r, staged, sp, cb, mesh, rc)
        _ = jax.device_get(imgs[-1, 0, 0, 0])
        print(f"[{name}] first call (incl. compile) {time.time()-t0:.1f}s",
              file=sys.stderr)
        for _ in range(2):
            imgs = render_cameras_sharded(r, staged, sp, cb, mesh, rc)
            _ = jax.device_get(imgs[-1, 0, 0, 0])
        ts = []
        for _ in range(args.n):
            t0 = time.time()
            imgs = render_cameras_sharded(r, staged, sp, cb, mesh, rc)
            _ = jax.device_get(imgs[-1, 0, 0, 0])
            ts.append((time.time() - t0) * 1e3 / b)
        ms = float(np.median(ts))
        print(json.dumps({
            "variant": name, "ms_per_cam": round(ms, 1), "batch": b,
            "vs_interactive": round(ms / inter_ms, 3),
        }), flush=True)
        return ms

    run_batched("scan_same", cams_same, unroll=0)
    run_batched("unroll_same", cams_same, unroll=b)
    run_batched("scan_diff", cams_diff, unroll=0)
    run_batched("unroll_diff", cams_diff, unroll=b)
    # drift check
    ts = []
    for _ in range(args.n):
        t0 = time.time()
        iframe()
        ts.append((time.time() - t0) * 1e3)
    print(json.dumps({"variant": "interactive2", "ms_per_cam": round(
        float(np.median(ts)), 1)}), flush=True)


if __name__ == "__main__":
    main()
