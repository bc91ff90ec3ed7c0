#!/usr/bin/env python
"""BASELINE.md config suite: measure all five target configurations.

1. single Wang tile, fixed camera, 512x512
2. 4x4 procedurally tiled terrain, no merging/LOD, 800x600 fly-through
3. infinite terrain + procedural tiling + selective merging, 1080p
4. full paper config: LOD blending + skybox + proxy, 1080p
5. batched-camera rendering (camera-parallel; BASELINE.md's 64-camera row
   is a v5e-8 stretch goal — on 1 chip this measures per-camera
   throughput of the same batched path at 16 cameras)

Run: python benchmarks/configs.py [--quick]
Prints one JSON line per config.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _mk_engine(viewport, **ud_kw):
    from gswt_renderer_tpu.core import UserData
    from gswt_renderer_tpu.engine import Engine
    from gswt_renderer_tpu.io.synth import synthetic_scene_vec
    from gswt_renderer_tpu.render.pipeline import RendererConfig

    sv = synthetic_scene_vec(n_lod=3, splats_per_tile=512, seed=0)
    eng = Engine(
        sv, viewport=viewport,
        renderer_config=RendererConfig(width=viewport[0], height=viewport[1]),
        synchronous=True,
    )
    eng.configure(UserData.from_ui(**ud_kw))
    assert eng.wait_ready(timeout_s=600)
    return eng


def _time_frames(eng, moves, n_warm=3, n_iter=None):
    """Median per-frame time with the automated stall discard (windows
    > 3x median are tunnel stalls, not renderer time; the discard count is
    reported so a stall-dominated row is visibly suspect)."""
    n_iter = n_iter or len(moves)
    for _ in range(n_warm):
        eng.frame(readback=False)
    times = []
    for i in range(n_iter):
        eng.camera.translate(moves[i % len(moves)])
        t0 = time.perf_counter()
        img = eng.frame(readback=False)
        if img is not None:  # Engine.frame already barriers on a pixel probe
            times.append((time.perf_counter() - t0) * 1e3)
    if not times:
        return 0.0, 0, 0
    med = float(np.median(times))
    kept = [t for t in times if t <= 3.0 * med] or times
    return float(np.mean(kept)), len(kept), len(times) - len(kept)


def emit(name, ms, extra=None):
    print(json.dumps({
        "config": name, "frame_ms": round(ms, 1),
        "fps": round(1000.0 / ms, 2) if ms > 0 else 0.0,
        **(extra or {}),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    n = 5 if args.quick else 20
    from gswt_renderer_tpu.core.config import (
        SelectiveMergeType, SurfaceType, TileSortType,
    )

    moves = [np.array([0.05, 0.1, 0.0], np.float32)] * n

    # config 1: single-tile-scale scene, fixed camera, 512x512
    eng = _mk_engine(
        (512, 512), tile_map_half_wh=(1, 1), surface_type=SurfaceType.NONE,
        merge_type=SelectiveMergeType.NONE, tile_sort_type=TileSortType.DISTANCE,
        lod_blending=False, lod_max_dist=8.0, height_map_scale=(1.0, 0.0),
    )
    ms, k, dropped = _time_frames(eng, [np.zeros(3, np.float32)] * n)
    emit("1_single_tile_512", ms, {"frames": k, "stall_discards": dropped})

    # config 2: 4x4-ish terrain, no merging/LOD, 800x600
    eng = _mk_engine(
        (800, 600), tile_map_half_wh=(2, 2), surface_type=SurfaceType.NONE,
        merge_type=SelectiveMergeType.NONE, tile_sort_type=TileSortType.DISTANCE,
        lod_blending=False, lod_max_dist=8.0, height_map_scale=(1.0, 0.0),
    )
    ms, k, dropped = _time_frames(eng, moves)
    emit("2_terrain_4x4_800x600", ms, {"frames": k, "stall_discards": dropped})

    # config 3: infinite terrain + merging, 1080p
    eng = _mk_engine(
        (1920, 1080), tile_map_half_wh=(48, 48),
        surface_type=SurfaceType.HEIGHT_MAP, height_map_wh=(10, 10),
        height_map_scale=(1.0, 0.3), lod_max_dist=96.0,
        merge_dot_threshold=0.2, merge_topk=100,
    )
    ms, k, dropped = _time_frames(eng, moves)
    emit("3_infinite_1080p", ms, {"frames": k, "stall_discards": dropped})

    # config 3d: dense tiles (8192 splats/tile at lod 0, 5-level /4 LOD
    # chain — the reference's deep-LOD regime) on the same 1080p terrain
    eng.shutdown()
    from gswt_renderer_tpu.core import UserData
    from gswt_renderer_tpu.engine import Engine
    from gswt_renderer_tpu.io.synth import synthetic_scene_vec
    from gswt_renderer_tpu.render.pipeline import RendererConfig as _RC

    sv_d = synthetic_scene_vec(n_lod=5, splats_per_tile=8192, lod_decay=4)
    eng = Engine(sv_d, viewport=(1920, 1080),
                 renderer_config=_RC(width=1920, height=1080),
                 synchronous=True)
    eng.configure(UserData.from_ui(
        tile_map_half_wh=(48, 48), surface_type=SurfaceType.HEIGHT_MAP,
        height_map_wh=(10, 10), height_map_scale=(1.0, 0.3),
        lod_max_dist=96.0, merge_dot_threshold=0.2, merge_topk=100,
    ))
    assert eng.wait_ready(timeout_s=600)
    ms, k, dropped = _time_frames(eng, moves)
    aux = eng.renderer.last_aux or {}
    emit("3d_dense_8k_5lod_1080p", ms,
         {"frames": k, "stall_discards": dropped,
          "n_pairs": int(aux.get("n_pairs", 0))})
    eng.shutdown()
    eng = _mk_engine(
        (1920, 1080), tile_map_half_wh=(48, 48),
        surface_type=SurfaceType.HEIGHT_MAP, height_map_wh=(10, 10),
        height_map_scale=(1.0, 0.3), lod_max_dist=96.0,
        merge_dot_threshold=0.2, merge_topk=100,
    )

    # config 4: full paper config — skybox + rasterized proxy ground
    sky = np.clip(
        np.linspace(0, 4, 64)[:, None, None]
        * np.ones((64, 128, 3), np.float32), 0, 4)
    eng.set_skybox(sky, equirect=True)
    checker = np.kron(
        np.indices((64, 64)).sum(0) % 2, np.ones((8, 8))
    ).astype(np.float32)
    eng.set_proxy(np.stack(
        [checker * 0.8 + 0.1, checker * 0.5 + 0.2, checker * 0.3 + 0.1],
        axis=-1,
    ))
    eng.use_proxy = True
    ms, k, dropped = _time_frames(eng, moves)
    emit("4_full_skybox_proxy_1080p", ms, {"frames": k, "stall_discards": dropped})

    # config 4b: the same full config at 4K (BASELINE.md row)
    eng.shutdown()
    eng = _mk_engine(
        (3840, 2160), tile_map_half_wh=(48, 48),
        surface_type=SurfaceType.HEIGHT_MAP, height_map_wh=(10, 10),
        height_map_scale=(1.0, 0.3), lod_max_dist=96.0,
        merge_dot_threshold=0.2, merge_topk=100,
    )
    eng.set_skybox(sky, equirect=True)
    eng.set_proxy(np.stack(
        [checker * 0.8 + 0.1, checker * 0.5 + 0.2, checker * 0.3 + 0.1],
        axis=-1,
    ))
    eng.use_proxy = True
    ms, k, dropped = _time_frames(eng, moves)
    emit("4b_full_skybox_proxy_4k", ms,
         {"frames": k, "stall_discards": dropped})

    # config 5: batched cameras (camera-parallel path on the local mesh).
    # Needs its own 1080p engine — the raster grid comes from the
    # renderer's RendererConfig, not the cameras' viewport, so reusing the
    # 4b engine here would silently measure 4K frames under a 1080p label
    # (it did until 2026-08-18).
    eng.shutdown()
    eng = _mk_engine(
        (1920, 1080), tile_map_half_wh=(48, 48),
        surface_type=SurfaceType.HEIGHT_MAP, height_map_wh=(10, 10),
        height_map_scale=(1.0, 0.3), lod_max_dist=96.0,
        merge_dot_threshold=0.2, merge_topk=100,
    )
    import jax
    import jax.numpy as jnp

    from gswt_renderer_tpu.core.config import RenderConfig
    from gswt_renderer_tpu.parallel import make_mesh, render_cameras_sharded
    from gswt_renderer_tpu.parallel.batched import pack_camera_batch
    from gswt_renderer_tpu.render.uniforms import SceneParams
    from gswt_renderer_tpu.core import Camera

    b = 8 if args.quick else 16
    cams = [
        Camera((1920, 1080), np.array([i * 0.5, 0, 5], np.float32),
               (i * 0.5, 30, 2), (0, 0, 1), np.deg2rad(45.0), 0.1, 2400.0)
        for i in range(b)
    ]
    mesh = make_mesh((len(jax.devices()), 1))
    rc = RenderConfig.new(eng.wang.n_tiles[0])
    sp = SceneParams.from_data(eng.config_user_data, eng.wang.center_coord, rc)
    cam_batch = pack_camera_batch(eng.renderer, sp, cams, rc)
    staged = eng._staged or eng.renderer.stage(eng.cur_sort, eng.camera)
    imgs = render_cameras_sharded(eng.renderer, staged, sp, cam_batch, mesh, rc)
    _ = jax.device_get(imgs[0, 0, 0, 0])
    t0 = time.perf_counter()
    imgs = render_cameras_sharded(eng.renderer, staged, sp, cam_batch, mesh, rc)
    _ = jax.device_get(imgs[-1, 0, 0, 0])
    per_cam = (time.perf_counter() - t0) / b * 1000.0
    emit("5_batched_cameras_1080p", per_cam,
         {"batch": b, "devices": len(jax.devices())})


if __name__ == "__main__":
    main()
