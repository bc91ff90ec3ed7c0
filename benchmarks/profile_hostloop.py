#!/usr/bin/env python
"""Host-section profile of the pipelined bench frame loop.

Runs the headline bench's engine (full config, moving fly-path camera, async
builder, pipeline depth 2) with GSWT_PROF_HOST=1 and prints where the
NON-OVERLAPPED host time goes per frame: staging (builder thread), uniform
pack+h2d, front/back program dispatch, aux async scheduling, and the drain's
blocking aux fetch / pixel probe. The drain section is where device-bound
time shows up (backpressure); everything else is true host overhead that the
pipelining cannot hide.

    GSWT_PROF_HOST=1 python benchmarks/profile_hostloop.py [-n 48] [--small]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("GSWT_PROF_HOST", "1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=48)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--packed", action="store_true",
                    help="fuse front+back into one program per frame")
    args = ap.parse_args()
    if args.packed:
        os.environ["GSWT_PACKED_INTERACTIVE"] = "1"

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    from gswt_renderer_tpu.core import UserData, hintstore
    from gswt_renderer_tpu.core.config import SurfaceType
    from gswt_renderer_tpu.engine import Engine, FlyPathControl, FlyPathFrame
    from gswt_renderer_tpu.render import pipeline
    from gswt_renderer_tpu.io.synth import synthetic_scene_vec
    from gswt_renderer_tpu.render.pipeline import RendererConfig

    width, height = (960, 540) if args.small else (1920, 1080)
    scene_vec = synthetic_scene_vec(n_lod=3, splats_per_tile=512, seed=0)
    rc = RendererConfig(width=width, height=height)
    eng = Engine(scene_vec, viewport=(width, height), renderer_config=rc,
                 synchronous=False)
    hkey = (f"v1_{width}x{height}_s512_l3_full"
            f"_t{rc.tile_w}x{rc.tile_h}_c{rc.chunk}"
            + ("_cull" if rc.cull_exact else "")
            + ("_dc" if rc.depth_cull else "")
            + ("_sat" if rc.sat_cull and not rc.exact else ""))
    loaded = hintstore.load(hkey)
    if loaded:
        eng.renderer.set_bucket_hints(loaded)
    sky = np.clip(np.linspace(0, 4, 64)[:, None, None]
                  * np.ones((64, 128, 3), np.float32), 0, 4)
    eng.set_skybox(sky, equirect=True)
    checker = np.kron(np.indices((64, 64)).sum(0) % 2,
                      np.ones((8, 8))).astype(np.float32)
    eng.set_proxy(np.stack([checker * 0.8 + 0.1, checker * 0.5 + 0.2,
                            checker * 0.3 + 0.1], axis=-1))
    eng.configure(UserData.from_ui(
        tile_map_half_wh=(48, 48), tile_width=4.0,
        surface_type=SurfaceType.HEIGHT_MAP, height_map_wh=(10, 10),
        height_map_scale=(1.0, 0.3), lod_max_dist=96.0,
        lod_transition_width_ratio=0.05, merge_dot_threshold=0.2,
        merge_topk=100, cache_size=1024,
    ))
    assert eng.wait_ready(timeout_s=900)

    fp = FlyPathControl()
    for t, p, tgt in [
        (0.0, (0.0, 0.0, 5.0), (0.0, 30.0, 2.0)),
        (5.0, (6.0, 18.0, 5.0), (10.0, 48.0, 2.0)),
        (10.0, (2.0, 40.0, 6.0), (-20.0, 60.0, 1.0)),
        (15.0, (-10.0, 55.0, 5.0), (-30.0, 80.0, 2.0)),
    ]:
        fp.keyframes.append(FlyPathFrame(
            t, np.array(p, np.float32), np.array(tgt, np.float32)))

    # warm: compile + converge buckets + fill the pipeline
    fp.reset_path()
    fp.start_path()
    for t in np.arange(0.0, 15.01, 0.5):
        fp.handle_events(eng.camera, now_ms=float(t) * 1000.0)
        eng.frame(readback=False)
    eng.renderer.drain()

    pipeline.HOST_PROF.clear()
    fp.reset_path()
    fp.start_path()
    dt = 15.0 / args.n
    t0 = time.perf_counter()
    stamps = [t0]
    for i in range(args.n):
        fp.handle_events(eng.camera, now_ms=float(i * dt) * 1000.0)
        eng.frame(readback=False)
        stamps.append(time.perf_counter())
    eng.renderer.drain()
    t1 = time.perf_counter()
    wall_ms = (t1 - t0) / args.n * 1e3
    deltas = np.diff(np.array(stamps)) * 1e3
    print(f"frames={args.n} wall={wall_ms:.1f} ms/frame "
          f"(median dispatch-gap {np.median(deltas):.1f} ms)")
    print(pipeline.host_prof_report())
    print("per-frame accounted host ms:",
          round(sum(s for _, (n, s) in pipeline.HOST_PROF.items()
                    if not _.startswith('drain') and _ != 'render.drain')
                / args.n * 1e3, 2))
    aux = eng.renderer.last_aux or {}
    print("n_pairs_kept", int(aux.get("n_pairs_kept", aux.get("n_pairs", 0))))
    eng.shutdown()


if __name__ == "__main__":
    main()
