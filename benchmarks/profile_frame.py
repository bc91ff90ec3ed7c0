#!/usr/bin/env python
"""Per-stage / per-op profile of the headline 1080p frame on the real TPU.

Builds the bench.py config-3 scene at a fixed camera, compiles the frame,
then (a) times device-complete frames, (b) captures an xprof trace and prints
the top ops by self time with a stage attribution. Run on the TPU harness:

    python benchmarks/profile_frame.py [--small] [--trace]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(small=False):
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

    width, height = (960, 540) if small else (1920, 1080)
    t0 = time.time()
    scene_vec = synthetic_scene_vec(
        n_lod=3, splats_per_tile=128 if small else 512, seed=0
    )
    eng = WangTileEngine(scene_vec)
    half = 16 if small else 48
    ud = UserData.from_ui(
        tile_map_half_wh=(half, half),
        tile_width=4.0,
        surface_type=SurfaceType.HEIGHT_MAP,
        height_map_wh=(10, 10),
        height_map_scale=(1.0, 0.3),
        lod_max_dist=96.0,
        lod_transition_width_ratio=0.05,
        merge_dot_threshold=0.2,
        merge_topk=100,
        cache_size=1024,
    )
    eng.configure(ud)
    print(f"[prof] configure {time.time()-t0:.1f}s", file=sys.stderr)
    cam_pos = np.array([0.0, 0.0, 5.0], np.float32)
    t0 = time.time()
    eng.build_tiles(cam_pos)
    print(f"[prof] build {time.time()-t0:.1f}s", file=sys.stderr)
    camera = Camera(
        (width, height), cam_pos, (0.0, 30.0, 2.0), (0.0, 0.0, 1.0),
        np.deg2rad(45.0), 0.1, 1000.0,
    )
    t0 = time.time()
    dt = eng.sort_tiles(cam_pos, camera.view_proj())
    print(f"[prof] sort {time.time()-t0:.1f}s", file=sys.stderr)
    r = Renderer(eng, RendererConfig(width=width, height=height))
    r.configure(ud)
    rc = RenderConfig.new(eng.n_tiles[0])
    sp = SceneParams.from_data(ud, eng.center_coord, rc)
    t0 = time.time()
    staged = r.stage(dt, camera, rc.culling_dist)
    print(f"[prof] stage {time.time()-t0:.1f}s  s_pad={staged['s_pad']}",
          file=sys.stderr)
    return r, sp, rc, staged, camera


def timed_frames(r, sp, rc, staged, camera, n=10):
    import jax

    t0 = time.time()
    img = r.render(None, camera, sp, rc, staged=staged, as_numpy=False)
    _ = jax.device_get(img[..., 3].sum())
    print(f"[prof] first frame (incl. compile) {time.time()-t0:.1f}s",
          file=sys.stderr)
    print(f"[prof] aux: {r.last_aux}", file=sys.stderr)
    times = []
    for _ in range(n):
        t0 = time.time()
        img = r.render(None, camera, sp, rc, staged=staged, as_numpy=False)
        _ = jax.device_get(img[..., 3].sum())  # real completion barrier
        times.append((time.time() - t0) * 1000.0)
    ts = np.array(times)
    print(
        f"[prof] frame ms: mean {ts.mean():.1f}  min {ts.min():.1f} "
        f"median {np.median(ts):.1f}  (n={n}, includes ~40ms sync overhead)",
        file=sys.stderr,
    )
    return ts


STAGES = {
    "gather": "gather",
    "scatter": "scatter",
    "sort": "sort",
    "cum": "cummax/cumsum",
    "reduce-window": "cummax/cumsum",
    "fusion": "fusion(elementwise)",
    "custom-call": "pallas/custom",
    "convert": "convert",
    "transpose": "transpose",
    "copy": "copy",
    "iota": "iota",
    "broadcast": "broadcast",
    "dot": "matmul",
    "convolution": "matmul",
    "dynamic": "dynamic-slice/update",
    "slice": "slice",
    "concatenate": "concat",
    "pad": "pad",
}


def trace_ops(r, sp, rc, staged, camera, outdir="/tmp/gswt_prof"):
    import jax

    os.makedirs(outdir, exist_ok=True)
    with jax.profiler.trace(outdir):
        for _ in range(3):
            img = r.render(None, camera, sp, rc, staged=staged, as_numpy=False)
            _ = jax.device_get(img[..., 3].sum())
    # find the trace and dump op stats
    try:
        from xprof.convert import raw_to_tool_data as rtd
    except ImportError:
        print("[prof] xprof not available; trace at", outdir, file=sys.stderr)
        return
    import glob

    runs = sorted(glob.glob(os.path.join(outdir, "plugins/profile/*")))
    run = runs[-1]
    data, _ = rtd.xspace_to_tool_data([run], "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    rows = json.loads(data) if data.lstrip().startswith("[") else None
    if rows is None:
        # gviz json: parse table
        import csv
        import io

        data2, _ = rtd.xspace_to_tool_data(
            [run], "framework_op_stats", {"tqx": "out:csv;"}
        )
        if isinstance(data2, bytes):
            data2 = data2.decode()
        rows = list(csv.DictReader(io.StringIO(data2)))
    agg = {}
    total = 0.0
    for row in rows:
        name = (row.get("category") or row.get("Type") or "?").lower()
        t = float(
            row.get("total_self_time_us")
            or row.get("Total self-time (us)")
            or row.get("self_time_us")
            or 0.0
        )
        host = (row.get("host_or_device") or row.get("Host/device") or "").lower()
        if "host" in host:
            continue
        stage = next((v for k, v in STAGES.items() if k in name), name)
        agg[stage] = agg.get(stage, 0.0) + t
        total += t
    if total == 0:
        print("[prof] no device op rows in trace (axon tunnel omits device "
              "op stats); use manual stage bisection instead", file=sys.stderr)
        return
    print(f"\n[prof] device self-time by op category (3 frames):", file=sys.stderr)
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1]):
        print(f"  {k:28s} {v/3000.0:8.1f} ms/frame  {100*v/total:5.1f}%",
              file=sys.stderr)
    print(f"  {'TOTAL':28s} {total/3000.0:8.1f} ms/frame", file=sys.stderr)
    # top individual ops
    data3, _ = rtd.xspace_to_tool_data(
        [run], "framework_op_stats", {"tqx": "out:csv;"}
    )
    if isinstance(data3, bytes):
        data3 = data3.decode()
    import csv
    import io

    rows3 = list(csv.DictReader(io.StringIO(data3)))
    devrows = [
        r3 for r3 in rows3
        if "host" not in (r3.get("host_or_device") or "").lower()
    ]

    def selft(r3):
        try:
            return float(r3.get("total_self_time_us") or 0.0)
        except (TypeError, ValueError):
            return 0.0

    devrows.sort(key=selft, reverse=True)
    print("\n[prof] top 25 device ops:", file=sys.stderr)
    for r3 in devrows[:25]:
        nm = (r3.get("operation") or r3.get("op_name") or "?")[:90]
        print(f"  {selft(r3)/3000.0:8.2f} ms/frame  {nm}", file=sys.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("-n", type=int, default=10)
    args = ap.parse_args()
    r, sp, rc, staged, camera = build(args.small)
    timed_frames(r, sp, rc, staged, camera, n=args.n)
    if args.trace:
        trace_ops(r, sp, rc, staged, camera)


if __name__ == "__main__":
    main()
