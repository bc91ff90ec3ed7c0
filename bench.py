#!/usr/bin/env python
"""Headline benchmark: 1080p FULL-CONFIG (skybox + proxy ground) infinite-
terrain fly-through FPS on one chip.

Reproduces the reference's fly-path benchmark harness (gui.rs:955-997) on the
paper's FULL default configuration — 97x97 tile map, tile width 4, Graph tile
sort, Edge merge topk=100 dot=0.2, LRU 1024, LOD blending (structure.rs:70-99)
PLUS the skybox and proxy ground passes the reference's frame includes
(state.rs:384-401) — over a synthetic Wang tile set (the official tile sets
are produced by the paper's offline constructor and are not vendored in the
reference repo, so absolute FPS is generator-dependent). The headline keeps
the round-comparable density (512 splats/tile, ~2.5M-splat stream);
`splats_composited_per_s` in meta is the density-robust throughput, and
meta.dense carries the 8192-splat/5-LOD row (set GSWT_BENCH_NO_DENSE=1 to
skip it; `GSWT_BENCH_SPLATS`/`GSWT_BENCH_LODS` override the main scene).

FPS counts device-complete frames (pixel-probe barrier, no host readback):
the dev harness tunnels device<->host transfers at ~15 MB/s, which would
otherwise measure the tunnel, not the renderer. Windows > 3x the median are
discarded as tunnel stalls, with the discard count reported in meta.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline = fps / 60 (BASELINE.md target: >= 60 FPS at 1080p).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _load_hints(key):
    """Previous-session converged bucket demands for this bench config
    (renderer.bucket_hints() via core/hintstore.py). Landing the first
    frame on the converged buckets makes the warmup compile ONE variant
    per program instead of climbing the grow-only ladder (each rung is a
    40-200s tunnel compile)."""
    from gswt_renderer_tpu.core import hintstore

    return hintstore.load(key)


def _save_hints(key, hints):
    from gswt_renderer_tpu.core import hintstore

    if not hintstore.save(key, hints):  # pragma: no cover - advisory
        print(f"[bench] hint save failed for {key}", file=sys.stderr)


def _dense_row(width, height, n_frames=64):
    """8192-splat/5-LOD density row (benchmarks/configs.py row 3d), kept in
    every BENCH meta so density-robust throughput is tracked per round.
    Measured with the SAME pipelined methodology as the headline (async
    engine, dispatch-stamp windows) — the sync engine would measure one
    ~45 ms tunnel round trip per frame on the dev harness, not the
    renderer."""
    import numpy as np

    from gswt_renderer_tpu.core import UserData
    from gswt_renderer_tpu.core.config import SurfaceType
    from gswt_renderer_tpu.engine import Engine
    from gswt_renderer_tpu.io.synth import synthetic_scene_vec
    from gswt_renderer_tpu.render.pipeline import RendererConfig

    t0 = time.time()
    sv = synthetic_scene_vec(n_lod=5, splats_per_tile=8192, lod_decay=4)
    # max_stream 2x the headline cap: the dense scene's visible stream is
    # ~4.8M splats — the default 1<<22 cap silently dropped ~14% of the
    # far field every frame, making the density row measure a truncated
    # scene (r3d log: "dropped 638848 far splats" per frame)
    rc = RendererConfig(width=width, height=height, max_stream=1 << 23)
    eng = Engine(sv, viewport=(width, height), renderer_config=rc,
                 synchronous=False)
    hkey = (f"v1_{width}x{height}_dense8192_l5"
            f"_t{rc.tile_w}x{rc.tile_h}_c{rc.chunk}"
            + ("_dc" if rc.depth_cull else "")
            + ("_sat" if rc.sat_cull and not rc.exact else ""))
    loaded = _load_hints(hkey)
    if loaded:
        eng.renderer.set_bucket_hints(loaded)
    eng.configure(UserData.from_ui(
        tile_map_half_wh=(48, 48), surface_type=SurfaceType.HEIGHT_MAP,
        height_map_wh=(10, 10), height_map_scale=(1.0, 0.3),
        lod_max_dist=96.0, merge_dot_threshold=0.2, merge_topk=100,
    ))
    assert eng.wait_ready(timeout_s=900)
    move = np.array([0.05, 0.1, 0.0], np.float32)
    for _ in range(12):  # warm: compile + converge buckets + fill pipeline
        eng.camera.translate(move)
        eng.frame(readback=False)
    eng.renderer.drain()
    t_warm = time.time()
    stamps = [time.perf_counter()]
    for _ in range(n_frames):
        eng.camera.translate(move)
        eng.frame(readback=False)
        stamps.append(time.perf_counter())
    eng.renderer.drain()
    stamps.append(time.perf_counter())
    win = 8
    wins = [
        (stamps[i + win] - stamps[i]) / win * 1e3
        for i in range(0, len(stamps) - win, win)
    ]
    med = float(np.median(wins)) if wins else 0.0
    kept = [w for w in wins if w <= 3.0 * med] or wins
    ms = float(np.mean(kept)) if kept else med
    aux = eng.renderer.last_aux or {}
    n_pairs = int(aux.get("n_pairs", 0))
    _save_hints(hkey, eng.renderer.bucket_hints())
    eng.shutdown()
    return dict(
        fps=round(1000.0 / ms, 2) if ms > 0 else 0.0,
        frame_ms=round(ms, 1),
        n_pairs=n_pairs,
        stall_discards=len(wins) - len(kept),
        setup_s=round(t_warm - t0, 1),
    )


def main():
    t_start = time.time()
    # wall-clock budget (VERDICT r4 #1): the round-4 driver run was killed
    # at the harness timeout INSIDE the optional dense row, losing the
    # already-computed headline. Anything optional (timed reruns, dense
    # row) is skipped once the budget is spent, and the headline JSON is
    # printed BEFORE the dense row either way.
    budget_s = float(os.environ.get("GSWT_BENCH_BUDGET_S") or 1200.0)

    def over_budget(reserve_s=0.0):
        return (time.time() - t_start) > (budget_s - reserve_s)

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    from gswt_renderer_tpu.core import UserData
    from gswt_renderer_tpu.core.config import SurfaceType
    from gswt_renderer_tpu.engine import Engine, FlyPathControl, FlyPathFrame
    from gswt_renderer_tpu.io.synth import synthetic_scene_vec
    from gswt_renderer_tpu.render.pipeline import RendererConfig

    width, height = 1920, 1080
    splats = int(os.environ.get("GSWT_BENCH_SPLATS") or 512)
    n_lod = int(os.environ.get("GSWT_BENCH_LODS") or 3)
    scene_vec = synthetic_scene_vec(
        n_lod=n_lod, splats_per_tile=splats,
        lod_decay=4 if n_lod > 3 else 2, seed=0,
    )

    rc = RendererConfig(width=width, height=height)
    eng = Engine(
        scene_vec,
        viewport=(width, height),
        renderer_config=rc,
        synchronous=False,
    )
    # key format matches benchmarks/sweep_shapes.py so a sweep run of the
    # same (shape, chunk, cull) pre-warms the headline's buckets — and a
    # future default-shape change can't inherit mis-scaled demand floors
    hkey = (f"v1_{width}x{height}_s{splats}_l{n_lod}_full"
            f"_t{rc.tile_w}x{rc.tile_h}_c{rc.chunk}"
            + ("_cull" if rc.cull_exact else "")
            # the occlusion/saturation culls shrink observed demand ~8x;
            # hints recorded without them would pin the buckets at pre-cull
            # domains (and vice versa), so the cull state is part of the key
            + ("_dc" if rc.depth_cull else "")
            + ("_sat" if rc.sat_cull and not rc.exact else ""))
    loaded_hints = _load_hints(hkey)
    if loaded_hints:
        eng.renderer.set_bucket_hints(loaded_hints)
    # paper default benchmark config (structure.rs:70-99, 123-137), with the
    # height amplitude scaled for the synthetic set
    ud = UserData.from_ui(
        tile_map_half_wh=(48, 48),
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
    # the full paper config renders skybox + proxy ground every frame
    # (state.rs:384-401); same textures as benchmarks/configs.py config 4
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
    t_scene = time.time()
    eng.configure(ud)
    assert eng.wait_ready(timeout_s=300), "engine did not produce a frame"
    t_ready = time.time()

    # scripted fly path crossing several tiles with a turn, ping-ponged out
    # to 60 s so the timed run covers >= 200 frames WITHOUT camera teleports
    # (a loop seam teleport mass-triggers LOD transitions, spiking the
    # stream 2x for a few frames and poisoning the grow-only buckets)
    fp = FlyPathControl()
    kf = [
        (0.0, (0.0, 0.0, 5.0), (0.0, 30.0, 2.0)),
        (5.0, (6.0, 18.0, 5.0), (10.0, 48.0, 2.0)),
        (10.0, (2.0, 40.0, 6.0), (-20.0, 60.0, 1.0)),
        (15.0, (-10.0, 55.0, 5.0), (-30.0, 80.0, 2.0)),
    ]
    path = []
    for r in range(4):
        seg = kf if r % 2 == 0 else [
            (15.0 - t, p, tgt) for (t, p, tgt) in reversed(kf)
        ]
        for (t, p, tgt) in seg:
            tt = 15.0 * r + t
            if path and tt <= path[-1][0]:
                continue
            path.append((tt, p, tgt))
    for t, p, tgt in path:
        fp.keyframes.append(
            FlyPathFrame(t, np.array(p, np.float32), np.array(tgt, np.float32))
        )

    # warm-up: walk the whole path densely so the grow-only stream/pair
    # buckets reach their maxima and every XLA variant compiles before the
    # timed run (a single mid-run recompile would dominate the fly-through)
    fp.reset_path()
    fp.start_path()
    for t in np.arange(0.0, 60.01, 1.0):
        fp.handle_events(eng.camera, now_ms=float(t) * 1000.0)
        eng.frame(readback=False)
        time.sleep(0.02)
        # degraded-tunnel guard: on a stalling dev tunnel each warmup
        # frame can take seconds; the walk only converges buckets (the
        # committed hints already carry the converged demands), so cut it
        # short rather than spend the whole budget before the timed run
        if over_budget(reserve_s=0.55 * budget_s):
            print(f"[bench] warmup walk cut short at t={t:.0f}s "
                  f"(budget)", file=sys.stderr)
            break
    eng.renderer.drain()
    fp.pause_path()

    def settle(seconds=6.0):
        """Replay the path head until the teleport's LOD-transition wave
        dies down: every run_benchmark call teleports the camera back to
        t=0, which mass-triggers transitions (both LODs live at once) and
        can spike the live-splat demand ~2x for a few frames. Settling
        OUTSIDE the timed window keeps the spike out of the timing and
        out of the grow-only bucket floors."""
        fp.reset_path()
        fp.start_path()
        for t in np.arange(0.0, seconds + 0.01, 0.25):
            fp.handle_events(eng.camera, now_ms=float(t) * 1000.0)
            eng.frame(readback=False)
        eng.renderer.drain()
        fp.pause_path()

    settle()
    # teleport spikes during the warmup inflate the grow-only hints far
    # beyond steady-state demand, and every later frame would pay the
    # padded sort domains; re-derive the hints at the settled state (the
    # right-sized variants come warm from the XLA cache)
    for h in ("_pairs_hint", "_ne_hint", "_live_hint", "_livep_hint",
              "_proxy_hint"):
        if hasattr(eng.renderer, h):
            delattr(eng.renderer, h)
    # the persisted hints ARE previous settled maxima: re-applying them
    # after the reset keeps the buckets on the already-compiled converged
    # variants instead of re-deriving them through another compile
    if loaded_hints:
        eng.renderer.set_bucket_hints(loaded_hints)
    settle()
    n_compiles_warm = len(getattr(eng.renderer, "compile_events", []))

    t_warm = time.time()
    # degraded-tunnel guard on the timed run itself: the full path is
    # ~460 frames / >=60 s; when setup already ate most of the budget, a
    # 160-frame run (10 windows) still yields a sound median — a short
    # headline beats a timed-out one (VERDICT r4 #1)
    max_frames = 100000
    if over_budget(reserve_s=0.35 * budget_s):
        max_frames = 160
        print("[bench] timed run capped at 160 frames (budget)",
              file=sys.stderr)
    result = eng.run_benchmark(fp, readback=False, max_frames=max_frames)
    # a pose between the warmup's samples can still grow a bucket and
    # recompile mid-run (XLA compiles are 40-200s on the dev harness — one
    # poisons the whole 60 s window); every variant is compiled now, so a
    # settled rerun measures the steady state
    timed_reruns = 0
    while (
        len(getattr(eng.renderer, "compile_events", [])) > n_compiles_warm
        and timed_reruns < 2
        # a rerun costs ~70 s (settle + 60 s path); skip when the budget
        # can't cover it — a mid-run recompile headline is still a number
        and not over_budget(reserve_s=120.0)
    ):
        n_compiles_warm = len(eng.renderer.compile_events)
        timed_reruns += 1
        settle()
        result = eng.run_benchmark(fp, readback=False, max_frames=max_frames)
    # interactive latency (VERDICT r3 missing #4): what a viewer user sees
    # end-to-end per displayed frame — camera input -> rendered frame ->
    # device-side downscale+u8 -> d2h -> JPEG (viewer/server.py's exact
    # readback path, scale 2). Measured serialized (each iteration blocks
    # on its own JPEG), so 1000/latency is the worst-case display fps; the
    # real viewer decouples readback from the pipelined render loop and
    # displays at min(render fps, this).
    import io as _io

    from PIL import Image as _Image

    fp.reset_path()
    fp.start_path()
    lat = []
    # meta-only measurement: each iteration is a serialized d2h JPEG round
    # trip (~0.4 s healthy, seconds when the tunnel stalls) — skip it
    # entirely when the budget is tight rather than risk the headline
    n_lat = 0 if over_budget(reserve_s=0.15 * budget_s) else 16
    for i in range(n_lat):
        t0 = time.perf_counter()
        fp.handle_events(eng.camera, now_ms=float(i) * 100.0)
        img = eng.frame(readback=False)
        small = jax.numpy.clip(
            img[::2, ::2, :3] * 255.0, 0, 255
        ).astype(jax.numpy.uint8)
        arr = np.asarray(jax.device_get(small))
        buf = _io.BytesIO()
        _Image.fromarray(arr, "RGB").save(buf, "JPEG", quality=82)
        lat.append((time.perf_counter() - t0) * 1e3)
    eng.renderer.drain()
    lat_med = float(np.median(lat)) if lat else 0.0

    final_hints = eng.renderer.bucket_hints()
    _save_hints(hkey, final_hints)

    # headline = 16-frame-window MEDIAN throughput: the dev harness's
    # tunnel randomly stalls for seconds at a time (the same build measured
    # 8.8 and 2.1 wall-fps within an hour, with identical 107-112 ms
    # medians), so the median is the reproducible renderer-bound number;
    # the raw wall-clock fps stays in meta as fps_wall
    med = result["median_frame_ms"]
    fps = 1000.0 / med if med > 0 else result["fps"]
    aux = eng.renderer.last_aux or {}
    n_pairs = int(aux.get("n_pairs", 0))

    # regression tripwire vs the last committed round (VERDICT r4 #6):
    # reported in meta, never fatal — a slow-session false positive must
    # not cost the round its headline. Sessions vary ~1.7x, so only a
    # large regression is flagged.
    prev = None
    import glob as _glob

    for f in sorted(_glob.glob(os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_r*.json"))):
        try:
            p = json.load(open(f)).get("parsed")
            if p and p.get("value"):
                prev = dict(round=os.path.basename(f), fps=float(p["value"]))
        except Exception:
            pass
    regression = None
    if prev:
        regression = dict(
            prev_round=prev["round"], prev_fps=prev["fps"],
            ratio=round(fps / prev["fps"], 3) if prev["fps"] else None,
            regressed_over_15pct=bool(fps < prev["fps"] * 0.85),
        )
        if regression["regressed_over_15pct"]:
            print(f"[bench] WARNING: headline {fps:.2f} fps regressed >15% "
                  f"vs {prev['round']} ({prev['fps']:.2f})", file=sys.stderr)
    meta = dict(
        frames=result["frames"],
        fps_wall=round(result["fps"], 2),
        frame_ms=round(result["frame_ms"][0], 2),
        median_frame_ms=round(result["median_frame_ms"], 2),
        clean_frame_ms=round(result["clean_frame_ms"], 2),
        stall_windows=result["stall_windows"],
        n_windows=result["n_windows"],
        sort_ms=round(result["sort_ms"][0], 2),
        build_ms=round(result["build_ms"][0], 2),
        sort_trigger=round(result["sort_trigger"], 3),
        builder_load=round(result["builder_load"], 3),
        overflow_frames=getattr(eng.renderer, "overflow_frames", 0),
        n_pairs=n_pairs,
        splats_per_tile=splats,
        use_skybox=True,
        use_proxy=True,
        # compositor throughput: (tile,splat) pairs composited per second
        splats_composited_per_s=round(n_pairs * fps / 1e6, 1),
        setup_s=round(t_warm - t_start, 1),
        setup_split_s=dict(
            imports_and_scene=round(t_scene - t_start, 1),
            configure_to_first_frame=round(t_ready - t_scene, 1),
            warmup_compiles=round(t_warm - t_ready, 1),
        ),
        recompiles_in_run=len(getattr(eng.renderer, "compile_events", []))
        - n_compiles_warm,
        timed_reruns=timed_reruns,
        # end-to-end interactive latency: input -> frame -> downscale ->
        # d2h -> JPEG, the viewer's display path (serialized measurement;
        # the viewer overlaps it with the pipelined render loop)
        interactive_latency_ms=round(lat_med, 1),
        display_fps_worst_case=round(1000.0 / lat_med, 2) if lat_med else 0,
        # session maxima of the adaptive-bucket demands (grow-only hints):
        # a pathological pose shows up here as an outsized bucket; also
        # persisted to .gswt_hints.json so the next run starts converged
        bucket_hints=final_hints,
        hints_preloaded=bool(loaded_hints),
        budget_s=budget_s,
        regression=regression,
    )

    def emit():
        # the headline's metric/value never change between emits, so the
        # driver gets the same number whether it parses the first or the
        # last JSON line; the second emit only enriches meta with the
        # optional dense row
        print(
            json.dumps(
                {
                    "metric": (
                        "1080p full-config (skybox+proxy) infinite-terrain "
                        "fly-through FPS (device-complete)"
                    ),
                    "value": round(fps, 2),
                    "unit": "fps",
                    "vs_baseline": round(fps / 60.0, 4),
                    "meta": meta,
                }
            ),
            flush=True,
        )

    # print the headline BEFORE anything optional (VERDICT r4 #1: the
    # round-4 run was killed inside the dense row and the computed
    # headline was lost)
    emit()
    eng.shutdown()

    # dense row (VERDICT r2: 8192-splat lod-0 tiles, 5-LOD /4 chain):
    # a short sync measurement with the same stall discard. Optional —
    # skipped entirely when the wall-clock budget can't cover its ~4 min.
    dense = None
    if os.environ.get("GSWT_BENCH_NO_DENSE"):
        dense = {"skipped": "GSWT_BENCH_NO_DENSE"}
    elif over_budget(reserve_s=300.0):
        dense = {"skipped": f"budget ({time.time() - t_start:.0f}s elapsed "
                            f"of {budget_s:.0f}s)"}
    else:
        # SUBPROCESS with a hard timeout: the dense variant's cold compile
        # measured >17 min on the dev tunnel (2026-08-21), and an XLA
        # compile cannot be interrupted in-process — a budget check at
        # entry cannot bound it. The child is killed at the budget edge
        # and the already-printed headline is untouched either way.
        import subprocess

        remain = budget_s - (time.time() - t_start)
        child_timeout = max(min(remain - 30.0, 1800.0), 180.0)
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--dense-only",
                 str(width), str(height)],
                capture_output=True, text=True, timeout=child_timeout,
            )
            sys.stderr.write(r.stderr[-2000:])
            last = (r.stdout.strip().splitlines() or ["{}"])[-1]
            dense = json.loads(last) if r.returncode == 0 else {
                "error": f"rc={r.returncode}: {r.stdout[-200:]}"}
        except subprocess.TimeoutExpired:
            dense = {"skipped": f"dense subprocess hit its "
                                f"{child_timeout:.0f}s timeout (budget "
                                f"{budget_s:.0f}s)"}
        except Exception as e:  # pragma: no cover - report, don't fail
            dense = {"error": str(e)[:200]}
    meta["dense"] = dense
    if "skipped" not in (dense or {}):
        emit()


def _dense_only_main():
    """`bench.py --dense-only W H`: run ONLY the dense row and print its
    dict as the last stdout line (consumed by main()'s subprocess call)."""
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    height = int(sys.argv[3]) if len(sys.argv) > 3 else 1080
    print(json.dumps(_dense_row(width, height)), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--dense-only":
        _dense_only_main()
    else:
        main()
