#!/usr/bin/env python
"""Joint same-session sweep of (tile_w, tile_h, chunk, step) on the FULL
headline config (1080p, skybox + proxy, 512-splat tiles).

Why joint: per-pair raster work scales with TILE AREA, not ellipse area
(a 5-px splat still burns a full (chunk, P) lane block row), so finer
tiles cut raster lane work ~linearly — but they grow the pair count and
the binning sort domain, and they multiply the worklist entry count,
whose fixed ~0.8-1.7 us/step cost only the blocked kernel (step > 1)
amortizes. The historical "64x32 wins" result predates the blocked
kernel; this harness re-decides the shape with all three knobs moving
together, on the full frame (the proxy raster + depth-test + skybox
composite all run on the same tile grid).

Methodology: one Engine per config (fresh jit caches pick up the step
env), pipelined frames along the bench fly path, dispatch-stamp windows
with the stall-discard rule (axon tunnel stalls randomly for seconds).
Bucket hints persist per config key so re-runs skip the grow-only
compile ladder.

    python benchmarks/sweep_shapes.py                 # default grid
    GSWT_SWEEP="64x32x256x4,32x16x128x8" python benchmarks/sweep_shapes.py
    GSWT_SWEEP_FRAMES=96 GSWT_SWEEP_SPLATS=512 ...
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# trailing "c" = exact ellipse-tile cull on (RendererConfig.cull_exact)
DEFAULT_GRID = (
    "64x32x256x4,64x32x256x1,64x32x256x4c,32x32x256x4,"
    "32x16x128x8,32x16x128x8c,16x16x128x8,16x16x128x8c"
)


def fly_path():
    from gswt_renderer_tpu.engine import FlyPathControl, FlyPathFrame

    fp = FlyPathControl()
    kf = [
        (0.0, (0.0, 0.0, 5.0), (0.0, 30.0, 2.0)),
        (5.0, (6.0, 18.0, 5.0), (10.0, 48.0, 2.0)),
        (10.0, (2.0, 40.0, 6.0), (-20.0, 60.0, 1.0)),
        (15.0, (-10.0, 55.0, 5.0), (-30.0, 80.0, 2.0)),
    ]
    for t, p, tgt in kf:
        fp.keyframes.append(
            FlyPathFrame(t, np.array(p, np.float32), np.array(tgt, np.float32))
        )
    return fp


def run_config(scene_vec, tile_w, tile_h, chunk, step, cull, *, width,
               height, n_frames, n_lod, splats):
    from gswt_renderer_tpu.core import UserData, hintstore
    from gswt_renderer_tpu.core.config import SurfaceType
    from gswt_renderer_tpu.engine import Engine
    from gswt_renderer_tpu.render.pipeline import RendererConfig

    os.environ["GSWT_RASTER_STEP"] = str(step)
    t0 = time.time()
    elem = int(os.environ.get("GSWT_SWEEP_ELEM") or 0)
    rc_kw = dict(elem_paths=elem) if elem else {}
    eng = Engine(
        scene_vec, viewport=(width, height),
        renderer_config=RendererConfig(
            width=width, height=height,
            tile_w=tile_w, tile_h=tile_h, chunk=chunk, cull_exact=cull,
            **rc_kw),
        synchronous=False,
    )
    hkey = (f"v1_{width}x{height}_s{splats}_l{n_lod}_full"
            f"_t{tile_w}x{tile_h}_c{chunk}" + ("_cull" if cull else "")
            + (f"_e{elem}" if elem else "")
            + ("_dc" if eng.renderer.cfg.depth_cull else "")
            + ("_sat" if eng.renderer.cfg.sat_cull
               and not eng.renderer.cfg.exact else ""))
    loaded = hintstore.load(hkey)
    if loaded:
        eng.renderer.set_bucket_hints(loaded)
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
    half = int(os.environ.get("GSWT_SWEEP_HALF") or 48)
    eng.configure(UserData.from_ui(
        tile_map_half_wh=(half, half), tile_width=4.0,
        surface_type=SurfaceType.HEIGHT_MAP,
        height_map_wh=(10, 10), height_map_scale=(1.0, 0.3),
        lod_max_dist=96.0, lod_transition_width_ratio=0.05,
        merge_dot_threshold=0.2, merge_topk=100, cache_size=1024,
    ))
    ok = eng.wait_ready(timeout_s=900)
    if not ok:
        eng.shutdown()
        return dict(error="engine not ready")

    fp = fly_path()
    # warm-up walk: converge grow-only buckets + compile every variant
    stride = float(os.environ.get("GSWT_SWEEP_WARM_STRIDE") or 0.5)
    fp.reset_path()
    fp.start_path()
    for t in np.arange(0.0, 15.01, stride):
        fp.handle_events(eng.camera, now_ms=float(t) * 1000.0)
        eng.frame(readback=False)
    eng.renderer.drain()
    # settle the teleport transition wave outside the timed window
    fp.reset_path()
    fp.start_path()
    for t in np.arange(0.0, 3.01, 0.25):
        fp.handle_events(eng.camera, now_ms=float(t) * 1000.0)
        eng.frame(readback=False)
    eng.renderer.drain()
    t_warm = time.time()

    # timed: pipelined frames, dispatch-stamp windows, stall discard
    times = np.linspace(3.0, 15.0, n_frames)
    stamps = [time.perf_counter()]
    for t in times:
        fp.handle_events(eng.camera, now_ms=float(t) * 1000.0)
        eng.frame(readback=False)
        stamps.append(time.perf_counter())
    eng.renderer.drain()
    stamps.append(time.perf_counter())
    win = min(8, max(len(stamps) - 2, 1))
    wins = [
        (stamps[i + win] - stamps[i]) / win * 1e3
        for i in range(0, len(stamps) - win, win)
    ]
    med = float(np.median(wins)) if wins else 0.0
    kept = [w for w in wins if w <= 3.0 * med] or wins
    ms = float(np.mean(kept)) if kept else med
    aux = eng.renderer.last_aux or {}
    hintstore.save(hkey, eng.renderer.bucket_hints())
    res = dict(
        frame_ms=round(ms, 1),
        frame_ms_median=round(med, 1),
        fps=round(1000.0 / ms, 2) if ms > 0 else 0.0,
        n_pairs=int(aux.get("n_pairs", 0)),
        overflow_frames=int(getattr(eng.renderer, "overflow_frames", 0)),
        stall_discards=len(wins) - len(kept),
        setup_s=round(t_warm - t0, 1),
    )
    eng.shutdown()
    return res


def main():
    import jax

    # the axon platform hook force-selects the tunneled TPU regardless of
    # JAX_PLATFORMS; a cpu request must go through jax.config (see
    # tests/conftest.py) or jax.devices() hangs when the tunnel is down
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache"),
    )
    from gswt_renderer_tpu.io.synth import synthetic_scene_vec

    width = int(os.environ.get("GSWT_SWEEP_W") or 1920)
    height = int(os.environ.get("GSWT_SWEEP_H") or 1080)
    splats = int(os.environ.get("GSWT_SWEEP_SPLATS") or 512)
    n_lod = int(os.environ.get("GSWT_SWEEP_LODS") or 3)
    n_frames = int(os.environ.get("GSWT_SWEEP_FRAMES") or 96)
    grid = os.environ.get("GSWT_SWEEP") or DEFAULT_GRID
    configs = []
    for item in grid.split(","):
        item = item.strip()
        cull = item.endswith("c")
        tw, th, ch, st = (int(x) for x in item.rstrip("c").split("x"))
        configs.append((tw, th, ch, st, cull))

    scene_vec = synthetic_scene_vec(
        n_lod=n_lod, splats_per_tile=splats,
        lod_decay=4 if n_lod > 3 else 2, seed=0)

    results = {}
    for tw, th, ch, st, cull in configs:
        key = f"{tw}x{th}x{ch}x{st}" + ("c" if cull else "")
        print(f"[sweep] {key} ...", file=sys.stderr, flush=True)
        try:
            res = run_config(
                scene_vec, tw, th, ch, st, cull, width=width, height=height,
                n_frames=n_frames, n_lod=n_lod, splats=splats)
        except Exception as e:  # keep sweeping past one bad config
            res = dict(error=f"{type(e).__name__}: {e}")
        results[key] = res
        print(f"[sweep] {key}: {json.dumps(res)}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
