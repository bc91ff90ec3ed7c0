"""Performance-shape contracts (VERDICT r2 #7/#8).

These pin STRUCTURE, not absolute speed: the builder thread must overlap
sorting with rendering (an always-sorting camera cannot serialize the
pipeline), and a small fixed config must stay within a generous frame
ceiling so catastrophic regressions (e.g. an accidental interpret-mode
fallback or a quadratic host path) fail tests instead of surfacing at
round end. Absolute TPU numbers are bench.py's job (run with
GSWT_TEST_TPU=1 for on-chip ceilings).
"""

import json
import os
import time

import numpy as np
import pytest

from gswt_renderer_tpu.core import UserData
from gswt_renderer_tpu.core.config import (
    SelectiveMergeType, SurfaceType, TileSortType,
)
from gswt_renderer_tpu.engine import Engine
from gswt_renderer_tpu.io.synth import synthetic_scene_vec
from gswt_renderer_tpu.render.pipeline import RendererConfig


def _mk_engine(synchronous=False, always_sort=False):
    sv = synthetic_scene_vec(n_lod=2, splats_per_tile=48)
    eng = Engine(
        sv, viewport=(64, 64),
        renderer_config=RendererConfig(
            width=64, height=64, max_draws=64,
            max_stream=1 << 13, min_stream=1 << 11, chunk=128,
        ),
        synchronous=synchronous,
    )
    ud = UserData.from_ui(
        tile_map_half_wh=(2, 2), height_map_scale=(1.0, 0.0),
        lod_max_dist=8.0, surface_type=SurfaceType.HEIGHT_MAP,
        merge_type=SelectiveMergeType.NONE,
        tile_sort_type=TileSortType.DISTANCE, lod_blending=False,
    )
    ud.always_sort = always_sort
    eng.configure(ud)
    assert eng.wait_ready(timeout_s=300)
    return eng


def _time_frames(eng, n, rotate):
    # warm: compile + fill the pipeline
    for _ in range(4):
        eng.frame(readback=False)
    eng.renderer.drain()
    if rotate:
        # a held rotation key changes the view-projection every frame, so
        # the builder is asked to re-sort continuously (the 0.01 L1 gate
        # of state.rs:527-548 passes each frame)
        eng.handle_key("j", True)
    t0 = time.perf_counter()
    for _ in range(n):
        eng.frame(readback=False)
    eng.renderer.drain()
    if rotate:
        eng.handle_key("j", False)
    return (time.perf_counter() - t0) / n * 1e3


def test_builder_overlap_always_sorting_camera():
    """A camera whose view-projection changes every frame forces a re-sort
    per frame; with the builder thread overlapping, frame time must not
    collapse to sort+build serialization (< 2.5x the still-camera rate —
    generous for CI timing noise)."""
    eng = _mk_engine(synchronous=False, always_sort=True)
    try:
        still = _time_frames(eng, 12, rotate=False)
        moving = _time_frames(eng, 12, rotate=True)
        assert eng.sort_trigger_ma.calc()[0] > 0.05, (
            "test precondition: the moving camera must actually re-sort "
            f"(trigger {eng.sort_trigger_ma.calc()[0]:.2f})"
        )
        assert moving < max(still, 1.0) * 2.5 + 60.0, (
            f"always-sorting camera serialized the pipeline: "
            f"still {still:.1f} ms vs moving {moving:.1f} ms"
        )
    finally:
        eng.shutdown()


def test_perf_smoke_small_frame_ceiling():
    """Generous absolute ceiling on the small fixed config: CPU interpret
    regressions and quadratic host paths blow this by 10x+."""
    eng = _mk_engine(synchronous=True)
    try:
        for _ in range(2):
            eng.frame(readback=False)
        t0 = time.perf_counter()
        n = 5
        for _ in range(n):
            eng.camera.translate(np.array([0.02, 0.05, 0.0], np.float32))
            eng.frame(readback=False)
        ms = (time.perf_counter() - t0) / n * 1e3
        ceiling = 400.0 if os.environ.get("GSWT_TEST_TPU") == "1" else 3000.0
        assert ms < ceiling, f"small-config frame {ms:.0f} ms > {ceiling} ms"
    finally:
        eng.shutdown()


def test_bucket_hints_roundtrip_reaches_same_buckets():
    """bucket_hints()/set_bucket_hints() (bench.py persistence): seeding a
    fresh renderer with a previous session's hints must produce the SAME
    bucket choices as the session that generated them — that is the whole
    point (one compile per program on a warm start)."""
    eng = _mk_engine(synchronous=True)
    try:
        for _ in range(3):
            eng.camera.translate(np.array([0.02, 0.05, 0.0], np.float32))
            eng.frame(readback=False)
        r = eng.renderer
        h = r.bucket_hints()
        assert h["n_live"] > 0 and h["n_entries"] > 0
        s_pad = 1 << 13
        want = (
            r._pairs_bucket(s_pad), r._live_bucket(s_pad),
            r._ne_bucket(s_pad, r._pairs_bucket(s_pad), r._live_bucket(s_pad)),
            r._live_path_buckets(s_pad, r._live_bucket(s_pad)),
        )
        # fresh renderer, seeded only by the exported hints
        eng2 = _mk_engine(synchronous=True)
        try:
            r2 = eng2.renderer
            r2.set_bucket_hints(json.loads(json.dumps(h)))  # JSON round-trip
            got = (
                r2._pairs_bucket(s_pad), r2._live_bucket(s_pad),
                r2._ne_bucket(s_pad, r2._pairs_bucket(s_pad),
                              r2._live_bucket(s_pad)),
                r2._live_path_buckets(s_pad, r2._live_bucket(s_pad)),
            )
            assert got == want
            # floors merge upward, zeros/absent are ignored
            r2.set_bucket_hints({"n_extra": 1, "n_live": 0})
            assert r2._pairs_hint == max(1, h["n_extra"])
            assert r2._live_hint == h["n_live"]
        finally:
            eng2.shutdown()
    finally:
        eng.shutdown()


def test_hintstore_engine_roundtrip(tmp_path, monkeypatch):
    """Engine(hints_key=...) persists demand maxima on shutdown and seeds
    a fresh engine from the store (core/hintstore.py)."""
    monkeypatch.setenv("GSWT_HINTS_PATH", str(tmp_path / "h.json"))
    from gswt_renderer_tpu.core import hintstore

    sv = synthetic_scene_vec(n_lod=2, splats_per_tile=48)
    rc = RendererConfig(width=64, height=64, max_draws=64,
                        max_stream=1 << 13, min_stream=1 << 11, chunk=128)
    ud = UserData.from_ui(
        tile_map_half_wh=(2, 2), height_map_scale=(1.0, 0.0),
        lod_max_dist=8.0, surface_type=SurfaceType.HEIGHT_MAP,
        merge_type=SelectiveMergeType.EDGE, merge_dot_threshold=0.5,
        merge_topk=20, tile_sort_type=TileSortType.GRAPH,
    )
    eng = Engine(sv, viewport=(64, 64), renderer_config=rc,
                 synchronous=True, hints_key="k1")
    eng.configure(ud)
    assert eng.wait_ready(timeout_s=120)
    # 3 frames + drain: the FIRST sat-cull frame's pre-cut demand is
    # deliberately kept out of the hints (pipeline.py hint_poison), and
    # pipelined frames absorb their aux at drain time
    for _ in range(3):
        eng.camera.translate(np.array([0.02, 0.05, 0.0], np.float32))
        eng.frame(readback=False)
    eng.renderer.drain()
    want = eng.renderer.bucket_hints()
    assert want["n_live"] > 0  # culled-frame demand was absorbed
    eng.shutdown()
    assert hintstore.load("k1") == want
    # idle session must NOT clobber the stored entry with zeros
    eng_idle = Engine(sv, viewport=(64, 64), renderer_config=rc,
                      synchronous=True, hints_key="k1")
    eng_idle.shutdown()
    assert hintstore.load("k1") == want
    # a fresh engine seeds its buckets from the store
    eng2 = Engine(sv, viewport=(64, 64), renderer_config=rc,
                  synchronous=True, hints_key="k1")
    try:
        assert eng2.renderer.bucket_hints()["n_live"] == want["n_live"]
        assert eng2.renderer._ne_hint == want["n_entries"]
    finally:
        eng2.shutdown()
