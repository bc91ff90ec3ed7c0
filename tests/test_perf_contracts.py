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


@pytest.mark.skipif(
    os.environ.get("GSWT_TEST_TPU") != "1",
    reason="on-chip per-stage tripwire (VERDICT r4 #6)",
)
def test_stage_ceilings_on_chip():
    """Per-stage ceilings at the headline 1080p full config, measured on
    the renderer's own front (projection + binning + background/proxy) /
    back (Pallas raster + composite) program split. Generous (~2x the
    slow-session budget, PERFORMANCE.md) so only a REAL structural
    regression trips — round 4 shipped a +6% default-on regression with
    only the whole-frame ceiling in place."""
    import jax

    from gswt_renderer_tpu.core import Camera, UserData
    from gswt_renderer_tpu.core.config import RenderConfig, SurfaceType
    from gswt_renderer_tpu.render.uniforms import SceneParams
    from gswt_renderer_tpu.tiles import WangTileEngine

    width, height = 1920, 1080
    sv = synthetic_scene_vec(n_lod=3, splats_per_tile=512, seed=0)
    eng = WangTileEngine(sv)
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

    from gswt_renderer_tpu.render.pipeline import Renderer

    r = Renderer(eng, RendererConfig(width=width, height=height))
    r.configure(ud)
    sky = np.clip(np.linspace(0, 4, 64)[:, None, None]
                  * np.ones((64, 128, 3), np.float32), 0, 4)
    checker = np.kron(np.indices((64, 64)).sum(0) % 2,
                      np.ones((8, 8))).astype(np.float32)
    r.set_skybox(sky, equirect=True)
    r.set_proxy(np.stack([checker * 0.8 + 0.1, checker * 0.5 + 0.2,
                          checker * 0.3 + 0.1], axis=-1))
    from gswt_renderer_tpu.core import hintstore

    hints = hintstore.load(
        f"v1_{width}x{height}_s512_l3_full_t64x32_c256"
        + ("_cull" if r.cfg.cull_exact else ""))
    if hints:
        r.set_bucket_hints(hints)
    rc = RenderConfig.new(eng.n_tiles[0])
    sp = SceneParams.from_data(ud, eng.center_coord, rc)
    staged = r.stage(dt, camera, rc.culling_dist)

    def full_frame():
        img = r.render(None, camera, sp, rc, staged=staged, as_numpy=False,
                       use_skybox=True, use_proxy=True)
        jax.block_until_ready(img)

    for _ in range(4):  # compile + converge buckets
        full_frame()

    # reproduce the converged front/back programs the frame used
    from gswt_renderer_tpu.core.camera import CameraUniforms

    dc = r.cfg.depth_cull
    mp = r._pairs_bucket(staged["s_pad"], dc)
    ml = r._live_bucket(staged["s_pad"], dc)
    key = (
        staged["s_pad"], mp, r._ne_bucket(staged["s_pad"], mp, ml, dc), ml,
        int(sp.surface_type), int(rc.draw_mode), bool(rc.draw_point_cloud),
        True, True,
        (
            ("height_offset", float(rc.proxy_height)),
            ("brightness", float(rc.proxy_brightness)),
            ("black_background", bool(rc.proxy_black_background)),
            ("use_clip", bool(rc.use_clip)),
            ("clip_height", float(rc.clip_height)),
            ("mip_meta", getattr(r, "proxy_mip_meta", ((1, 1, 0),))),
            ("mip_pyr", getattr(r, "proxy_pyr_meta", None)
             if not r.cfg.exact else None),
            ("proxy_pairs", r._proxy_bucket()),
        ),
        r._live_path_buckets(staged["s_pad"], ml, dc),
        False,
    )
    fn = r._get_jit(key)
    fn_back = r._get_jit_back(True, False)
    uniforms = __import__("jax.numpy", fromlist=["asarray"]).asarray(
        r.pack_frame_uniforms(sp, CameraUniforms(camera),
                              list(rc.lod_enable or [True] * 16),
                              rc.culling_dist))

    def timed(f, n=8):
        f()  # warm this exact program
        t0 = time.perf_counter()
        for _ in range(n):
            out = f()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n * 1e3

    def front():
        out = fn(r.store_packed, r.panels, staged["stream"], staged["draw"],
                 uniforms, r.hm4, r.skybox_tex,
                 dict(atlas=r.proxy_tex, verts=r.proxy_verts,
                      tris=r.proxy_tris,
                      **({"pyr": r.proxy_pyr}
                         if getattr(r, "proxy_pyr", None) is not None
                         and not r.cfg.exact else {})),
                 getattr(r, "hm_src", None), None)
        jax.block_until_ready(out)
        return out

    binned, bg, depth_tiles, _aux = front()

    def back():
        img = fn_back(binned, bg, depth_tiles)
        jax.block_until_ready(img)
        return img

    front_ms = timed(lambda: front()[1])
    back_ms = timed(back)
    total_ms = timed(lambda: full_frame())
    print(f"\n[stage ceilings] front {front_ms:.1f} ms, back {back_ms:.1f} "
          f"ms, full {total_ms:.1f} ms")
    # budget (PERFORMANCE.md, slow-session scale): front = projection ~12
    # + binning ~42 + skybox ~5 + proxy ~21 ~= 80; back = raster ~57 +
    # depth test ~13 ~= 70. Ceilings ~1.8x for session variance.
    assert front_ms < 145.0, f"front program {front_ms:.1f} ms (binning/" \
        f"projection/proxy regression)"
    assert back_ms < 125.0, f"back program {back_ms:.1f} ms (raster " \
        f"regression)"
    assert total_ms < 260.0, f"full frame {total_ms:.1f} ms"


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
