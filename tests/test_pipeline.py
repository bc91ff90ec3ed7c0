"""End-to-end parity: the TPU pipeline must match the NumPy oracle (the exact
WGSL transcription) within the 1e-3 budget across feature configurations."""

import numpy as np
import pytest

from gswt_renderer_tpu.core import Camera, UserData
from gswt_renderer_tpu.core.config import (
    DrawMode,
    RenderConfig,
    SelectiveMergeType,
    SurfaceType,
    TileSortType,
)
from gswt_renderer_tpu.io.synth import synthetic_scene_vec
from gswt_renderer_tpu.refrender import render_oracle
from gswt_renderer_tpu.render import build_frame_inputs
from gswt_renderer_tpu.render.pipeline import Renderer, RendererConfig
from gswt_renderer_tpu.render.uniforms import SceneParams
from gswt_renderer_tpu.tiles import WangTileEngine

W = H = 128


@pytest.fixture(scope="module")
def engine():
    sv = synthetic_scene_vec(n_lod=2, splats_per_tile=96)
    return WangTileEngine(sv)


def _setup(engine, **kw):
    kw.setdefault("tile_map_half_wh", (2, 2))
    kw.setdefault("height_map_scale", (1.0, 0.0))
    kw.setdefault("lod_max_dist", 8.0)
    kw.setdefault("surface_type", SurfaceType.NONE)
    kw.setdefault("merge_type", SelectiveMergeType.NONE)
    kw.setdefault("tile_sort_type", TileSortType.DISTANCE)
    kw.setdefault("lod_blending", False)
    ud = UserData.from_ui(**kw)
    engine.configure(ud)
    return ud


def _render_pair(engine, ud, cam_pos, target, rc=None, viewport=(W, H)):
    cam_pos = np.asarray(cam_pos, np.float32)
    engine.build_tiles(cam_pos)
    camera = Camera(viewport, cam_pos, target, (0.0, 1.0, 0.0),
                    np.deg2rad(60.0), 0.1, 200.0)
    dt = engine.sort_tiles(cam_pos, camera.view_proj())
    rc = rc or RenderConfig.new(engine.n_tiles[0])
    fi = build_frame_inputs(engine, dt, camera, rc)
    img_ref = render_oracle(fi, viewport[0], viewport[1])
    r = Renderer(
        engine,
        RendererConfig(
            exact=True,
            width=viewport[0], height=viewport[1], max_draws=128,
            max_stream=1 << 15, min_stream=1 << 12, chunk=128,
        ),
    )
    r.configure(ud)
    sp = SceneParams.from_data(ud, engine.center_coord, rc)
    img = r.render(dt, camera, sp, rc)
    return img_ref, img


def _assert_close(img_ref, img, budget=1e-3, frac=5e-4):
    diff = np.abs(img - img_ref).max(axis=-1)
    assert np.mean(diff) < 1e-4, f"mean diff {np.mean(diff)}"
    assert np.mean(diff > budget) <= frac, (
        f"{np.mean(diff > budget):.2%} of pixels over {budget}; max {diff.max()}"
    )


def test_parity_flat_topdown(engine):
    ud = _setup(engine)
    ref, img = _render_pair(engine, ud, [2.0, 2.0, 6.0], (2.0, 2.0, 0.0))
    assert ref[..., 3].mean() > 0.5  # scene actually covers the frame
    _assert_close(ref, img)


def test_parity_grazing_view(engine):
    ud = _setup(engine)
    ref, img = _render_pair(engine, ud, [0.0, -6.0, 2.0], (0.0, 0.0, 0.5))
    _assert_close(ref, img)


def test_parity_heightmap_surface(engine):
    ud = _setup(
        engine,
        surface_type=SurfaceType.HEIGHT_MAP,
        height_map_scale=(1.0, 0.3),
        height_map_wh=(8, 8),
    )
    ref, img = _render_pair(engine, ud, [1.0, -5.0, 3.0], (1.0, 0.0, 0.5))
    _assert_close(ref, img)


def test_parity_sphere_surface():
    sv = synthetic_scene_vec(n_lod=2, splats_per_tile=64)
    engine = WangTileEngine(sv)
    ud = _setup(
        engine,
        tile_map_half_wh=(5, 2),
        surface_type=SurfaceType.SPHERE,
        sphere_radius=15.0,
        lod_max_dist=30.0,
    )
    cam_pos = np.array([30.0, 0.0, 8.0], np.float32)
    engine.build_tiles(cam_pos)
    camera = Camera((W, H), cam_pos, (0.0, 0.0, 0.0), (0.0, 0.0, 1.0),
                    np.deg2rad(60.0), 0.1, 200.0)
    dt = engine.sort_tiles(cam_pos, camera.view_proj())
    rc = RenderConfig.new(engine.n_tiles[0])
    fi = build_frame_inputs(engine, dt, camera, rc)
    ref = render_oracle(fi, W, H)
    assert ref[..., 3].max() > 0.2, "sphere scene should be visible"
    r = Renderer(engine, RendererConfig(width=W, height=H, max_draws=128, exact=True,
                                        max_stream=1 << 15, min_stream=1 << 12,
                                        chunk=128))
    r.configure(ud)
    sp = SceneParams.from_data(ud, engine.center_coord, rc)
    img = r.render(dt, camera, sp, rc)
    _assert_close(ref, img)


def test_parity_lod_blending(engine):
    ud = _setup(
        engine,
        tile_map_half_wh=(3, 3),
        lod_blending=True,
        lod_max_dist=3.0,
        lod_transition_width_ratio=0.3,
        tile_sort_type=TileSortType.GRAPH,
    )
    ref, img = _render_pair(engine, ud, [0.5, -3.0, 2.5], (0.5, 2.0, 0.0))
    _assert_close(ref, img)


def test_parity_merged_draws(engine):
    ud = _setup(
        engine,
        tile_map_half_wh=(3, 3),
        merge_type=SelectiveMergeType.EDGE,
        merge_dot_threshold=0.6,
        merge_topk=30,
        tile_sort_type=TileSortType.GRAPH,
    )
    engine.build_tiles(np.array([0.0, 0.0, 1.0], np.float32))
    camera = Camera((W, H), (0.0, 0.0, 1.0), (0.0, 5.0, 0.5), (0.0, 0.0, 1.0),
                    np.deg2rad(60.0), 0.1, 200.0)
    dt = engine.sort_tiles(np.zeros(3, np.float32) + [0, 0, 1], camera.view_proj())
    assert dt.single_draw.sum() > 0, "test needs merged draws"
    rc = RenderConfig.new(engine.n_tiles[0])
    fi = build_frame_inputs(engine, dt, camera, rc)
    ref = render_oracle(fi, W, H)
    r = Renderer(engine, RendererConfig(width=W, height=H, max_draws=128, exact=True,
                                        max_stream=1 << 15, min_stream=1 << 12,
                                        chunk=128))
    r.configure(ud)
    sp = SceneParams.from_data(ud, engine.center_coord, rc)
    img = r.render(dt, camera, sp, rc)
    _assert_close(ref, img)


def test_parity_debug_modes(engine):
    ud = _setup(engine)
    for mode in (DrawMode.TILE_ID, DrawMode.LOD, DrawMode.VIEW):
        rc = RenderConfig.new(engine.n_tiles[0])
        rc.draw_mode = mode
        ref, img = _render_pair(engine, ud, [2.0, 2.0, 6.0], (2.0, 2.0, 0.0), rc)
        _assert_close(ref, img)


def test_parity_point_cloud(engine):
    ud = _setup(engine)
    rc = RenderConfig.new(engine.n_tiles[0])
    rc.draw_point_cloud = True
    rc.point_cloud_radius = 0.01
    ref, img = _render_pair(engine, ud, [2.0, 2.0, 6.0], (2.0, 2.0, 0.0), rc)
    _assert_close(ref, img)


def test_parity_splat_scale_and_scene_scale(engine):
    ud = _setup(engine)
    rc = RenderConfig.new(engine.n_tiles[0])
    rc.splat_scale = 1.5
    rc.scene_scale = (1.2, 0.9, 1.1)
    ref, img = _render_pair(engine, ud, [2.0, 2.0, 6.0], (2.0, 2.0, 0.0), rc)
    _assert_close(ref, img)


def test_parity_clip(engine):
    ud = _setup(
        engine,
        surface_type=SurfaceType.HEIGHT_MAP,
        height_map_scale=(1.0, 0.4),
        height_map_wh=(8, 8),
    )
    rc = RenderConfig.new(engine.n_tiles[0])
    rc.use_clip = True
    rc.clip_height = 0.2
    ref, img = _render_pair(engine, ud, [1.0, -5.0, 3.0], (1.0, 0.0, 0.5), rc)
    _assert_close(ref, img)


def test_lod_enable_filter(engine):
    ud = _setup(engine, tile_map_half_wh=(2, 2))
    rc = RenderConfig.new(engine.n_tiles[0])
    rc.lod_enable = (True, False)
    ref, img = _render_pair(engine, ud, [2.0, 2.0, 6.0], (2.0, 2.0, 0.0), rc)
    _assert_close(ref, img)


def test_overflow_reported(engine):
    ud = _setup(engine)
    cam_pos = np.array([2.0, 2.0, 6.0], np.float32)
    engine.build_tiles(cam_pos)
    camera = Camera((W, H), cam_pos, (2.0, 2.0, 0.0), (0.0, 1.0, 0.0),
                    np.deg2rad(60.0), 0.1, 200.0)
    dt = engine.sort_tiles(cam_pos, camera.view_proj())
    r = Renderer(engine, RendererConfig(width=W, height=H, max_draws=128, exact=True,
                                        max_stream=1 << 15, min_stream=1 << 12,
                                        chunk=128, pairs_factor=0.1))
    r.configure(ud)
    rc = RenderConfig.new(engine.n_tiles[0])
    rc.splat_scale = 4.0  # blow up coverage to overflow the pair budget
    sp = SceneParams.from_data(ud, engine.center_coord, rc)
    r.render(dt, camera, sp, rc)
    # the tight budget overflowed and was grown + retried transparently
    assert r.last_overflow_retries >= 1
    assert not bool(r.last_aux["overflow"])


def test_packed_equals_front_back_split(engine):
    """VERDICT r2 #9: the driver entry + sharded paths jit _frame_packed
    while the interactive path runs _frame_front/_frame_back separately;
    pin them pixel-equal (with and without skybox+proxy)."""
    import jax

    ud = _setup(
        engine,
        surface_type=SurfaceType.HEIGHT_MAP,
        height_map_scale=(1.0, 0.2),
        height_map_wh=(8, 8),
    )
    cam_pos = np.array([1.0, -5.0, 3.0], np.float32)
    engine.build_tiles(cam_pos)
    camera = Camera((W, H), cam_pos, (1.0, 0.0, 0.5), (0.0, 1.0, 0.0),
                    np.deg2rad(60.0), 0.1, 200.0)
    dt = engine.sort_tiles(cam_pos, camera.view_proj())
    rc = RenderConfig.new(engine.n_tiles[0])
    r = Renderer(engine, RendererConfig(width=W, height=H, max_draws=128,
                                        max_stream=1 << 15, min_stream=1 << 12,
                                        chunk=128))
    r.configure(ud)
    sky = np.clip(np.linspace(0, 3, 16)[:, None, None]
                  * np.ones((16, 32, 3), np.float32), 0, 3)
    checker = np.kron(np.indices((8, 8)).sum(0) % 2,
                      np.ones((4, 4))).astype(np.float32)
    r.set_skybox(sky, equirect=True)
    r.set_proxy(np.stack([checker, checker * 0.5, checker * 0.2], axis=-1))
    sp = SceneParams.from_data(ud, engine.center_coord, rc)

    for use_bg in (False, True):
        img_split = r.render(dt, camera, sp, rc, use_skybox=use_bg,
                             use_proxy=use_bg, as_numpy=True)
        # packed path with identical buckets/options
        staged = r.stage(dt, camera, rc.culling_dist)
        from gswt_renderer_tpu.core.camera import CameraUniforms

        mp = r._pairs_bucket(staged["s_pad"])
        ml = r._live_bucket(staged["s_pad"])
        proxy_opts = dict(
            height_offset=float(rc.proxy_height),
            brightness=float(rc.proxy_brightness),
            black_background=bool(rc.proxy_black_background),
            use_clip=bool(rc.use_clip),
            clip_height=float(rc.clip_height),
            mip_meta=getattr(r, "proxy_mip_meta", ((1, 1, 0),)),
            proxy_pairs=r._proxy_bucket() if use_bg else 1 << 12,
        )
        uniforms = np.asarray(r.pack_frame_uniforms(
            sp, CameraUniforms(camera), [True] * 16, rc.culling_dist))
        prox = dict(atlas=r.proxy_tex, verts=r.proxy_verts, tris=r.proxy_tris)
        img_packed, aux = r._frame_packed(
            r.store_packed, r.panels, staged["stream"], staged["draw"],
            uniforms, r.hm4, r.skybox_tex, prox, hm_src=r.hm_src,
            surface_type=int(sp.surface_type), draw_mode=0,
            point_cloud=False, use_skybox=use_bg, use_proxy=use_bg,
            proxy_opts=proxy_opts, max_pairs=mp,
            max_entries=r._ne_bucket(staged["s_pad"], mp, ml), max_live=ml,
        )
        img_packed = np.asarray(jax.device_get(img_packed))
        # fusion boundaries differ between the one-program and two-program
        # partitions, so fp association differs in the fast profile's bf16
        # chains; pin to the standing parity budget
        _assert_close(img_split, img_packed, budget=1e-3, frac=1e-3)


def test_packed_interactive_env_path(engine, monkeypatch):
    """GSWT_PACKED_INTERACTIVE=1 routes render() through the fused
    one-program frame (_get_jit_packed) — pin it pixel-close to the
    default split path including the full skybox+proxy config, and check
    the aux/bucket machinery (overflow retry hints) still feeds through."""
    ud = _setup(
        engine,
        surface_type=SurfaceType.HEIGHT_MAP,
        height_map_scale=(1.0, 0.2),
        height_map_wh=(8, 8),
    )
    cam_pos = np.array([1.0, -5.0, 3.0], np.float32)
    engine.build_tiles(cam_pos)
    camera = Camera((W, H), cam_pos, (1.0, 0.0, 0.5), (0.0, 1.0, 0.0),
                    np.deg2rad(60.0), 0.1, 200.0)
    dt = engine.sort_tiles(cam_pos, camera.view_proj())
    rc = RenderConfig.new(engine.n_tiles[0])
    sky = np.clip(np.linspace(0, 3, 16)[:, None, None]
                  * np.ones((16, 32, 3), np.float32), 0, 3)
    checker = np.kron(np.indices((8, 8)).sum(0) % 2,
                      np.ones((4, 4))).astype(np.float32)

    def _mk():
        r = Renderer(engine, RendererConfig(
            width=W, height=H, max_draws=128,
            max_stream=1 << 15, min_stream=1 << 12, chunk=128))
        r.configure(ud)
        r.set_skybox(sky, equirect=True)
        r.set_proxy(np.stack([checker, checker * 0.5, checker * 0.2],
                             axis=-1))
        return r

    sp = SceneParams.from_data(ud, engine.center_coord, rc)
    monkeypatch.delenv("GSWT_PACKED_INTERACTIVE", raising=False)
    img_split = _mk().render(dt, camera, sp, rc, use_skybox=True,
                             use_proxy=True, as_numpy=True)
    monkeypatch.setenv("GSWT_PACKED_INTERACTIVE", "1")
    rp = _mk()
    img_packed = rp.render(dt, camera, sp, rc, use_skybox=True,
                           use_proxy=True, as_numpy=True)
    assert rp.last_aux is not None and not bool(rp.last_aux["overflow"])
    # same key grain as the split path: exactly one packed variant compiled
    assert len(getattr(rp, "_packed_jit", {})) == 1
    _assert_close(img_split, img_packed, budget=1e-3, frac=1e-3)
