"""Fast-profile parity: the default renderer (exact=False) packs the pair
table to bf16/u8 and uses the analytic height-map gradient (PARITY.md #8).
Its deviation from the exact WGSL/oracle math must stay bounded by the
quantization — around the reference's own 8-bit ROP floor — across merged +
LOD-blended height-map scenes."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from gswt_renderer_tpu.core import Camera, UserData
from gswt_renderer_tpu.core.config import (
    RenderConfig,
    SelectiveMergeType,
    SurfaceType,
    TileSortType,
)
from gswt_renderer_tpu.io.synth import synthetic_scene_vec
from gswt_renderer_tpu.refrender import render_oracle
from gswt_renderer_tpu.render.pipeline import Renderer, RendererConfig
from gswt_renderer_tpu.render.uniforms import SceneParams, build_frame_inputs
from gswt_renderer_tpu.tiles import WangTileEngine

W = H = 128


def _scene(surface):
    sv = synthetic_scene_vec(n_lod=2, splats_per_tile=64)
    eng = WangTileEngine(sv)
    ud = UserData.from_ui(
        tile_map_half_wh=(2, 2),
        height_map_scale=(1.0, 0.25),
        height_map_wh=(8, 8),
        lod_max_dist=8.0,
        surface_type=surface,
        merge_type=SelectiveMergeType.EDGE,
        merge_dot_threshold=0.5,
        merge_topk=20,
        tile_sort_type=TileSortType.GRAPH,
        lod_blending=True,
    )
    eng.configure(ud)
    cam_pos = np.array([0.5, -1.0, 3.0], np.float32)
    eng.build_tiles(cam_pos)
    camera = Camera(
        (W, H), cam_pos, (0.3, 8.0, 0.8), (0.0, 0.0, 1.0),
        np.deg2rad(50.0), 0.1, 200.0,
    )
    dt = eng.sort_tiles(cam_pos, camera.view_proj())
    return eng, ud, dt, camera


@pytest.mark.parametrize(
    "surface", [SurfaceType.HEIGHT_MAP, SurfaceType.NONE]
)
def test_fast_profile_within_quantization_budget(surface):
    eng, ud, dt, camera = _scene(surface)
    rc = RenderConfig.new(eng.n_tiles[0])
    fi = build_frame_inputs(eng, dt, camera, rc)
    ref = render_oracle(fi, W, H)
    r = Renderer(
        eng,
        RendererConfig(
            width=W, height=H, max_draws=128, max_stream=1 << 14,
            min_stream=1 << 12, chunk=128, exact=False,
        ),
    )
    assert r.cfg.exact is False  # fast is the default profile
    r.configure(ud)
    sp = SceneParams.from_data(ud, eng.center_coord, rc)
    img = r.render(dt, camera, sp, rc)
    d = np.abs(img - ref)
    assert d.max() <= 8.0 / 255.0, f"max dev {d.max():.5f}"
    assert (d > 2.0 / 255.0).mean() <= 0.005, (
        f"{(d > 2/255).mean():.4%} of values deviate > 2/255"
    )
    assert d.mean() <= 0.5 / 255.0


def test_fast_proxy_visibility_matches_exact_at_range():
    """Far-range proxy regression (benchmarks/dbg_fast_exact_proxy.py):
    with the reference default proxy_height=-0.5 every surface splat sits
    in front of the proxy by an NDC gap far below bf16's ulp at range.
    The fast profile TRUNCATES z to bf16 (floor — ops/binning.py pack
    site) so the kernel's `z < depth` test keeps every splat the exact
    profile keeps; nearest-rounding instead resolved those ties to
    'behind' and replaced ~30% of full-config pixels with the proxy
    texture (max diff 0.76 at the 1080p bench camera)."""
    sv = synthetic_scene_vec(n_lod=2, splats_per_tile=48)
    sky = np.clip(
        np.linspace(0, 2, 16)[:, None, None]
        * np.ones((16, 32, 3), np.float32), 0, 2)
    checker = np.kron(np.indices((8, 8)).sum(0) % 2,
                      np.ones((4, 4))).astype(np.float32)
    tex = np.stack([checker * 0.8 + 0.1, checker * 0.5 + 0.2,
                    checker * 0.3 + 0.1], axis=-1)
    eng = WangTileEngine(sv)
    ud = UserData.from_ui(
        tile_map_half_wh=(6, 6),
        height_map_scale=(1.0, 0.25),
        height_map_wh=(8, 8),
        lod_max_dist=24.0,
        surface_type=SurfaceType.HEIGHT_MAP,
        merge_type=SelectiveMergeType.NONE,
        tile_sort_type=TileSortType.DISTANCE,
        lod_blending=False,
    )
    eng.configure(ud)
    cam_pos = np.array([0.0, -20.0, 3.0], np.float32)
    eng.build_tiles(cam_pos)
    # far plane + shallow view: splat-vs-proxy NDC gaps at 20-40 units
    # are ~1e-4, far below bf16's ~4e-3 ulp -> ties everywhere
    camera = Camera(
        (W, H), cam_pos, (0.0, 10.0, 0.0), (0.0, 0.0, 1.0),
        np.deg2rad(45.0), 0.1, 1000.0,
    )
    dt = eng.sort_tiles(cam_pos, camera.view_proj())
    rc = RenderConfig.new(eng.n_tiles[0])
    imgs = {}
    for exact in (True, False):
        r = Renderer(
            eng,
            RendererConfig(
                width=W, height=H, max_draws=256, max_stream=1 << 15,
                min_stream=1 << 12, chunk=128, exact=exact,
                # isolate the depth-test question: the fast profile's
                # OTHER deviations (half-res proxy silhouettes) move
                # checker-edge pixels by full texture contrast
                proxy_res_div=1,
            ),
        )
        r.configure(ud)
        r.set_skybox(sky, equirect=True)
        r.set_proxy(tex)
        sp = SceneParams.from_data(ud, eng.center_coord, rc)
        imgs[exact] = r.render(dt, camera, sp, rc, use_skybox=True,
                               use_proxy=True)
    d = np.abs(imgs[False] - imgs[True])
    # pre-fix this regime measured ~30% of pixels > 8/255 (splats
    # replaced by proxy); the fast profile's other quantizations stay
    # within the standard fastmode budget
    assert (d > 8.0 / 255.0).mean() <= 0.005, (
        f"{(d > 8/255.).mean():.4%} of values deviate > 8/255"
    )
    assert d.mean() <= 1.0 / 255.0, f"mean dev {d.mean():.5f}"


class _MatrixScene:
    """Shared scene + cached exact references for the shipped-variant
    parity matrix (VERDICT r4 #8): every combination the renderer can
    ship must be compared fast-vs-exact — the round-3 proxy-visibility
    bug lived for a round because only gs-only small frames were swept."""

    MW = MH = 96

    def __init__(self):
        sv = synthetic_scene_vec(n_lod=2, splats_per_tile=48)
        self.sky = np.clip(
            np.linspace(0, 2, 16)[:, None, None]
            * np.ones((16, 32, 3), np.float32), 0, 2)
        checker = np.kron(np.indices((8, 8)).sum(0) % 2,
                          np.ones((4, 4))).astype(np.float32)
        self.tex = np.stack([checker * 0.8 + 0.1, checker * 0.5 + 0.2,
                             checker * 0.3 + 0.1], axis=-1)
        self.eng = WangTileEngine(sv)
        self.ud = UserData.from_ui(
            tile_map_half_wh=(6, 6),
            height_map_scale=(1.0, 0.25),
            height_map_wh=(8, 8),
            lod_max_dist=24.0,
            surface_type=SurfaceType.HEIGHT_MAP,
            merge_type=SelectiveMergeType.NONE,
            tile_sort_type=TileSortType.DISTANCE,
            lod_blending=False,
        )
        self.eng.configure(self.ud)
        self.rc = RenderConfig.new(self.eng.n_tiles[0])
        self.sp = SceneParams.from_data(self.ud, self.eng.center_coord,
                                        self.rc)
        self._dt = {}
        self._ref = {}

    def camera_dt(self, far):
        if far not in self._dt:
            cam_pos = (np.array([0.0, -20.0, 3.0], np.float32) if far
                       else np.array([0.5, -2.0, 2.0], np.float32))
            tgt = (0.0, 10.0, 0.0) if far else (0.3, 6.0, 0.8)
            self.eng.build_tiles(cam_pos)
            camera = Camera(
                (self.MW, self.MH), cam_pos, tgt, (0.0, 0.0, 1.0),
                np.deg2rad(45.0), 0.1, 1000.0,
            )
            dt = self.eng.sort_tiles(cam_pos, camera.view_proj())
            self._dt[far] = (camera, dt)
        return self._dt[far]

    def _renderer(self, exact, dc=False, sat=False):
        r = Renderer(
            self.eng,
            RendererConfig(
                width=self.MW, height=self.MH, max_draws=256,
                max_stream=1 << 15, min_stream=1 << 12, chunk=128,
                exact=exact, depth_cull=dc, sat_cull=sat,
                # isolate depth/cull/quantization parity: the fast
                # profile's half-res proxy moves checker-edge pixels by
                # full texture contrast (covered by
                # test_proxy_res_div_parity)
                proxy_res_div=1,
            ),
        )
        r.configure(self.ud)
        r.set_skybox(self.sky, equirect=True)
        r.set_proxy(self.tex)
        return r

    def exact_ref(self, far, use_skybox, use_proxy):
        key = (far, use_skybox, use_proxy)
        if key not in self._ref:
            camera, dt = self.camera_dt(far)
            r = self._renderer(exact=True)
            self._ref[key] = r.render(
                dt, camera, self.sp, self.rc,
                use_skybox=use_skybox, use_proxy=use_proxy)
        return self._ref[key]


@pytest.fixture(scope="module")
def matrix_scene():
    return _MatrixScene()


@pytest.mark.parametrize("far", [False, True])
@pytest.mark.parametrize("use_skybox,use_proxy",
                         [(False, False), (True, False), (False, True),
                          (True, True)])
@pytest.mark.parametrize("culls", [False, True])
def test_fast_profile_matrix_every_shipped_variant(
        matrix_scene, far, use_skybox, use_proxy, culls):
    """Fast profile (+ the opt-in culls) vs the exact profile over the
    full shipped-variant matrix {skybox} x {proxy} x {near, far camera} x
    {culls off, dc+sat on}, with the 8/255 budget. Culled variants render
    three frames at the fixed camera so the saturation record engages
    (the motion gate passes a static camera) and compare the LAST."""
    ms = matrix_scene
    camera, dt = ms.camera_dt(far)
    ref = ms.exact_ref(far, use_skybox, use_proxy)
    r = ms._renderer(exact=False, dc=culls, sat=culls)
    n_frames = 3 if culls else 1
    for _ in range(n_frames):
        img = r.render(dt, camera, ms.sp, ms.rc,
                       use_skybox=use_skybox, use_proxy=use_proxy)
    d = np.abs(img - ref)
    assert (d > 8.0 / 255.0).mean() <= 0.005, (
        f"{(d > 8/255.).mean():.4%} of values deviate > 8/255 "
        f"(far={far} sky={use_skybox} proxy={use_proxy} culls={culls})"
    )
    assert d.mean() <= 1.0 / 255.0, f"mean dev {d.mean():.5f}"


def test_fast_and_exact_agree_structurally():
    """Fast and exact render the same splats — alpha coverage masks must
    agree except on quantization-thin fringes."""
    eng, ud, dt, camera = _scene(SurfaceType.HEIGHT_MAP)
    rc = RenderConfig.new(eng.n_tiles[0])
    sp = SceneParams.from_data(ud, eng.center_coord, rc)
    imgs = {}
    for exact in (True, False):
        r = Renderer(
            eng,
            RendererConfig(
                width=W, height=H, max_draws=128, max_stream=1 << 14,
                min_stream=1 << 12, chunk=128, exact=exact,
            ),
        )
        r.configure(ud)
        imgs[exact] = r.render(dt, camera, sp, rc)
    cov_e = imgs[True][..., 3] > 0.02
    cov_f = imgs[False][..., 3] > 0.02
    assert (cov_e != cov_f).mean() < 0.002
