"""Multi-chip parity: camera-parallel (dp) and stream-parallel (sp) rendering
on the virtual 8-device CPU mesh must match single-device rendering exactly
(the over-operator is associative, so segment composition is exact up to
float addition order).

Design contract under test: parallel/batched.py:1-21.
"""

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
from gswt_renderer_tpu.parallel import (
    make_mesh,
    render_cameras_sharded,
    render_stream_sharded,
)
from gswt_renderer_tpu.parallel.batched import composite_over, pack_camera_batch
from gswt_renderer_tpu.render.pipeline import Renderer, RendererConfig
from gswt_renderer_tpu.render.uniforms import SceneParams
from gswt_renderer_tpu.tiles import WangTileEngine


@pytest.fixture(scope="module")
def scene():
    """A small height-map scene with Edge merging: merged + non-merged draws,
    so stream segment boundaries land inside draws."""
    # 200 splats/tile: blended draws take 2 stream blocks, filtered draws 1,
    # so shard boundaries land strictly inside some draw (mid-draw split)
    sv = synthetic_scene_vec(n_lod=2, splats_per_tile=200)
    eng = WangTileEngine(sv)
    ud = UserData.from_ui(
        tile_map_half_wh=(2, 2),
        height_map_scale=(1.0, 0.2),
        height_map_wh=(8, 8),
        lod_max_dist=8.0,
        surface_type=SurfaceType.HEIGHT_MAP,
        merge_type=SelectiveMergeType.EDGE,
        merge_dot_threshold=0.5,
        merge_topk=20,
        tile_sort_type=TileSortType.GRAPH,
        lod_blending=True,
    )
    eng.configure(ud)
    cam_pos = np.array([0.0, 0.0, 4.0], np.float32)
    eng.build_tiles(cam_pos)
    camera = Camera(
        (64, 64), cam_pos, (0.0, 8.0, 1.0), (0.0, 0.0, 1.0),
        np.deg2rad(45.0), 0.1, 200.0,
    )
    dt = eng.sort_tiles(cam_pos, camera.view_proj())
    r = Renderer(
        eng,
        RendererConfig(
            width=64, height=64, max_draws=128, max_stream=1 << 14,
            min_stream=1 << 11, chunk=128,
            # the sharded-vs-single contract is exact associativity of the
            # over-operator; test it without the fast profile's bf16/u8
            # quantization noise (which differs per segment split)
            exact=True,
        ),
    )
    r.configure(ud)
    rc = RenderConfig.new(eng.n_tiles[0])
    sp = SceneParams.from_data(ud, eng.center_coord, rc)
    staged = r.stage(dt)
    ref = r.render(None, camera, sp, rc, staged=staged, as_numpy=True)
    return dict(r=r, sp=sp, rc=rc, staged=staged, camera=camera, ref=ref,
                cam_pos=cam_pos)


def test_devices_available():
    assert len(jax.devices()) >= 8, "conftest must force an 8-device CPU mesh"


@pytest.mark.parametrize("shape", [(8, 1), (4, 2), (2, 4)])
def test_stream_parallel_matches_single_device(scene, shape):
    """The sharded stream composite is exact for every (dp, sp) factoring.
    Segment boundaries (s_pad/n_sp) are NOT aligned to draw boundaries —
    the device-side draw-id recovery must handle mid-draw starts."""
    mesh = make_mesh(shape)
    img = render_stream_sharded(
        scene["r"], scene["staged"], scene["sp"], scene["camera"], mesh,
        scene["rc"],
    )
    got = np.asarray(jax.device_get(img)).reshape(scene["ref"].shape)
    err = np.abs(got - scene["ref"]).max()
    assert err < 1e-3, f"mesh {shape}: stream-parallel max err {err}"


def test_stream_segments_cross_draw_boundaries(scene):
    """Sanity for the premise of the previous test: at sp=4 at least one
    shard boundary must fall strictly inside a draw (i.e. a draw's blocks
    span two shards)."""
    staged = scene["staged"]
    blocks = np.asarray(jax.device_get(staged["stream"]["blocks"]))
    nb = blocks.shape[1]
    draw_of = blocks[4] * (blocks[3] > 0)  # draw id, 0 for padding
    bounds = [nb // 4 * k for k in (1, 2, 3)]
    inside = [
        b for b in bounds
        if blocks[3][b] > 0 and draw_of[b - 1] == draw_of[b]
    ]
    assert inside, "all shard boundaries aligned to draws; test is vacuous"


@pytest.mark.parametrize("shape,cams_per_dev", [((8, 1), 1), ((4, 2), 2), ((2, 4), 3)])
def test_camera_parallel_matches_single_device(scene, shape, cams_per_dev):
    """Each sharded camera image must equal its single-device render,
    including uneven batches (cams_per_dev not a power of two)."""
    mesh = make_mesh(shape)
    dp = shape[0]
    b = dp * cams_per_dev
    cams = [
        Camera(
            (64, 64),
            np.array([0.3 * i - 0.5, 0.2 * i, 4.0 + 0.1 * i], np.float32),
            (0.3 * i - 0.5, 8.0, 1.0), (0.0, 0.0, 1.0),
            np.deg2rad(45.0), 0.1, 200.0,
        )
        for i in range(b)
    ]
    cam_batch = pack_camera_batch(scene["r"], scene["sp"], cams, scene["rc"])
    imgs = render_cameras_sharded(
        scene["r"], scene["staged"], scene["sp"], cam_batch, mesh, scene["rc"]
    )
    got = np.asarray(jax.device_get(imgs))
    assert got.shape[0] == b
    # check first, middle, last cameras against the single-device path
    for i in (0, b // 2, b - 1):
        ref = scene["r"].render(
            None, cams[i], scene["sp"], scene["rc"], staged=scene["staged"],
            as_numpy=True,
        )
        err = np.abs(got[i].reshape(ref.shape) - ref).max()
        assert err < 1e-3, f"camera {i}/{b} mesh {shape}: max err {err}"


def test_camera_batch_must_divide_dp(scene):
    mesh = make_mesh((8, 1))
    cams = [scene["camera"]] * 3  # 3 cameras over dp=8: not shardable
    cam_batch = pack_camera_batch(scene["r"], scene["sp"], cams, scene["rc"])
    with pytest.raises(Exception):
        np.asarray(
            render_cameras_sharded(
                scene["r"], scene["staged"], scene["sp"], cam_batch, mesh,
                scene["rc"],
            )
        )


def test_composite_over_associative(rng):
    """The stream-parallel design rests on associativity of the over
    operator for premultiplied (rgb, alpha) images."""
    a, b, c = (
        np.clip(rng.random((5, 5, 4)).astype(np.float32), 0.0, 1.0)
        for _ in range(3)
    )
    # premultiply-consistent alpha: keep alpha <= 1
    left = composite_over(composite_over(a, b), c)
    right = composite_over(a, composite_over(b, c))
    assert np.abs(np.asarray(left) - np.asarray(right)).max() < 1e-5


def test_composite_over_identity():
    """Fully transparent front/back are identities — the padding segments
    beyond the live stream must not alter the image."""
    img = np.random.default_rng(1).random((4, 4, 4)).astype(np.float32)
    zero = np.zeros_like(img)
    assert np.allclose(composite_over(zero, img), img)
    assert np.allclose(composite_over(img, zero), img)


@pytest.fixture(scope="module")
def scene_bg(scene):
    """The same scene with skybox + proxy textures uploaded and a
    single-device full-config reference (VERDICT r2 #2)."""
    r = scene["r"]
    sky = np.clip(np.linspace(0, 3, 16)[:, None, None]
                  * np.ones((16, 32, 3), np.float32), 0, 3)
    checker = np.kron(np.indices((8, 8)).sum(0) % 2,
                      np.ones((4, 4))).astype(np.float32)
    r.set_skybox(sky, equirect=True)
    r.set_proxy(np.stack([checker, checker * 0.5, checker * 0.2], axis=-1))
    ref = r.render(None, scene["camera"], scene["sp"], scene["rc"],
                   staged=scene["staged"], use_skybox=True, use_proxy=True,
                   as_numpy=True)
    assert ref[..., 3].min() > 0.99, "skybox must make the frame opaque"
    return dict(scene, ref_bg=ref)


@pytest.mark.parametrize("shape", [(8, 1), (4, 2), (2, 4)])
def test_stream_parallel_full_config(scene_bg, shape):
    """Sharded skybox+proxy rendering matches the single-device full frame:
    every shard depth-tests against the same proxy depth, and the
    background lands once after the segment fold."""
    mesh = make_mesh(shape)
    img = render_stream_sharded(
        scene_bg["r"], scene_bg["staged"], scene_bg["sp"],
        scene_bg["camera"], mesh, scene_bg["rc"],
        use_skybox=True, use_proxy=True,
    )
    got = np.asarray(jax.device_get(img)).reshape(scene_bg["ref_bg"].shape)
    err = np.abs(got - scene_bg["ref_bg"]).max()
    assert err < 1e-3, f"mesh {shape}: full-config sp max err {err}"


def test_camera_parallel_full_config(scene_bg):
    mesh = make_mesh((4, 2))
    cams = [
        Camera(
            (64, 64),
            np.array([0.3 * i - 0.5, 0.2 * i, 4.0 + 0.1 * i], np.float32),
            (0.3 * i - 0.5, 8.0, 1.0), (0.0, 0.0, 1.0),
            np.deg2rad(45.0), 0.1, 200.0,
        )
        for i in range(4)
    ]
    cam_batch = pack_camera_batch(scene_bg["r"], scene_bg["sp"], cams,
                                  scene_bg["rc"])
    imgs = render_cameras_sharded(
        scene_bg["r"], scene_bg["staged"], scene_bg["sp"], cam_batch, mesh,
        scene_bg["rc"], use_skybox=True, use_proxy=True,
    )
    got = np.asarray(jax.device_get(imgs))
    for i in (0, 3):
        ref = scene_bg["r"].render(
            None, cams[i], scene_bg["sp"], scene_bg["rc"],
            staged=scene_bg["staged"], use_skybox=True, use_proxy=True,
            as_numpy=True,
        )
        err = np.abs(got[i].reshape(ref.shape) - ref).max()
        assert err < 1e-3, f"camera {i} full-config dp: max err {err}"
