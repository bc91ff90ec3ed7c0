"""Skybox / proxy passes + viewer utilities."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from gswt_renderer_tpu.core import Camera
from gswt_renderer_tpu.core.camera import CameraUniforms
from gswt_renderer_tpu.ops.project import pack_tex4
from gswt_renderer_tpu.ops.proxy import render_proxy
from gswt_renderer_tpu.ops.skybox import pixel_rays, render_skybox
from gswt_renderer_tpu.render.pipeline import Renderer
from gswt_renderer_tpu.viewer.headless import write_png


def _cam_dict(cam):
    return Renderer.cam_dict(CameraUniforms(cam))


def test_pixel_rays_directions():
    cam = Camera((64, 64), (0, 0, 0), (0, 1, 0), (0, 0, 1),
                 np.deg2rad(90.0), 0.1, 100.0)
    rays = np.asarray(pixel_rays(_cam_dict(cam), (64, 64)))
    # center pixel looks along +y (the camera forward direction)
    c = rays[32, 32] / np.linalg.norm(rays[32, 32])
    assert np.allclose(c, [0, 1, 0], atol=0.05)
    # left edge of a 90deg fov bends ~45deg in x
    l = rays[32, 0] / np.linalg.norm(rays[32, 0])
    assert l[0] < -0.5


def test_skybox_equirect_tonemap_and_updown():
    # equirect: top half blue, bottom half green
    tex = np.zeros((64, 128, 3), np.float32)
    tex[:32] = [0.0, 0.0, 5.0]
    tex[32:] = [0.0, 5.0, 0.0]
    cam_up = Camera((32, 32), (0, 0, 0), (0, 0, 1), (0, 1, 0),
                    np.deg2rad(60.0), 0.1, 100.0)
    img = np.asarray(render_skybox(_cam_dict(cam_up), (32, 32), jnp.asarray(tex),
                                   equirect=True))
    # looking straight up (world +z) samples equirect 'up' (dir.y>0 after the
    # (x,-z,y) remap ... sample v>0.5 -> bottom half is +lat) — just check a
    # single dominant channel and tonemapping < 1
    assert img.shape == (32, 32, 4)
    dom = img[16, 16, :3]
    assert dom.max() > 0.5 and dom.max() < 1.0  # Reinhard+gamma applied
    assert np.isclose(img[..., 3].max(), 1.0)

    cam_down = Camera((32, 32), (0, 0, 0), (0, 0, -1), (0, 1, 0),
                      np.deg2rad(60.0), 0.1, 100.0)
    img2 = np.asarray(render_skybox(_cam_dict(cam_down), (32, 32),
                                    jnp.asarray(tex), equirect=True))
    # opposite vertical direction picks the other color band
    assert np.argmax(img[16, 16, :3]) != np.argmax(img2[16, 16, :3])


def test_skybox_cubemap_faces():
    faces = np.zeros((6, 8, 8, 3), np.float32)
    for i in range(6):
        faces[i, :, :, i % 3] = (i + 1) / 6.0
    cam = Camera((16, 16), (0, 0, 0), (1, 0, 0), (0, 0, 1),
                 np.deg2rad(60.0), 0.1, 100.0)
    img = np.asarray(render_skybox(_cam_dict(cam), (16, 16), jnp.asarray(faces),
                                   equirect=False))
    assert img.shape == (16, 16, 4)
    assert img[..., :3].max() > 0.05


def test_proxy_flat_plane_depth():
    """height_offset plane with no height map: ray/plane intersection."""
    scene = dict(
        map_half_wh=jnp.asarray([2, 2], jnp.int32),
        tile_width=jnp.float32(4.0),
        height_map_scale=jnp.asarray([1.0, 1.0, 0.0], jnp.float32),
        center_coord=jnp.asarray([0, 0], jnp.int32),
        sphere_radius=jnp.float32(0.0),
    )
    cam = Camera((32, 32), (0, 0, 5), (0, 10, 0), (0, 0, 1),
                 np.deg2rad(60.0), 0.1, 100.0)
    hm4 = jnp.zeros((4, 1), jnp.float32)
    from gswt_renderer_tpu.ops.proxy import pack_mip_atlas

    atlas, meta = pack_mip_atlas([np.ones((8, 8, 3), np.float32) * 0.5])
    proxy = dict(
        atlas=jnp.asarray(atlas),
        verts=jnp.zeros((2, 4), jnp.float32),
        tris=jnp.zeros((3, 2), jnp.int32),
    )
    color, depth, hit, _ = render_proxy(
        _cam_dict(cam), scene, (32, 32), hm4, (1, 1), proxy, (8, 8),
        surface_type=0, height_offset=0.0, brightness=1.0,
        black_background=False, use_clip=False, clip_height=0.0,
        mip_meta=meta, use_grid=False, interpret=True,
        n_steps=64, max_dist=200.0,
    )
    hit = np.asarray(hit)
    depth = np.asarray(depth)
    color = np.asarray(color)
    # lower half of the image (looking slightly down) hits the ground
    assert hit[24:, :].mean() > 0.9
    assert not hit[:3, :].any()  # sky region misses
    # nearer rows (bottom of image) have smaller depth
    assert depth[31, 16] < depth[20, 16]
    assert np.allclose(color[31, 16, :3], 0.5, atol=0.1)


def test_proxy_depth_occludes_splats():
    """The GS rasterizer depth-tests against the proxy depth (Less, no
    write): a splat behind the proxy surface must vanish."""
    from gswt_renderer_tpu.ops import raster

    # one chunk, one splat at z=0.9; proxy depth 0.5 at every pixel
    chunk = 128
    table = np.zeros((16, chunk), np.float32)
    table[0:3, 0] = 0.0  # k0..k2
    table[5, 0] = 0.0    # k5: exponent 0 everywhere -> full coverage
    table[6, 0] = 0.9    # z
    table[8, 0] = 1.0    # r
    table[11, 0] = 0.8   # alpha
    table[5, 1:] = -1e30
    binned = dict(
        table=jnp.asarray(table),
        entry_tf=jnp.asarray([0 | (1 << 24) | (1 << 25)], jnp.int32),
        entry_chunk=jnp.asarray([0], jnp.int32),
        range_start=jnp.asarray([0], jnp.int32),
        range_end=jnp.asarray([1], jnp.int32),
    )
    p_n = 32 * 128
    for d, expect_visible in ((1.0, True), (0.5, False)):
        depth_tiles = jnp.full((1, p_n), d, jnp.float32)
        out = raster.rasterize_pallas(
            binned, depth_tiles, image_wh=(128, 32), tile_wh=(128, 32),
            chunk=chunk, interpret=True,
        )
        alpha = float(np.asarray(out)[0, 3].max())
        assert (alpha > 0.5) == expect_visible


def test_raster_blocked_matches_per_entry_and_reference():
    """The S-entries-per-grid-step kernel (raster._raster_kernel_blocked)
    must be pixel-identical to the per-entry kernel and match the NumPy
    oracle: same math, different grid/DMA structure."""
    import sys as _sys

    _sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]))
    from gswt_renderer_tpu.ops import binning, raster
    from test_binning_buckets import _proj

    p = _proj(4096)
    # force a strictly PSD quadratic (|qb| < sqrt(qa*qc)) so exponents are
    # bounded above and g <= alpha <= 1 like real splats — non-PSD
    # synthetic forms explode exp() and amplify scan associativity noise
    qa, qb, qc = (np.asarray(x) for x in p["q"])
    qb = 0.5 * np.sqrt(qa * qc) * np.sign(qb)
    p["q"] = (jnp.asarray(qa), jnp.asarray(qb), jnp.asarray(qc))
    image_wh, tile_wh, chunk = (256, 128), (64, 32), 128
    b = binning.bin_pairs(
        p, image_wh=image_wh, tile_wh=tile_wh, max_pairs=1 << 13,
        chunk=chunk, exact=True, max_live=2048, live_buckets=(1024,))
    dom = b["table"].shape[1]
    ne = b["entry_tf"].shape[0]
    # build_worklist aligns ne to 16 so every blocked step size divides it
    assert dom % (4 * chunk) == 0 and ne % 16 == 0, (dom, ne)
    n_tiles = 4 * 4
    rng = np.random.default_rng(3)
    depth = jnp.asarray(
        rng.uniform(0.2, 1.0, (n_tiles, 32 * 64)).astype(np.float32))

    def run(step):
        return np.asarray(raster.rasterize_pallas(
            b, depth, image_wh=image_wh, tile_wh=tile_wh, chunk=chunk,
            interpret=True, exact=True, use_depth=True, step=step))

    out1 = run(1)
    out4 = run(4)
    np.testing.assert_array_equal(out4, out1)
    np.testing.assert_array_equal(run(16), out1)
    bn = {k: np.asarray(v) for k, v in b.items()}
    ref = raster.rasterize_reference(
        bn, np.asarray(depth), image_wh=image_wh, tile_wh=tile_wh,
        chunk=chunk)
    np.testing.assert_allclose(out4, ref, atol=2e-5)


def test_write_png_roundtrip(tmp_path):
    img = np.random.default_rng(0).uniform(0, 1, (16, 16, 3)).astype(np.float32)
    p = write_png(tmp_path / "x.png", img)
    data = open(p, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert len(data) > 100


def test_hdri_cubemap_bake_roundtrip(rng):
    """The 6-pass HDRI->cubemap bake (skybox.rs:341-455): sampling the baked
    cubemap must reproduce direct equirect sampling for arbitrary
    directions, up to the cubemap's own bilinear resample."""
    from gswt_renderer_tpu.ops.skybox import (
        _sample_cubemap,
        _sample_equirect,
        bake_hdri_to_cubemap,
    )

    # smooth HDR field so the resample tolerance is meaningful
    th = np.linspace(0, 2 * np.pi, 64, endpoint=False)
    ph = np.linspace(0, np.pi, 32)
    hdri = (
        1.5
        + np.sin(th)[None, :, None] * np.cos(2 * ph)[:, None, None]
        + 0.3 * np.cos(2 * th)[None, :, None]
    ).astype(np.float32) * np.array([1.0, 0.8, 0.6], np.float32)
    faces = bake_hdri_to_cubemap(hdri, resolution=128)
    assert faces.shape == (6, 128, 128, 3)
    d = rng.normal(size=(500, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    via_cube = np.asarray(_sample_cubemap(faces, jnp.asarray(d)))
    direct = np.asarray(_sample_equirect(jnp.asarray(hdri), jnp.asarray(d)))
    err = np.abs(via_cube - direct)
    assert np.quantile(err, 0.95) < 0.02, float(np.quantile(err, 0.95))
    assert err.mean() < 0.01


def test_factored_mip_pyramid_matches_atlas_sampler(rng):
    """The gather-free block-diagonal mip-pyramid sampler (fast profile)
    must match the per-pixel 2-gather trilinear atlas path at every level
    it keeps, including the coarsest-level clamp where l0 == l1 (whose row
    taps coincide and must not double-count)."""
    from gswt_renderer_tpu.io.textures import build_mip_chain
    from gswt_renderer_tpu.ops.proxy import pack_mip_atlas, sample_mip_trilinear
    from gswt_renderer_tpu.ops.texsample import (
        factored_mip_trilinear,
        pack_pyramid,
    )

    img = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    mips = build_mip_chain(img)
    atlas, meta = pack_mip_atlas(mips)
    planes, pmeta, l_min = pack_pyramid(mips)
    assert l_min == 0  # 64 <= 128: every level kept
    n = 600
    u = rng.uniform(-1.0, 3.0, size=n).astype(np.float32)
    v = rng.uniform(-1.0, 3.0, size=n).astype(np.float32)
    # footprints spanning below level 0 (clamp), each transition band,
    # and far beyond the coarsest level (the l0 == l1 clamp)
    rho = (2.0 ** rng.uniform(-2.0, len(mips) + 2.0, size=n)).astype(
        np.float32
    )
    exact = np.asarray(
        sample_mip_trilinear(jnp.asarray(atlas), meta, jnp.asarray(u),
                             jnp.asarray(v), jnp.asarray(rho))
    )
    fast = np.asarray(
        factored_mip_trilinear(jnp.asarray(planes), pmeta, l_min,
                               jnp.asarray(u), jnp.asarray(v),
                               jnp.asarray(rho), interpret=True)
    ).T
    err = np.abs(fast - exact)
    assert err.max() < 0.02, float(err.max())
    assert err.mean() < 0.004, float(err.mean())


def test_factored_mip_pyramid_l_min_clamp():
    """A 512-wide chain drops levels 0..1 (pyramid_l_min=2); sampling at
    rho <= 4 must clamp to the kept level-2 bilinear, not read garbage."""
    from gswt_renderer_tpu.ops.texsample import (
        factored_mip_trilinear,
        pack_pyramid,
        pyramid_l_min,
    )

    assert pyramid_l_min(512) == 2
    assert pyramid_l_min(256) == 1
    assert pyramid_l_min(128) == 0
    # constant-color chain: any level/any clamp must return the color
    mips = [np.full((512 >> l, 512 >> l, 3),
                    [0.25, 0.5, 0.75], np.float32) for l in range(10)]
    planes, pmeta, l_min = pack_pyramid(mips)
    assert l_min == 2 and len(pmeta) == 8
    u = jnp.asarray(np.linspace(0.0, 1.0, 64, dtype=np.float32))
    v = jnp.asarray(np.linspace(0.0, 1.0, 64, dtype=np.float32))
    for rho_v in (0.5, 4.0, 100.0, 1e5):
        out = np.asarray(
            factored_mip_trilinear(planes, pmeta, l_min, u, v,
                                   jnp.full((64,), rho_v, jnp.float32),
                                   interpret=True)
        )
        ref = np.array([0.25, 0.5, 0.75])
        q = np.round(ref * 255.0) / 255.0
        assert np.abs(out - q[:, None]).max() < 0.01, (rho_v, out[:, 0])


def test_scan_weight_impls_agree():
    """All GSWT_SCAN_IMPL variants (concat/roll/fold/diff) must produce the
    same compositing weights and carry as the NumPy cumprod reference.
    fold divides by t = 1-g clamped at 2^-10, so it is tested away from the
    alpha -> 1 edge (documented: the clamp only perturbs weights behind a
    fully opaque fragment)."""
    import jax
    import jax.numpy as jnp

    from gswt_renderer_tpu.ops import raster

    rng = np.random.default_rng(5)
    c, p = 64, 128
    for trial in range(3):
        g = rng.uniform(0.0, 0.95, (c, p)).astype(np.float32)
        g[rng.uniform(size=(c, p)) > 0.4] = 0.0  # sparse like real chunks
        carry = rng.uniform(0.2, 1.0, (1, p)).astype(np.float32)
        t = 1.0 - g
        t_incl = np.cumprod(t, axis=0) * carry
        t_excl = np.concatenate([carry, t_incl[:-1]], axis=0)
        w_ref = g * t_excl
        gj, cj = jnp.asarray(g), jnp.asarray(carry)
        impls = {
            "concat": lambda: raster._scan_weights_concat(gj, cj),
            "roll": lambda: raster._scan_weights_roll(gj, cj),
        }
        for name, f in impls.items():
            ti, te = jax.jit(f)()
            np.testing.assert_allclose(np.asarray(gj * te), w_ref,
                                       atol=1e-5, err_msg=name)
            np.testing.assert_allclose(np.asarray(ti)[-1:], t_incl[-1:],
                                       atol=1e-5, err_msg=name)
        for name, f in {
            "fold": lambda: raster._scan_weights_fold(gj, cj),
            "diff": lambda: raster._scan_weights_diff(gj, cj),
            "diffroll": lambda: raster._scan_weights_diffroll(gj, cj),
            "tree": lambda: raster._scan_weights_tree(gj, cj),
        }.items():
            w, tn = jax.jit(f)()
            np.testing.assert_allclose(np.asarray(w), w_ref, atol=1e-4,
                                       err_msg=name)
            np.testing.assert_allclose(np.asarray(tn), t_incl[-1:],
                                       atol=1e-5, err_msg=name)


def test_proxy_res_div_parity():
    """proxy_res_div=2 renders the proxy at half resolution and upsamples
    (depth/hit nearest, color bilinear): the composited frame must stay
    close to the full-res one — the proxy is the smooth distant-terrain
    background — and the depth-test interaction must stay sane (finite
    image, similar coverage)."""
    from gswt_renderer_tpu.core import UserData
    from gswt_renderer_tpu.core.config import SurfaceType
    from gswt_renderer_tpu.engine import Engine
    from gswt_renderer_tpu.io.synth import synthetic_scene_vec
    from gswt_renderer_tpu.render.pipeline import RendererConfig

    sv = synthetic_scene_vec(n_lod=2, splats_per_tile=48)
    sky = np.clip(
        np.linspace(0, 2, 16)[:, None, None] * np.ones((16, 32, 3), np.float32),
        0, 2)
    checker = np.kron(np.indices((8, 8)).sum(0) % 2,
                      np.ones((4, 4))).astype(np.float32)
    tex = np.stack([checker * 0.8 + 0.1, checker * 0.5 + 0.2,
                    checker * 0.3 + 0.1], axis=-1)
    imgs = {}
    for div in (1, 2):
        eng = Engine(
            sv, viewport=(96, 64),
            renderer_config=RendererConfig(
                width=96, height=64, max_draws=64, max_stream=1 << 13,
                min_stream=1 << 11, chunk=128, proxy_res_div=div,
                proxy_tile_w=32, proxy_tile_h=16,
            ),
            synchronous=True,
        )
        eng.set_skybox(sky, equirect=True)
        eng.set_proxy(tex)
        eng.configure(UserData.from_ui(
            tile_map_half_wh=(2, 2), height_map_scale=(1.0, 0.2),
            height_map_wh=(4, 4), lod_max_dist=8.0,
            surface_type=SurfaceType.HEIGHT_MAP,
        ))
        assert eng.wait_ready(timeout_s=300)
        eng.camera.translate(np.array([0.0, 1.0, 1.5], np.float32))
        imgs[div] = np.asarray(eng.frame())
        eng.shutdown()
    a, b = imgs[1], imgs[2]
    assert np.isfinite(b).all()
    # composited frames stay close: the half-res proxy differs only on
    # upsample fringes and div-px silhouette quantization
    assert np.abs(a - b).mean() < 0.02, np.abs(a - b).mean()
    cov_a = a[..., 3] > 0.02
    cov_b = b[..., 3] > 0.02
    assert (cov_a != cov_b).mean() < 0.05
