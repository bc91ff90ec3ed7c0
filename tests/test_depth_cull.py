"""Proxy-depth occlusion cull (ops/binning.py occ_zimg + pipeline wiring).

The cull is the TPU stand-in for the early-z the reference gets free from
the GPU ROP: the proxy pass writes depth (proxy.rs:119-125) and the GS
pass tests `Less` without writing (renderer.rs:179-185), so fragments
behind the proxy terrain never blend. Here, pairs whose depth key z fails
`z < proxy depth` at EVERY pixel of their raster tile (z >= the tile's max
proxy depth) are removed from the binning worklist before they cost sort
lanes and raster passes — value-safe up to the blocked scan's
group-boundary re-association, exactly like the ellipse cull
(tests/test_binning_buckets.py::test_cull_exact_pixel_identical).
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from gswt_renderer_tpu.ops import binning, raster  # noqa: E402


def test_dilate_max2_window_semantics():
    rng = np.random.default_rng(0)
    z = rng.random((5, 7)).astype(np.float32)
    d = np.asarray(binning._dilate_max2(jnp.asarray(z)))
    for y in range(5):
        for x in range(7):
            want = z[y : min(y + 2, 5), x : min(x + 2, 7)].max()
            assert d[y, x] == want


def test_zmax_lookup_matches_take():
    rng = np.random.default_rng(1)
    nty, ntx = 9, 11
    zimg = rng.random((nty, ntx)).astype(np.float32)
    tx = rng.integers(0, ntx, 257).astype(np.int32)
    ty = rng.integers(0, nty, 257).astype(np.int32)
    got = np.asarray(
        binning._zmax_lookup(jnp.asarray(tx), jnp.asarray(ty),
                             jnp.asarray(zimg))
    )
    np.testing.assert_array_equal(got, zimg[ty, tx])
    # out-of-grid lanes (dead) match nothing -> 0.0
    got2 = np.asarray(
        binning._zmax_lookup(
            jnp.asarray(np.array([ntx, 0], np.int32)),
            jnp.asarray(np.array([0, nty], np.int32)), jnp.asarray(zimg))
    )
    np.testing.assert_array_equal(got2, [0.0, 0.0])


def _proj(n, seed=0, z=None):
    """Synthetic projection-output dict (mirrors test_binning_buckets)."""
    rng = np.random.default_rng(seed)
    cx = rng.uniform(-20, 276, n).astype(np.float32)
    cy = rng.uniform(-20, 148, n).astype(np.float32)
    ex = rng.uniform(1, 90, n).astype(np.float32)
    ey = rng.uniform(1, 60, n).astype(np.float32)
    qa = rng.uniform(0.01, 0.3, n).astype(np.float32)
    qc = rng.uniform(0.01, 0.3, n).astype(np.float32)
    qb = (0.5 * np.sqrt(qa * qc) * np.sign(rng.normal(size=n))).astype(
        np.float32)
    if z is None:
        z = rng.uniform(0.1, 0.9, n).astype(np.float32)
    col = [rng.random(n).astype(np.float32) for _ in range(4)]
    valid = rng.random(n) < 0.8
    return dict(
        cx=jnp.asarray(cx), cy=jnp.asarray(cy),
        ext_x=jnp.asarray(ex), ext_y=jnp.asarray(ey),
        q=(jnp.asarray(qa), jnp.asarray(qb), jnp.asarray(qc)),
        z=jnp.asarray(z), color=[jnp.asarray(c) for c in col],
        valid=jnp.asarray(valid),
    )


def _run(p, **kw):
    kw.setdefault("image_wh", (256, 128))
    kw.setdefault("tile_wh", (64, 32))
    kw.setdefault("max_pairs", 8192)
    kw.setdefault("chunk", 128)
    kw.setdefault("exact", True)
    kw.setdefault("elem_paths", 2)
    return binning.bin_pairs(p, **kw)


@pytest.mark.parametrize("exact", [True, False])
def test_depth_cull_pixel_identical(exact):
    """With a proxy depth image, bin_pairs(occ_zimg=...) must drop only
    pairs the kernel's per-pixel `z < depth` test would zero anyway: the
    rasterized image with the cull equals the one without it (up to scan
    regrouping, same contract as the ellipse cull), while the worklist
    shrinks."""
    n = 4096
    p = _proj(n, seed=3)
    image_wh, tile_wh, chunk = (256, 128), (64, 32), 128
    ntx, nty = 4, 4
    n_tiles = ntx * nty
    # a mid-scene depth image: left half far (1.0), right half near (0.3)
    # -> pairs with z >= 0.3 die in right-half tiles only
    zimg = np.full((nty, ntx), 1.0, np.float32)
    zimg[:, 2:] = 0.3
    depth_tiles = jnp.asarray(
        np.repeat(zimg.reshape(-1)[:, None], tile_wh[0] * tile_wh[1], 1)
    )
    base = _run(p, exact=exact)
    cull = _run(p, exact=exact, occ_zimg=jnp.asarray(zimg))
    assert int(cull["n_pairs"]) <= int(base["n_pairs"])  # splat-level cull
    kept_b = int(base["n_pairs_kept"])
    kept_c = int(cull["n_pairs_kept"])
    assert kept_c < kept_b  # real pair mass removed on this stream
    out_b = np.asarray(raster.rasterize_pallas(
        base, depth_tiles, image_wh=image_wh, tile_wh=tile_wh, chunk=chunk,
        interpret=True, exact=True, use_depth=True))
    out_c = np.asarray(raster.rasterize_pallas(
        cull, depth_tiles, image_wh=image_wh, tile_wh=tile_wh, chunk=chunk,
        interpret=True, exact=True, use_depth=True))
    np.testing.assert_allclose(out_c, out_b, atol=2e-5)


def test_depth_cull_quantized_z_agrees_with_kernel():
    """Fast profile: the pair table carries z quantized to u16 fixed
    point over [0,1], FLOORED (see ops/binning.py pack site), so the cull
    must test the QUANTIZED z. A splat whose f32 z sits just above the
    tile zmax but whose floored quantization lands below must NOT be
    culled (the kernel would draw it)."""
    zmax = np.float32(0.700030)  # between u16 grid points
    # f32 z slightly >= zmax, but floor-to-u16(z) < zmax
    z_f32 = np.float32(0.700035)
    z_q = np.float32(np.floor(z_f32 * 65535.0)) * np.float32(1.0 / 65535.0)
    assert z_f32 >= zmax and z_q < zmax
    n = 128
    p = _proj(n, seed=5, z=np.full(n, z_f32, np.float32))
    # center every splat inside tile (0, 0) with tiny extent
    p["cx"] = jnp.full((n,), 10.0); p["cy"] = jnp.full((n,), 10.0)
    p["ext_x"] = jnp.full((n,), 2.0); p["ext_y"] = jnp.full((n,), 2.0)
    zimg = np.full((4, 4), zmax, np.float32)
    out = _run(p, exact=False, occ_zimg=jnp.asarray(zimg))
    # the fast profile quantizes z to bf16 -> below zmax -> kept
    assert int(out["n_pairs_kept"]) > 0
    out_x = _run(p, exact=True, occ_zimg=jnp.asarray(zimg))
    # the exact profile carries f32 z -> z >= zmax -> culled
    assert int(out_x["n_pairs_kept"]) == 0


def test_depth_cull_engine_frame_parity():
    """End-to-end: a full-config (skybox+proxy) frame with the depth cull
    on equals the frame with it off (within the scan-regrouping budget),
    and the cull removes real pair mass behind the terrain."""
    from gswt_renderer_tpu.core import UserData
    from gswt_renderer_tpu.core.camera import Camera
    from gswt_renderer_tpu.core.config import (
        SelectiveMergeType, SurfaceType, TileSortType)
    from gswt_renderer_tpu.engine import Engine
    from gswt_renderer_tpu.io.synth import synthetic_scene_vec
    from gswt_renderer_tpu.render.pipeline import RendererConfig

    sv = synthetic_scene_vec(n_lod=2, splats_per_tile=48)
    sky = np.clip(
        np.linspace(0, 2, 16)[:, None, None]
        * np.ones((16, 32, 3), np.float32), 0, 2)
    checker = np.kron(np.indices((8, 8)).sum(0) % 2,
                      np.ones((4, 4))).astype(np.float32)
    tex = np.stack([checker * 0.8 + 0.1, checker * 0.5 + 0.2,
                    checker * 0.3 + 0.1], axis=-1)
    outs = {}
    for dc in (False, True):
        # the _small_engine scene (test_engine.py) with skybox + proxy on
        # a FLAT terrain: splats straddle the proxy plane, so a real
        # fraction of the pair mass is proxy-occluded at the default
        # camera while the frame still shows splats
        eng = Engine(
            sv, viewport=(64, 64),
            renderer_config=RendererConfig(
                width=64, height=64, max_draws=64, max_stream=1 << 13,
                min_stream=1 << 11, chunk=128, depth_cull=dc,
                # fine raster tiles: at the default 64x32 the 64x64 frame
                # has only 2 tiles and each contains background pixels
                # (depth = far), so no tile's max proxy depth can occlude
                # anything; 16x8 gives 32 tiles, the ground-covered ones
                # fully proxied
                tile_w=16, tile_h=8,
            ),
            synchronous=True,
        )
        eng.set_skybox(sky, equirect=True)
        eng.set_proxy(tex)
        eng.configure(UserData.from_ui(
            tile_map_half_wh=(2, 2), height_map_scale=(1.0, 0.0),
            lod_max_dist=8.0, surface_type=SurfaceType.NONE,
            merge_type=SelectiveMergeType.NONE,
            tile_sort_type=TileSortType.DISTANCE, lod_blending=False,
        ))
        assert eng.wait_ready(timeout_s=300)
        # raise the proxy surface INTO the splat band (synth splats sit at
        # z 0.2-0.6; default -0.5 is below everything) and pitch the
        # camera down from above: the proxy now fills the lower frame and
        # the ground rays hit it BEFORE the sub-0.5 splats behind it, so a
        # real fraction of the pair mass fails the kernel's z < depth test
        # (and the cull removes it) while nearer/taller splats stay
        # visible. The default horizontal camera at z=5 never even sees
        # the plane (its far edge at y=10 is below the 22.5deg half-fov).
        eng.render_config.proxy_height = 0.5
        eng.camera = Camera(
            (64, 64), position=(0.0, -6.0, 6.0), target=(0.0, 2.0, 0.0),
            up=(0.0, 0.0, 1.0), fovy_rad=np.deg2rad(45.0),
            z_near=0.1, z_far=2400.0,
        )
        outs[dc] = (np.asarray(eng.frame()),
                    dict(eng.renderer.last_aux))
        eng.shutdown()
    img_off, aux_off = outs[False]
    img_on, aux_on = outs[True]
    assert int(aux_off["n_pairs"]) > 0  # splats actually in frame
    assert np.isfinite(img_on).all()
    np.testing.assert_allclose(img_on, img_off, atol=1e-4)
    assert int(aux_on["n_pairs_kept"]) < int(aux_off["n_pairs_kept"])
