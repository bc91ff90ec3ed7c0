"""Triangle rasterizer parity (ops/trirast.py): the tile-binned Pallas
min-z raster must match a per-pixel NumPy reference, and the rasterized
proxy map grid must agree with the analytic ray march on the same height
field away from silhouettes."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from gswt_renderer_tpu.ops.trirast import (
    rasterize_triangles,
    rasterize_triangles_reference,
    tiles_to_maps,
    triangle_planes,
)

W, H = 128, 96


def _random_tris(n, rng, z_lo=0.1, z_hi=0.9):
    xs = rng.uniform(-20, W + 20, (3, n)).astype(np.float32)
    ys = rng.uniform(-20, H + 20, (3, n)).astype(np.float32)
    zs = rng.uniform(z_lo, z_hi, (3, n)).astype(np.float32)
    ws = rng.uniform(0.5, 4.0, (3, n)).astype(np.float32)
    attrs = rng.uniform(-1, 1, (3, 3, n)).astype(np.float32)
    return xs, ys, zs, ws, attrs


def test_trirast_matches_reference(rng):
    xs, ys, zs, ws, attrs = _random_tris(40, rng)
    planes, ok, bbox = triangle_planes(
        jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(zs), jnp.asarray(ws),
        jnp.asarray(attrs), jnp.ones(40, bool),
    )
    out = rasterize_triangles(
        planes, bbox, ok, image_wh=(W, H), tile_wh=(64, 32),
        max_pairs=1 << 12, chunk=128, interpret=True,
    )
    assert not bool(out["overflow"])
    z, at = tiles_to_maps(out["tiles"], image_wh=(W, H), tile_wh=(64, 32))
    z_ref, at_ref = rasterize_triangles_reference(
        np.asarray(planes), bbox, np.asarray(ok), image_wh=(W, H)
    )
    zd = np.abs(np.asarray(z) - z_ref)
    # depth ties between overlapping random triangles resolve by averaging
    # in-kernel vs first-wins in the reference; exclude exact-tie pixels
    assert np.median(zd) < 1e-6
    assert (zd > 1e-5).mean() < 0.01
    match = zd <= 1e-5
    ad = np.abs(np.asarray(at) - at_ref)[:, match]
    assert ad.max() < 1e-3


def test_trirast_single_triangle_coverage():
    """A known triangle covers exactly its half-plane region with linearly
    interpolated depth."""
    xs = np.array([[10.0], [100.0], [10.0]], np.float32)
    ys = np.array([[10.0], [10.0], [80.0]], np.float32)
    zs = np.array([[0.2], [0.4], [0.6]], np.float32)
    ws = np.ones((3, 1), np.float32)
    attrs = np.zeros((3, 3, 1), np.float32)
    attrs[0, :, 0] = [1.0, 2.0, 3.0]  # attr u at the 3 verts
    planes, ok, bbox = triangle_planes(
        jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(zs), jnp.asarray(ws),
        jnp.asarray(attrs), jnp.ones(1, bool),
    )
    out = rasterize_triangles(
        planes, bbox, ok, image_wh=(W, H), tile_wh=(64, 32),
        max_pairs=256, chunk=128, interpret=True,
    )
    z, at = tiles_to_maps(out["tiles"], image_wh=(W, H), tile_wh=(64, 32))
    z = np.asarray(z)
    assert z[12, 12] < 1.0          # inside near the right-angle corner
    assert z[12, 105] == 1.0        # right of the hypotenuse end
    assert z[85, 12] == 1.0         # below the triangle
    # depth at the first vertex's corner is close to its z
    assert abs(z[11, 11] - 0.2) < 0.02
    # attr interpolation: near vertex 2 (10, 80) u -> 3
    u = np.asarray(at[1]) / np.where(np.asarray(at[0]) == 0, 1, np.asarray(at[0]))
    assert abs(u[78, 11] - 3.0) < 0.15


def test_trirast_behind_camera_dropped():
    xs, ys, zs, ws, attrs = _random_tris(8, np.random.default_rng(3))
    ws[:, :4] = -1.0  # behind the near plane
    planes, ok, bbox = triangle_planes(
        jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(zs), jnp.asarray(ws),
        jnp.asarray(attrs), jnp.ones(8, bool),
    )
    assert not np.asarray(ok)[:4].any()
    assert np.asarray(ok)[4:].all()


def test_proxy_grid_matches_march():
    """The rasterized map grid and the analytic march intersect the same
    height field: where both hit, depths must agree to the piecewise-linear
    error of the grid."""
    from gswt_renderer_tpu.core import Camera
    from gswt_renderer_tpu.ops.proxy import (
        march_height_field,
        raster_map_grid,
        make_map_grid,
    )
    from gswt_renderer_tpu.ops.project import pack_tex4
    from tests.test_passes import _cam_dict

    # constant field: the displaced grid is exactly planar, so raster and
    # march must agree to float tolerance (curvature error is zero)
    hm_up = np.full((128, 128), 0.4, np.float32)
    hm4 = jnp.asarray(pack_tex4(hm_up, 128, 128))
    scene = dict(
        map_half_wh=jnp.asarray([4, 4], jnp.int32),
        tile_width=jnp.float32(4.0),
        height_map_scale=jnp.asarray([1.0, 1.0, 1.5], jnp.float32),
        center_coord=jnp.asarray([0, 0], jnp.int32),
        sphere_radius=jnp.float32(0.0),
    )
    cam = Camera((W, H), (0, -10, 6), (0, 10, 0), (0, 0, 1),
                 np.deg2rad(60.0), 0.1, 200.0)
    verts, tris = make_map_grid((9, 9), (4, 4), 4.0)
    zg, ug, vg, mhg, hitg, npx, ovf = raster_map_grid(
        _cam_dict(cam), scene, (W, H), hm4, (128, 128),
        jnp.asarray(verts), jnp.asarray(tris),
        surface_type=1, height_offset=0.0, tile_wh=(64, 32), chunk=128,
        interpret=True,
    )
    zm, um, vm, mhm, hitm = march_height_field(
        _cam_dict(cam), scene, (W, H), hm4, (128, 128),
        surface_type=1, height_offset=0.0, n_steps=256, max_dist=100.0,
    )
    both = np.asarray(hitg) & np.asarray(hitm)
    assert both.mean() > 0.3, "camera should see the grid"
    zd = np.abs(np.asarray(zg) - np.asarray(zm))[both]
    assert np.quantile(zd, 0.95) < 1e-3, float(np.quantile(zd, 0.95))
    # tex coords agree too (march finds the same plane point)
    ud = np.abs(np.asarray(ug) - np.asarray(um))[both]
    assert np.quantile(ud, 0.95) < 5e-3, float(np.quantile(ud, 0.95))
    # the mapped height attr interpolates the constant exactly
    assert np.abs(np.asarray(mhg)[np.asarray(hitg)] - 0.6).max() < 1e-3
