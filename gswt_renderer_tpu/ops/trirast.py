"""Tile-binned triangle rasterizer with min-z (depth-write) semantics.

The reference's proxy pass draws a height-displaced grid mesh with depth
write + Less (proxy.rs:119-125); the splat pass then depth-tests against
it. This is the TPU-native triangle raster used for that displaced grid
(ops/proxy.py), built from the same pieces as the splat compositor:
bbox expansion + stable sort by image tile (ops/binning.py helpers) and a
worklist-driven Pallas kernel.

Per triangle everything the kernel needs is LINEAR in screen space: the
three barycentric coordinates, depth (GPUs interpolate the post-divide
clip z linearly in screen space), 1/w, and the perspective-corrected
attributes attr/w. So the per-pair table stores 8 plane equations x 3
coefficients = 24 rows, and the kernel evaluates each plane with one
(3,C)x(3,P) MXU matmul against [x; y; 1] pixel features — the triangle
analog of the splat kernel's monomial matmul.

Outputs per pixel: min depth + the winning triangle's (1/w, u/w, v/w,
extra/w); callers resolve perspective division and texture sampling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import build_worklist, expand_bboxes, grid_dims

N_PLANES = 8   # b0, b1, b2, z, 1/w, u/w, v/w, extra/w
N_ROWS = N_PLANES * 3


def triangle_planes(xs, ys, zs, ws, attrs, valid):
    """Per-triangle screen-space plane equations.

    xs, ys: [3, T] pixel coords; zs: [3, T] post-divide clip z; ws: [3, T]
    clip w; attrs: [A<=3, 3, T] per-vertex attributes (perspective-correct).
    Returns (planes [24, T] f32 rows grouped per plane (a, b, c), valid [T],
    bbox (x0f, x1f, y0f, y1f) float pixel bounds).
    Triangles with any vertex behind the near plane (w <= eps) are dropped
    (the GPU would clip them; ops/proxy.py's far-field fallback covers the
    resulting holes).
    """
    x0, x1t, x2 = xs[0], xs[1], xs[2]
    y0, y1t, y2 = ys[0], ys[1], ys[2]
    area2 = (x1t - x0) * (y2 - y0) - (x2 - x0) * (y1t - y0)
    eps_w = 1e-6
    ok = valid & (ws[0] > eps_w) & (ws[1] > eps_w) & (ws[2] > eps_w)
    ok &= jnp.abs(area2) > 1e-12
    inv_a = jnp.where(ok, 1.0 / jnp.where(area2 == 0, 1.0, area2), 0.0)

    def plane(f0, f1, f2):
        # linear interpolant f(x, y) = a x + b y + c through the 3 vertices
        a = (f0 * (y1t - y2) + f1 * (y2 - y0) + f2 * (y0 - y1t)) * inv_a
        b = (f0 * (x2 - x1t) + f1 * (x0 - x2) + f2 * (x1t - x0)) * inv_a
        c = (
            f0 * (x1t * y2 - x2 * y1t)
            + f1 * (x2 * y0 - x0 * y2)
            + f2 * (x0 * y1t - x1t * y0)
        ) * inv_a
        return a, b, c

    one = jnp.ones_like(x0)
    zero = jnp.zeros_like(x0)
    invw = jnp.where(ok, 1.0 / jnp.where(ws <= eps_w, 1.0, ws), 0.0)
    planes = []
    planes += plane(one, zero, zero)   # b0
    planes += plane(zero, one, zero)   # b1
    planes += plane(zero, zero, one)   # b2
    planes += plane(zs[0], zs[1], zs[2])
    planes += plane(invw[0], invw[1], invw[2])
    for k in range(3):
        if attrs is not None and k < attrs.shape[0]:
            f = attrs[k] * invw
            planes += plane(f[0], f[1], f[2])
        else:
            planes += (zero, zero, zero)
    stacked = jnp.stack(planes, axis=0)  # [24, T]
    bx0 = jnp.minimum(jnp.minimum(x0, x1t), x2)
    bx1 = jnp.maximum(jnp.maximum(x0, x1t), x2)
    by0 = jnp.minimum(jnp.minimum(y0, y1t), y2)
    by1 = jnp.maximum(jnp.maximum(y0, y1t), y2)
    return stacked, ok, (bx0, bx1, by0, by1)


def _tri_kernel(
    e_tf, e_chunk, r_start, r_end,
    table_ref, out_ref, z_ref, at_ref,
    *, tw, th, ntx, chunk,
):
    g = pl.program_id(0)
    tf = e_tf[g]
    tile = tf & 0xFFFFFF
    first = ((tf >> 24) & 1) == 1
    ty = tile // ntx
    tx = tile % ntx
    p_n = th * tw

    @pl.when(first)
    def _():
        z_ref[:] = jnp.ones_like(z_ref)  # far plane
        at_ref[:] = jnp.zeros_like(at_ref)

    @pl.when(r_start[tile] < r_end[tile])
    def _():
        _tri_body(
            e_chunk, r_start, r_end, table_ref, z_ref, at_ref, g, tile,
            tx, ty, tw=tw, th=th, chunk=chunk,
        )

    # `last` is also set on the final in-budget entry (build_worklist), so
    # a truncated tile writes its partial raster instead of leaving
    # uninitialized HBM
    last = ((tf >> 25) & 1) == 1

    @pl.when(last)
    def _():
        out_ref[0, 0:1, :] = z_ref[0:1, :].reshape(1, 1, p_n)[0]
        out_ref[0, 1:5, :] = at_ref[0:4, :].reshape(1, 4, p_n)[0]


def _tri_body(e_chunk, r_start, r_end, table_ref, z_ref, at_ref, g, tile,
              tx, ty, *, tw, th, chunk):
    p_n = th * tw
    table = table_ref[:]  # (24, C)
    i = jax.lax.broadcasted_iota(jnp.int32, (1, p_n), 1)
    px = (tx * tw + i % tw).astype(jnp.float32) + 0.5
    py = (ty * th + i // tw).astype(jnp.float32) + 0.5

    # plane evaluation as broadcast FMAs on the VPU: a dot_general with a
    # contraction depth of 3 pads to the MXU's 128 lanes (~40x wasted
    # slots — measured 29us/entry vs ~4us for this form)
    def ev(k):
        a = table[3 * k, :][:, None]      # (C, 1)
        b = table[3 * k + 1, :][:, None]
        c = table[3 * k + 2, :][:, None]
        return a * px + b * py + c        # (C, P)

    b0, b1 = ev(0), ev(1)
    b2 = 1.0 - b0 - b1  # barycentrics sum to 1 (plane coeffs are affine)
    slot = e_chunk[g] * chunk + jax.lax.broadcasted_iota(
        jnp.int32, (chunk, 1), 0
    )
    in_run = (slot >= r_start[tile]) & (slot < r_end[tile])
    inside = (b0 >= 0.0) & (b1 >= 0.0) & (b2 >= 0.0) & in_run
    z = ev(3)
    zk = jnp.where(inside & (z >= 0.0), z, 2.0)  # near-plane clip
    zmin = jnp.min(zk, axis=0, keepdims=True)  # (1, P)
    hit = zmin < 1.0
    # attributes of the winning triangle; z ties only happen for the
    # coincident values along shared edges, where averaging is exact
    wmask = (zk == zmin) & inside
    cnt = jnp.maximum(jnp.sum(wmask.astype(jnp.float32), axis=0, keepdims=True), 1.0)

    def pick(q):
        return jnp.sum(jnp.where(wmask, q, 0.0), axis=0, keepdims=True) / cnt

    upd = (zmin < z_ref[0:1, :]) & hit
    new_at = jnp.concatenate([pick(ev(4)), pick(ev(5)), pick(ev(6)), pick(ev(7))], axis=0)
    z_ref[0:1, :] = jnp.where(upd, zmin, z_ref[0:1, :])
    at_ref[0:4, :] = jnp.where(upd, new_at, at_ref[0:4, :])


def rasterize_triangles(planes, bbox, ok, *, image_wh, tile_wh,
                        max_pairs: int, chunk: int = 128,
                        interpret: bool = False):
    """Rasterize triangles with min-z. planes/ok from triangle_planes.

    Returns dict: tiles [n_tiles, 5, P] (rows: z, 1/w, u/w, v/w, extra/w),
    n_pairs, overflow. Reassemble per-pixel images with tiles_to_maps.
    """
    w_img, h_img = image_wh
    tw, th = tile_wh
    ntx, nty, n_tiles = grid_dims(image_wh, tile_wh)
    bx0, bx1, by0, by1 = bbox
    x0 = jnp.clip(jnp.floor(bx0 / tw).astype(jnp.int32), 0, ntx - 1)
    x1 = jnp.clip(jnp.floor(bx1 / tw).astype(jnp.int32), 0, ntx - 1)
    y0 = jnp.clip(jnp.floor(by0 / th).astype(jnp.int32), 0, nty - 1)
    y1 = jnp.clip(jnp.floor(by1 / th).astype(jnp.int32), 0, nty - 1)
    onscreen = (bx1 >= 0) & (bx0 < w_img) & (by1 >= 0) & (by0 < h_img)
    sorted_key, sorted_tri, total, overflow = expand_bboxes(
        x0, x1, y0, y1, ok & onscreen, ntx=ntx, n_tiles=n_tiles,
        max_pairs=max_pairs,
    )
    rows = planes[:, sorted_tri]  # [24, max_pairs]
    dead = sorted_key >= n_tiles
    # dead pairs: kill the inside test (b0 plane forced negative)
    rows = rows.at[2].set(jnp.where(dead, -1.0, rows[2]))
    rows = rows.at[0].set(jnp.where(dead, 0.0, rows[0]))
    rows = rows.at[1].set(jnp.where(dead, 0.0, rows[1]))
    wl = build_worklist(sorted_key, n_tiles=n_tiles, max_pairs=max_pairs,
                        chunk=chunk)

    p_n = th * tw
    ne = wl["entry_tf"].shape[0]
    kernel = functools.partial(_tri_kernel, tw=tw, th=th, ntx=ntx, chunk=chunk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(ne,),
        in_specs=[
            pl.BlockSpec(
                (N_ROWS, chunk),
                lambda g, etf, ec, rs, re: (0, ec[g]),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 5, p_n),
            lambda g, etf, ec, rs, re: (etf[g] & 0xFFFFFF, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((1, p_n), jnp.float32),
            pltpu.VMEM((4, p_n), jnp.float32),
        ],
    )
    tiles = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles, 5, p_n), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        wl["entry_tf"], wl["entry_chunk"], wl["range_start"], wl["range_end"],
        rows,
    )
    # tiles the worklist budget dropped entirely hold uninitialized HBM:
    # mask to far plane + zero attributes
    init = jnp.concatenate(
        [jnp.ones((1, p_n), jnp.float32), jnp.zeros((4, p_n), jnp.float32)],
        axis=0,
    )
    tiles = jnp.where(wl["tile_touched"][:, None, None], tiles, init[None])
    return dict(tiles=tiles, n_pairs=total,
                overflow=overflow | wl["wl_overflow"])


def tiles_to_maps(tiles, *, image_wh, tile_wh):
    """[n_tiles, 5, P] -> (z [H,W], attrs [4, H, W]) cropping grid padding."""
    w_img, h_img = image_wh
    tw, th = tile_wh
    ntx = -(-w_img // tw)
    nty = -(-h_img // th)
    m = tiles.reshape(nty, ntx, 5, th, tw)
    m = m.transpose(2, 0, 3, 1, 4).reshape(5, nty * th, ntx * tw)
    m = m[:, :h_img, :w_img]
    return m[0], m[1:5]


def rasterize_triangles_reference(planes_np, bbox_np, ok_np, *, image_wh):
    """NumPy per-pixel reference with identical semantics (for tests)."""
    import numpy as np

    w_img, h_img = image_wh
    planes = np.asarray(planes_np)
    ok = np.asarray(ok_np)
    z = np.ones((h_img, w_img), np.float32)
    at = np.zeros((4, h_img, w_img), np.float32)
    ys, xs = np.mgrid[0:h_img, 0:w_img]
    px = xs.astype(np.float32) + 0.5
    py = ys.astype(np.float32) + 0.5
    for t in range(planes.shape[1]):
        if not ok[t]:
            continue

        def ev(k):
            return planes[3 * k, t] * px + planes[3 * k + 1, t] * py + planes[3 * k + 2, t]

        # b2 derived as 1 - b0 - b1, matching the kernel
        inside = (ev(0) >= 0) & (ev(1) >= 0) & (1.0 - ev(0) - ev(1) >= 0)
        zt = ev(3)
        upd = inside & (zt < z) & (zt < 1.0) & (zt >= 0.0)
        z = np.where(upd, zt, z)
        for k in range(4):
            at[k] = np.where(upd, ev(4 + k), at[k])
    return z, at
