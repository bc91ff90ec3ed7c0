#!/usr/bin/env python
"""Microbenchmark raster-kernel variants at the 1080p headline scale.

Synthesizes a realistic binned table (uniform tile occupancy) and compares:
  A  current kernel (f32 HIGHEST both matmuls, global pixel monomials)
  B  mm1 HIGHEST, mm2 bf16-input
  C  tile-local recentered monomials: mm1 HIGH, mm2 bf16
  D  C with mm1 DEFAULT (bf16) -- accuracy reference only
Prints ms/frame and max |err| vs A.
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CUTOFF = -4.0
MIN_T = 0.5 / 255.0


def _pixel_features(tile_xy, tw, th, local):
    ty, tx = tile_xy
    p_n = th * tw
    i = jax.lax.broadcasted_iota(jnp.int32, (1, p_n), 1)
    if local:
        px = (i % tw).astype(jnp.float32) + 0.5
        py = (i // tw).astype(jnp.float32) + 0.5
    else:
        px = (tx * tw + i % tw).astype(jnp.float32) + 0.5
        py = (ty * th + i // tw).astype(jnp.float32) + 0.5
    one = jnp.ones_like(px)
    zero = jnp.zeros_like(px)
    return jnp.concatenate(
        [px * px, px * py, py * py, px, py, one, zero, zero], axis=0
    )


def _cumprod_inclusive(x):
    c = x.shape[0]
    shift = 1
    while shift < c:
        pad = jnp.ones((shift, x.shape[1]), x.dtype)
        x = x * jnp.concatenate([pad, x[:-shift]], axis=0)
        shift *= 2
    return x


def _kernel(e_tf, e_chunk, r_start, r_end, table_ref, depth_ref, out_ref,
            acc_ref, trans_ref, *, tw, th, ntx, chunk, local, prec1, bf2):
    g = pl.program_id(0)
    tf = e_tf[g]
    tile = tf & 0xFFFFFF
    first = ((tf >> 24) & 1) == 1
    last = ((tf >> 25) & 1) == 1
    ty = tile // ntx
    tx = tile % ntx
    p_n = th * tw

    @pl.when(first)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        trans_ref[:] = jnp.ones_like(trans_ref)

    t_carry = trans_ref[0:1, :]

    @pl.when((jnp.max(t_carry) >= MIN_T) & (r_start[tile] < r_end[tile]))
    def _():
        table = table_ref[:]
        ktab = table[0:8]
        rgb1 = jnp.concatenate(
            [table[8:11], jnp.ones((1, chunk), jnp.float32)], axis=0
        )
        z = table[6, :][:, None]
        alpha = table[11, :][:, None]
        feats = _pixel_features((ty, tx), tw, th, local)
        if prec1 == "split2":
            # 3 bf16 passes: (hi+lo)@(hi+lo) dropping lo@lo — ~f32-accurate
            k_hi = ktab.astype(jnp.bfloat16)
            k_lo = (ktab - k_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            f_hi = feats.astype(jnp.bfloat16)
            f_lo = (feats - f_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            dn = (((0,), (0,)), ((), ()))

            def bdot(x, y):
                return jax.lax.dot_general(
                    x, y, dimension_numbers=dn,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )

            expnt = bdot(k_hi, f_hi) + (bdot(k_hi, f_lo) + bdot(k_lo, f_hi))
        else:
            expnt = jax.lax.dot_general(
                ktab, feats, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec1,
            )
        depth = depth_ref[0]
        slot = e_chunk[g] * chunk + jax.lax.broadcasted_iota(
            jnp.int32, (chunk, 1), 0
        )
        in_run = (slot >= r_start[tile]) & (slot < r_end[tile])
        gmat = jnp.exp(expnt) * alpha
        mask = in_run & (expnt >= CUTOFF) & (z < depth)
        gmat = jnp.where(mask, gmat, 0.0)
        t_incl = _cumprod_inclusive(1.0 - gmat)
        t_excl = jnp.concatenate(
            [jnp.ones((1, p_n), jnp.float32), t_incl[:-1, :]], axis=0
        )
        weight = gmat * t_excl * t_carry
        if bf2:
            contrib = jax.lax.dot_general(
                rgb1.astype(jnp.bfloat16), weight.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
        else:
            contrib = jax.lax.dot_general(
                rgb1, weight, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        acc_ref[0:4, :] = acc_ref[0:4, :] + contrib
        trans_ref[0:1, :] = t_carry * t_incl[-1:, :]

    @pl.when(last)
    def _():
        out_ref[0, 0:4, :] = acc_ref[0:4, :].reshape(1, 4, p_n)[0]


def run_variant(binned, depth_tiles, *, image_wh, tile_wh, chunk, local,
                prec1, bf2, name, n=6, ref=None):
    w_img, h_img = image_wh
    tw, th = tile_wh
    ntx = -(-w_img // tw)
    nty = -(-h_img // th)
    n_tiles = ntx * nty
    p_n = th * tw
    ne = binned["entry_tf"].shape[0]
    n_rows = binned["table"].shape[0]
    kernel = functools.partial(
        _kernel, tw=tw, th=th, ntx=ntx, chunk=chunk, local=local,
        prec1=prec1, bf2=bf2,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(ne,),
        in_specs=[
            pl.BlockSpec((n_rows, chunk), lambda g, etf, ec, rs, re: (0, ec[g]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p_n),
                         lambda g, etf, ec, rs, re: (etf[g] & 0xFFFFFF, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 4, p_n), lambda g, etf, ec, rs, re: (etf[g] & 0xFFFFFF, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((4, p_n), jnp.float32),
            pltpu.VMEM((1, p_n), jnp.float32),
        ],
    )

    table = binned["table"]
    if local:
        # recenter the quadratic per pair to its tile origin:
        # e(x,y) = k0 x^2 + k1 xy + k2 y^2 + k3 x + k4 y + k5 at global
        # coords; with x = ox + u: coefficients in (u,v) local coords
        k0, k1, k2, k3, k4, k5 = (table[i] for i in range(6))
        tile_of = binned["pair_tile"]
        ox = (tile_of % ntx).astype(jnp.float32) * tw
        oy = (tile_of // ntx).astype(jnp.float32) * th
        k3l = 2.0 * k0 * ox + k1 * oy + k3
        k4l = k1 * ox + 2.0 * k2 * oy + k4
        k5l = k0 * ox * ox + k1 * ox * oy + k2 * oy * oy + k3 * ox + k4 * oy + k5
        table = jnp.concatenate(
            [table[0:3], k3l[None], k4l[None], k5l[None], table[6:]], axis=0
        )

    f = jax.jit(lambda tb: pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((n_tiles, 4, p_n), jnp.float32),
        grid_spec=grid_spec,
    )(binned["entry_tf"], binned["entry_chunk"], binned["range_start"],
      binned["range_end"], tb, depth_tiles))
    js = jax.jit(lambda tb: jnp.sum(f(tb)))
    out = jax.device_get(f(table))
    jax.device_get(js(table))
    ts = []
    for _ in range(n):
        t0 = time.time()
        jax.device_get(js(table))
        ts.append((time.time() - t0) * 1e3)
    err = np.abs(out - ref).max() if ref is not None else 0.0
    print(f"  {name:46s} {np.median(ts):7.1f} ms (incl ~25ms sync)"
          f"  maxerr={err:.2e}")
    return out


def make_binned(max_pairs, image_wh, tile_wh, chunk, seed=0):
    """Synthetic but statistically realistic binned inputs."""
    rng = np.random.default_rng(seed)
    w_img, h_img = image_wh
    tw, th = tile_wh
    ntx = -(-w_img // tw)
    nty = -(-h_img // th)
    n_tiles = ntx * nty
    n_pairs = int(max_pairs / 1.6)
    key = np.sort(rng.integers(0, n_tiles, n_pairs).astype(np.int32))
    key = np.concatenate([key, np.full(max_pairs - n_pairs, n_tiles, np.int32)])
    # per-pair gaussians: center inside the pair's tile (±1 tile), extents 2-16px
    tile_x = (key % ntx).astype(np.float32) * tw
    tile_y = (np.minimum(key, n_tiles - 1) // ntx).astype(np.float32) * th
    cx = tile_x + rng.uniform(-tw, 2 * tw, max_pairs)
    cy = tile_y + rng.uniform(-th, 2 * th, max_pairs)
    sx = rng.uniform(1.5, 12.0, max_pairs)
    sy = rng.uniform(1.5, 12.0, max_pairs)
    rho = rng.uniform(-0.7, 0.7, max_pairs)
    # conic of covariance [[sx^2, rho sx sy],[rho sx sy, sy^2]]
    det = (sx * sy) ** 2 * (1 - rho**2)
    a = 0.5 * sy * sy / det
    b = -0.5 * rho * sx * sy / det
    c_ = 0.5 * sx * sx / det
    # exponent = -(a dx^2 + 2b dxdy + c dy^2): expand into k-form
    k0 = -a
    k1 = -2 * b
    k2 = -c_
    k3 = 2 * a * cx + 2 * b * cy
    k4 = 2 * b * cx + 2 * c_ * cy
    k5 = -(a * cx * cx + 2 * b * cx * cy + c_ * cy * cy)
    dead = key >= n_tiles
    k5 = np.where(dead, -1e30, k5)
    z = rng.uniform(0.01, 0.99, max_pairs)
    col = rng.uniform(0, 1, (4, max_pairs))
    col[3] = np.where(dead, 0.0, col[3] * 0.8)
    # row 11 is ln(alpha) (the kernel folds the alpha multiply into the
    # exponent add) — raw alpha here would push the exponent positive and
    # g above 1, a state the real pipeline can never produce
    ln_a = np.log(np.maximum(col[3], 1e-30))
    table = np.zeros((16, max_pairs), np.float32)
    for i, v in enumerate([k0, k1, k2, k3, k4, k5, z, np.zeros(max_pairs),
                           col[0], col[1], col[2], ln_a]):
        table[i] = v

    from gswt_renderer_tpu.ops.binning import build_worklist
    wl = jax.jit(functools.partial(
        build_worklist, n_tiles=n_tiles, max_pairs=max_pairs, chunk=chunk
    ))(jnp.asarray(key))
    binned = {k: v for k, v in wl.items()}
    binned["table"] = jnp.asarray(table)
    binned["pair_tile"] = jnp.asarray(np.minimum(key, n_tiles - 1))
    return binned


def main():
    image_wh = (1920, 1080)
    chunk = 256
    P = jax.lax.Precision
    for tile_wh in [(64, 32)]:
        tw, th = tile_wh
        ntx = -(-image_wh[0] // tw)
        nty = -(-image_wh[1] // th)
        binned = make_binned(1 << 22, image_wh, tile_wh, chunk)
        depth = jnp.ones((ntx * nty, 1, tw * th), jnp.float32)
        print(f"tile {tw}x{th}, pairs {1<<22}")
        ref = run_variant(binned, depth, image_wh=image_wh, tile_wh=tile_wh,
                          chunk=chunk, local=False, prec1=P.HIGHEST, bf2=False,
                          name="A: global feats, HIGHEST/HIGHEST")
        run_variant(binned, depth, image_wh=image_wh, tile_wh=tile_wh,
                    chunk=chunk, local=False, prec1=P.HIGHEST, bf2=True,
                    name="B: global feats, HIGHEST/bf16", ref=ref)
        run_variant(binned, depth, image_wh=image_wh, tile_wh=tile_wh,
                    chunk=chunk, local=True, prec1="split2", bf2=True,
                    name="C: local feats, split2/bf16", ref=ref)
        run_variant(binned, depth, image_wh=image_wh, tile_wh=tile_wh,
                    chunk=chunk, local=True, prec1=P.HIGHEST, bf2=False,
                    name="C2: local feats, HIGHEST/HIGHEST", ref=ref)
        run_variant(binned, depth, image_wh=image_wh, tile_wh=tile_wh,
                    chunk=chunk, local=True, prec1=P.DEFAULT, bf2=True,
                    name="D: local feats, DEFAULT/bf16", ref=ref)


if __name__ == "__main__":
    main()
