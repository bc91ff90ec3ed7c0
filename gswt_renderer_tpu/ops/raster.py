"""Ordered alpha-compositing rasterizer.

The wgpu reference blends premultiplied quads back-to-front through the ROP
(renderer.rs:118-129, gswt.wgsl:424-435). The TPU formulation walks each
image tile's splat run FRONT-to-back carrying per-pixel transmittance
T = prod(1 - g_j): the final color  sum_i c_i g_i T_i  is algebraically
identical to back-to-front ONE/ONE_MINUS_SRC_ALPHA blending.

The grid iterates a worklist of (tile, chunk) entries over the tile-sorted
pair table; a chunk is a fixed CHUNK-wide slice of the sorted table, and
range masks cut away pairs that belong to neighboring tiles at run
boundaries (no re-layout pass). Per chunk of C splats:

  expnt (C,P) = table[0:8] @ F(8,P)        -- one MXU matmul; F = per-pixel
                                              monomials [x^2,xy,y^2,x,y,1,0,0]
  g = exp(expnt + ln(alpha)), masked by the exp(-4) cutoff (on the raw
      quadratic) and the depth test (compiled out when there is no proxy
      depth) -- ln(alpha) is row 11 of the pair table, so both the alpha
      multiply and the range mask fold into the exponent add
  T_incl = inclusive cumprod over [T_carry*(1-g_0), 1-g_1, ...], a blocked
      two-level scan on the VPU (groups of 32, on-chip-swept: ~6 passes vs 8 for
      flat Hillis-Steele); seeding the scan with T_carry makes the weight a
      single multiply
  acc(4,P) += rgb1(4,C) @ (g * T_excl)     -- second MXU matmul
  T_carry = T_incl[-1]

with per-tile accumulators in VMEM, chunks of one tile consecutive, and
whole-chunk early exit once the tile is saturated.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CUTOFF = -4.0  # fragment discard threshold (gswt.wgsl:427-430)
MIN_T = 0.5 / 255.0  # early-exit transmittance (below ROP quantization)
# scan implementation A/B toggle (benchmarks/micro_scan_ab.py):
#   concat — Hillis-Steele passes shift via materializing jnp.concatenate
#   roll   — pltpu.roll sublane rotations + iota masks; the carry seed and
#            the exclusive shift fold into rolls / the tiny group level
#   fold   — t_excl recovered as t_incl / t (clamped), no shift passes
#   diff   — weight = T_excl - T_incl exactly; saves the seed concat and
#            the weight multiply. On-chip A/B at 17k entries (fast
#            profile): diff 57.5 ms, roll 62.1, concat 63.3, fold 70.5
#   diffroll — diff's weight identity + roll's pltpu.roll shifts; the two
#            wins composed. Same-session A/B: diffroll 60.9 vs diff 62.1
#            ms — the default
_SCAN_IMPL = os.environ.get("GSWT_SCAN_IMPL", "diffroll")
# saturation-SLOT record: per tile, the stream slot beyond which nothing
# can contribute because the tile was already opaque. SAT_NOCUT (> any
# stream slot; slots are exact in f32 to 2^24) marks "no cut"; +0.5 makes
# `slot >= cut` strictly `slot > last composited slot` (slots integral)
SAT_NOCUT = float(1 << 25)
_SCUT_BUMP = 0.5
SAT_BANDS = 4  # per-tile horizontal bands in the saturation record


def _sat_update(rec, t_start, smax):
    """Per-PIXEL saturation-slot record update for one composited entry:
    a pixel raises its record to the entry's max composited slot if it
    was still visible (T >= MIN_T) at the entry's START — the crossing
    entry's own pairs contributed visibly and must stay inside the cut —
    and freezes once saturated. Pairs beyond the final record land in
    entries that BEGAN with the pixel saturated, so their per-pixel
    contribution is < MIN_T. (1,P) passes: ~1% of the entry cost."""
    return jnp.where(t_start >= MIN_T, jnp.maximum(rec, smax), rec)


def _sat_flush(rec, trans, th, tw):
    """Finalize the per-pixel record into SAT_BANDS per-band cuts
    (broadcast over P, rows 4..4+SAT_BANDS-1 of the output block): band
    cut = max over the band's pixels of (saturated ? record + bump :
    SAT_NOCUT) — one unsaturated pixel makes its band uncuttable."""
    p_n = th * tw
    px = jax.lax.broadcasted_iota(jnp.int32, (1, p_n), 1)
    # flat p = y*tw + x; clip covers th % SAT_BANDS != 0 (the remainder
    # rows fold into the LAST band instead of an out-of-range band that
    # no band max would see — which would record a cut while those rows
    # were unsaturated, an unsound cull)
    band = jnp.minimum(px // (max(th // SAT_BANDS, 1) * tw), SAT_BANDS - 1)
    cut_p = jnp.where(trans < MIN_T, rec + _SCUT_BUMP, SAT_NOCUT)
    rows = [
        jnp.max(jnp.where(band == b, cut_p, -1.0)) + jnp.zeros((1, p_n))
        for b in range(SAT_BANDS)
    ]
    return jnp.concatenate(rows, axis=0)  # (SAT_BANDS, P)


def _pixel_features(tw, th):
    """F matrix (8, th*tw): monomials of TILE-LOCAL pixel-center coordinates
    for the exponent matmul (the table's k rows are recentered per pair to
    its tile origin by ops/binning.py build_pair_table, so the same F serves
    every tile). Built flat (pixel p = y*tw + x, matching tiles_to_image's
    layout) — a (th, tw)->(P,) reshape is an unsupported Mosaic shape cast
    when tw < 128."""
    p_n = th * tw
    i = jax.lax.broadcasted_iota(jnp.int32, (1, p_n), 1)
    px = (i % tw).astype(jnp.float32) + 0.5
    py = (i // tw).astype(jnp.float32) + 0.5
    one = jnp.ones_like(px)
    zero = jnp.zeros_like(px)
    return jnp.concatenate(
        [px * px, px * py, py * py, px, py, one, zero, zero], axis=0
    )


def _cumprod_inclusive(x, group: int = 32):
    """Inclusive cumulative product along axis 0 (Pallas TPU has no native
    cumprod lowering). Blocked two-level scan: Hillis-Steele within groups
    of `group` rows (32 won the on-chip sweep: 109.8 ms/frame vs 111.8 at
    16, 120.6 at 8), a tiny scan over the per-group totals, one broadcast
    apply — ~log2(group)+1 full-size passes instead of log2(c)."""
    c, p = x.shape
    if c % group or c <= group:
        shift = 1
        while shift < c:
            pad = jnp.ones((shift, p), x.dtype)
            x = x * jnp.concatenate([pad, x[:-shift]], axis=0)
            shift *= 2
        return x
    ng = c // group
    y = x.reshape(ng, group, p)
    shift = 1
    while shift < group:
        pad = jnp.ones((ng, shift, p), x.dtype)
        y = y * jnp.concatenate([pad, y[:, :-shift]], axis=1)
        shift *= 2
    # inclusive per-group totals (ng, p); static slice + reshape (an int
    # index lowers to an unsupported dynamic_slice in Mosaic)
    gp = jax.lax.slice(y, (0, group - 1, 0), (ng, group, p)).reshape(ng, p)
    shift = 1
    while shift < ng:
        pad = jnp.ones((shift, p), x.dtype)
        gp = gp * jnp.concatenate([pad, gp[:-shift]], axis=0)
        shift *= 2
    excl = jnp.concatenate([jnp.ones((1, p), x.dtype), gp[:-1]], axis=0)
    return (y * excl[:, None, :]).reshape(c, p)


def _scan_weights_concat(gmat, t_carry):
    """(t_incl, t_excl) of the carry-seeded transmittance scan, concat
    form: seed and exclusive shift are materializing concatenates."""
    t = 1.0 - gmat
    t = jnp.concatenate([t[0:1, :] * t_carry, t[1:, :]], axis=0)
    t_incl = _cumprod_inclusive(t)
    t_excl = jnp.concatenate([t_carry, t_incl[:-1, :]], axis=0)
    return t_incl, t_excl


def _scan_weights_roll(gmat, t_carry, group: int = 32):
    """Same contract as _scan_weights_concat, but every full-size shift is
    a pltpu.roll sublane rotation + iota mask (no materializing concat),
    and the carry seed folds into the TINY (ng, P) group-totals level
    instead of a full-size pass."""
    c, p = gmat.shape
    t = 1.0 - gmat
    if c % group or c <= group:
        rows = jax.lax.broadcasted_iota(jnp.int32, (c, p), 0)
        shift = 1
        while shift < c:
            r = pltpu.roll(t, shift, axis=0)
            t = t * jnp.where(rows >= shift, r, 1.0)
            shift *= 2
        t_incl = t * t_carry  # seed: T_i = carry * prod_{j<=i} t_j
        t_excl = pltpu.roll(t_incl, 1, axis=0)
        t_excl = jnp.where(rows == 0, t_carry, t_excl)
        return t_incl, t_excl
    ng = c // group
    rows = jax.lax.broadcasted_iota(jnp.int32, (c, p), 0)
    rg = rows & (group - 1)
    shift = 1
    while shift < group:
        r = pltpu.roll(t, shift, axis=0)
        t = t * jnp.where(rg >= shift, r, 1.0)
        shift *= 2
    y = t.reshape(ng, group, p)
    # inclusive per-group totals (ng, p), then the carry-seeded exclusive
    # group prefix — all at 1/group size
    gp = jax.lax.slice(y, (0, group - 1, 0), (ng, group, p)).reshape(ng, p)
    shift = 1
    while shift < ng:
        pad = jnp.ones((shift, p), gp.dtype)
        gp = gp * jnp.concatenate([pad, gp[:-shift]], axis=0)
        shift *= 2
    excl_g = jnp.concatenate([t_carry, gp[:-1] * t_carry], axis=0)
    t_incl = (y * excl_g[:, None, :]).reshape(c, p)
    t_excl = pltpu.roll(t_incl, 1, axis=0)
    t_excl = jnp.where(rows == 0, t_carry, t_excl)
    return t_incl, t_excl


def _scan_weights_fold(gmat, t_carry, group: int = 32):
    """Returns (weight, t_next) directly, skipping BOTH materializing
    shifts of the concat form: the carry seed folds into the tiny (ng, P)
    group level, and t_excl is recovered as t_incl / t (division by the
    SAME factor that produced t_incl — no cancellation; t clamped at
    2^-10 for the alpha == 1.0 edge, which only perturbs weights behind a
    fully opaque fragment, below the fast profile's ROP budget)."""
    c, p = gmat.shape
    t = jnp.maximum(1.0 - gmat, jnp.float32(1.0 / 1024.0))
    if c % group or c <= group:
        y = t
        shift = 1
        while shift < c:
            pad = jnp.ones((shift, p), y.dtype)
            y = y * jnp.concatenate([pad, y[:-shift]], axis=0)
            shift *= 2
        t_incl = y * t_carry
        weight = gmat * t_incl / t
        return weight, t_incl[-1:, :]
    ng = c // group
    y = t.reshape(ng, group, p)
    shift = 1
    while shift < group:
        pad = jnp.ones((ng, shift, p), y.dtype)
        y = y * jnp.concatenate([pad, y[:, :-shift]], axis=1)
        shift *= 2
    gp = jax.lax.slice(y, (0, group - 1, 0), (ng, group, p)).reshape(ng, p)
    shift = 1
    while shift < ng:
        pad = jnp.ones((shift, p), gp.dtype)
        gp = gp * jnp.concatenate([pad, gp[:-shift]], axis=0)
        shift *= 2
    excl_g = jnp.concatenate([t_carry, gp[:-1] * t_carry], axis=0)
    t_incl = (y * excl_g[:, None, :]).reshape(c, p)
    weight = gmat * t_incl / t
    return weight, jax.lax.slice(t_incl, (c - 1, 0), (c, p))


def _scan_weights_diff(gmat, t_carry, group: int = 32):
    """(weight, t_next) via the difference identity: weight_i =
    g_i * T_excl,i = T_excl,i - T_incl,i exactly (T_incl = T_excl * (1 -
    g)). Saves the seed concat (carry folds into the tiny group level)
    and replaces the weight multiply with the subtract — one fewer
    full-size pass than the concat form, no division."""
    c, p = gmat.shape
    t = 1.0 - gmat
    if c % group or c <= group:
        y = t
        shift = 1
        while shift < c:
            pad = jnp.ones((shift, p), y.dtype)
            y = y * jnp.concatenate([pad, y[:-shift]], axis=0)
            shift *= 2
        t_incl = y * t_carry
    else:
        ng = c // group
        y = t.reshape(ng, group, p)
        shift = 1
        while shift < group:
            pad = jnp.ones((ng, shift, p), y.dtype)
            y = y * jnp.concatenate([pad, y[:, :-shift]], axis=1)
            shift *= 2
        gp = jax.lax.slice(y, (0, group - 1, 0), (ng, group, p)).reshape(ng, p)
        shift = 1
        while shift < ng:
            pad = jnp.ones((shift, p), gp.dtype)
            gp = gp * jnp.concatenate([pad, gp[:-shift]], axis=0)
            shift *= 2
        excl_g = jnp.concatenate([t_carry, gp[:-1] * t_carry], axis=0)
        t_incl = (y * excl_g[:, None, :]).reshape(c, p)
    t_excl = jnp.concatenate([t_carry, t_incl[:-1, :]], axis=0)
    return t_excl - t_incl, jax.lax.slice(t_incl, (c - 1, 0), (c, p))


def _scan_weights_diffroll(gmat, t_carry, group: int = 32):
    """diff's weight identity (weight = T_excl - T_incl, no seed concat,
    no weight multiply) with roll's shift form (pltpu.roll sublane
    rotations instead of materializing concatenates) — the two
    individually-measured wins composed.

    Rounding bound: T_excl and T_incl come from DIFFERENT f32 association
    chains at group-boundary rows (T_excl is the rolled previous-row
    inclusive product, T_incl the group-seeded one), so the difference can
    go ~1-ulp negative (~1e-7) where roll's g*T_excl form was >= 0 by
    construction. Negligible against the fast profile's 8/255 budget and
    not clamped (a jnp.maximum would add a full (C,P) VPU pass)."""
    c, p = gmat.shape
    t = 1.0 - gmat
    rows = jax.lax.broadcasted_iota(jnp.int32, (c, p), 0)
    if c % group or c <= group:
        shift = 1
        while shift < c:
            r = pltpu.roll(t, shift, axis=0)
            t = t * jnp.where(rows >= shift, r, 1.0)
            shift *= 2
        t_incl = t * t_carry
    else:
        ng = c // group
        rg = rows & (group - 1)
        shift = 1
        while shift < group:
            r = pltpu.roll(t, shift, axis=0)
            t = t * jnp.where(rg >= shift, r, 1.0)
            shift *= 2
        y = t.reshape(ng, group, p)
        gp = jax.lax.slice(y, (0, group - 1, 0), (ng, group, p)).reshape(ng, p)
        shift = 1
        while shift < ng:
            pad = jnp.ones((shift, p), gp.dtype)
            gp = gp * jnp.concatenate([pad, gp[:-shift]], axis=0)
            shift *= 2
        excl_g = jnp.concatenate([t_carry, gp[:-1] * t_carry], axis=0)
        t_incl = (y * excl_g[:, None, :]).reshape(c, p)
    t_excl = pltpu.roll(t_incl, 1, axis=0)
    t_excl = jnp.where(rows == 0, t_carry, t_excl)
    return t_excl - t_incl, jax.lax.slice(t_incl, (c - 1, 0), (c, p))


def _tree_cumprod(t, t_carry):
    """Carry-seeded inclusive cumprod via a work-efficient contraction
    tree (Blelloch in multiplicative form). Hillis-Steele touches the
    FULL (C,P) array log2(C) times (each step: shift + mask + multiply at
    8G lanes/frame); the contraction tree halves the operand at every
    level — up-sweep total work = C-1 multiplies ~= ONE full-size pass,
    down-sweep ~= 3 (shift-concat, multiply, interleave) — so the whole
    scan is ~4-6 full-pass equivalents instead of ~15. Requires C a power
    of two (chunk is); levels below 8 sublanes pad to (8,128) tiles but
    are tiny. Returns t_incl (C,P) = t_carry * prod_{j<=i} t[j]."""
    c, p = t.shape

    def rec(y, seed):
        k = y.shape[0]
        if k == 1:
            return y * seed
        a = jax.lax.slice(y.reshape(k // 2, 2, p), (0, 0, 0),
                          (k // 2, 1, p)).reshape(k // 2, p)
        b = jax.lax.slice(y.reshape(k // 2, 2, p), (0, 1, 0),
                          (k // 2, 2, p)).reshape(k // 2, p)
        s = rec(a * b, seed)  # (k/2, P) inclusive over pairs, seeded
        if k == 2:  # s[:-1] would be a zero-size slice (Mosaic rejects it)
            even = seed * a
        else:
            s_hi = jax.lax.slice(s, (0, 0), (k // 2 - 1, p))
            even = jnp.concatenate([seed, s_hi], axis=0) * a
        return jnp.stack([even, s], axis=1).reshape(k, p)

    return rec(t, t_carry)


def _scan_weights_tree(gmat, t_carry):
    """diff's weight identity (weight = T_excl - T_incl) on the
    contraction-tree cumprod. Falls back to diffroll when the chunk is
    not a power of two."""
    c, p = gmat.shape
    if c & (c - 1):
        return _scan_weights_diffroll(gmat, t_carry)
    t_incl = _tree_cumprod(1.0 - gmat, t_carry)
    rows = jax.lax.broadcasted_iota(jnp.int32, (c, p), 0)
    t_excl = pltpu.roll(t_incl, 1, axis=0)
    t_excl = jnp.where(rows == 0, t_carry, t_excl)
    return t_excl - t_incl, jax.lax.slice(t_incl, (c - 1, 0), (c, p))


def _scan_weights(gmat, t_carry):
    """(weight, t_next) for the carry-seeded transmittance compositor."""
    if _SCAN_IMPL == "roll":
        t_incl, t_excl = _scan_weights_roll(gmat, t_carry)
    elif _SCAN_IMPL == "fold":
        return _scan_weights_fold(gmat, t_carry)
    elif _SCAN_IMPL == "diff":
        return _scan_weights_diff(gmat, t_carry)
    elif _SCAN_IMPL == "diffroll":
        return _scan_weights_diffroll(gmat, t_carry)
    elif _SCAN_IMPL == "tree":
        return _scan_weights_tree(gmat, t_carry)
    else:
        t_incl, t_excl = _scan_weights_concat(gmat, t_carry)
    return gmat * t_excl, t_incl[-1:, :]


def _entry_body(table, depth_row, tile, ec, t_carry, r_start, r_end,
                *, tw, th, chunk, exact, use_depth):
    """One (tile, chunk) worklist entry: exponent matmul, masks, scan,
    color matmul. Returns (contrib (4,P), t_next (1,P), smax scalar — the
    max STREAM SLOT (table row 12) over the entry's in-run lanes, for the
    saturation-slot record). Shared by the per-entry and the blocked
    (S entries/grid-step) kernels."""
    ktab = table[0:8]
    rgb1 = jnp.concatenate(
        [table[8:11], jnp.ones((1, chunk), jnp.float32)], axis=0
    )
    z = table[6, :][:, None]  # (C,1)
    ln_alpha = table[11, :][:, None]  # (C,1)
    feats = _pixel_features(tw, th)  # (8, P) tile-local monomials
    dn = (((0,), (0,)), ((), ()))
    if exact:
        expnt = jax.lax.dot_general(
            ktab, feats, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (C, P)
    else:
        # recentered operands are small (<= tile^2), so a bf16 hi/lo
        # split holds the exponent to ~1e-3 absolute. All four cross
        # products fold into ONE matmul by tiling the halves along the
        # contraction dim — [k_hi;k_hi;k_lo;k_lo] @ [f_hi;f_lo;f_hi;
        # f_lo] = hi@hi + hi@lo + lo@hi + lo@lo at K=32 — the MXU pads
        # any K<128 to the full array, so this costs the same as one
        # K=8 pass, replaces the old 3-matmul + 2-f32-add form (each
        # (C,P) add pass is ~5 ms at 11k worklist entries), and keeps
        # the lo@lo term for free.
        k_hi = ktab.astype(jnp.bfloat16)
        k_lo = (ktab - k_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        f_hi = feats.astype(jnp.bfloat16)
        f_lo = (feats - f_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        expnt = jax.lax.dot_general(
            jnp.concatenate([k_hi, k_hi, k_lo, k_lo], axis=0),
            jnp.concatenate([f_hi, f_lo, f_hi, f_lo], axis=0),
            dimension_numbers=dn,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
    # range mask folds into the per-splat exponent shift: masked lanes
    # get ln(alpha) = -inf so exp() zeroes them with no extra pass
    slot = ec * chunk + jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
    in_run = (slot >= r_start[tile]) & (slot < r_end[tile])
    ln_eff = jnp.where(in_run, ln_alpha, -jnp.inf)  # (C,1)
    shifted = expnt + ln_eff
    # the exp(-4) discard (gswt.wgsl:427-430) tests the raw quadratic
    mask = expnt >= CUTOFF
    if use_depth:
        mask = mask & (z < depth_row)
    gmat = jnp.where(mask, jnp.exp(shifted), 0.0)
    # carry-seeded transmittance scan -> per-fragment compositing
    # weights g_i * T_excl,i and the next chunk's carry T_incl[-1]
    # (impl selected by GSWT_SCAN_IMPL, see _scan_weights)
    weight, t_next = _scan_weights(gmat, t_carry)  # (C,P), (1,P)
    if exact:
        contrib = jax.lax.dot_general(
            rgb1, weight,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    else:
        # weights/colors are in [0,1] and the ROP itself quantizes to
        # 8 bits; one bf16 pass is under that budget (PARITY.md #8)
        contrib = jax.lax.dot_general(
            rgb1.astype(jnp.bfloat16), weight.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
    # max in-run STREAM SLOT of this composited entry: every pair the
    # kernel composites for a tile has slot <= the running max of these,
    # so pairs strictly beyond it can only land in entries the saturation
    # early exit skips (in-run masked/cutoff lanes only RAISE the max —
    # safe; tile runs are slot-ascending, so this is the last composited
    # pair's slot)
    smax = jnp.max(jnp.where(in_run, table[12, :][:, None], -1.0))
    return contrib, t_next, smax


def _raster_kernel(
    # scalar prefetch
    e_tf, e_chunk, r_start, r_end,
    # inputs
    table_ref, depth_ref,
    # outputs
    out_ref,
    # scratch
    acc_ref, trans_ref,
    *, tw, th, ntx, chunk, exact, use_depth, emit_zcut,
):
    g = pl.program_id(0)
    tf = e_tf[g]
    tile = tf & 0xFFFFFF
    first = ((tf >> 24) & 1) == 1
    p_n = th * tw
    rows = 8 if emit_zcut else 4

    @pl.when(first)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        trans_ref[:] = jnp.ones_like(trans_ref)

    t_carry = trans_ref[0:1, :]  # (1, P)

    # skip saturated tiles (early exit) and dead worklist entries
    @pl.when((jnp.max(t_carry) >= MIN_T) & (r_start[tile] < r_end[tile]))
    def _():
        contrib, t_next, smax = _entry_body(
            table_ref[:], depth_ref[0] if use_depth else None, tile,
            e_chunk[g], t_carry, r_start, r_end, tw=tw, th=th, chunk=chunk,
            exact=exact, use_depth=use_depth)
        acc_ref[0:4, :] = acc_ref[0:4, :] + contrib
        if emit_zcut:
            acc_ref[4:5, :] = _sat_update(acc_ref[4:5, :], t_carry, smax)
        trans_ref[0:1, :] = t_next

    # `last` is also set on the final in-budget entry (build_worklist), so
    # a tile whose trailing entries were truncated still flushes its
    # partial color instead of leaving uninitialized HBM
    last = ((tf >> 25) & 1) == 1

    @pl.when(last)
    def _():
        if emit_zcut:
            # per-band saturation-slot cuts (rows 4..7): pairs whose
            # stream slot is strictly beyond a band's cut can never
            # contribute to that band (every band pixel saturated first)
            acc_ref[4:4 + SAT_BANDS, :] = _sat_flush(
                acc_ref[4:5, :], trans_ref[0:1, :], th, tw)
        out_ref[0, 0:rows, :] = acc_ref[0:rows, :].reshape(1, rows, p_n)[0]


def _raster_kernel_blocked(
    # scalar prefetch
    e_tf, e_chunk, blk, r_start, r_end,
    # inputs: two adjacent S-chunk table superblocks + HBM-resident
    # depth tiles
    ta_ref, tb_ref, depth_ref,
    # output (HBM, flushed by explicit DMA)
    out_ref,
    # scratch
    acc_ref, trans_ref, dscr_ref, sem_out, sem_d,
    *, tw, th, chunk, step, exact, use_depth, emit_zcut,
):
    """S worklist entries per grid step: Mosaic's fixed per-step cost
    (~1.7 us measured — DMA bookkeeping + step dispatch) dominated the
    per-entry kernel at ~11-17k entries/frame, so amortize it. Entry
    chunks are monotone with +0/+1 increments (tile runs are contiguous
    in the sorted table), so the S entries of a step always fit in TWO
    adjacent S-chunk superblocks; each entry dynamic-slices its chunk
    from the pair. Output tiles flush via explicit async copies (a
    BlockSpec output could not flush multiple tiles per step); the proxy
    depth row is DMAed per TILE (on `first`), not per entry."""
    g = pl.program_id(0)
    base = blk[g] * step

    for j in range(step):
        e = g * step + j
        tf = e_tf[e]
        tile = tf & 0xFFFFFF
        first = ((tf >> 24) & 1) == 1
        alive = ((tf >> 26) & 1) == 1

        @pl.when(first)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
            trans_ref[:] = jnp.ones_like(trans_ref)
            if use_depth:
                cp = pltpu.make_async_copy(
                    depth_ref.at[tile], dscr_ref, sem_d)
                cp.start()
                cp.wait()

        t_carry = trans_ref[0:1, :]
        lo = e_chunk[e] - base  # chunk offset within [0, 2*step)

        @pl.when(alive & (jnp.max(t_carry) >= MIN_T)
                 & (r_start[tile] < r_end[tile]))
        def _():
            in_a = lo < step
            loa = jnp.where(in_a, lo, lo - step)
            tbl_a = ta_ref[:, pl.ds(loa * chunk, chunk)]
            tbl_b = tb_ref[:, pl.ds(loa * chunk, chunk)]
            table = jnp.where(in_a, tbl_a, tbl_b)
            contrib, t_next, smax = _entry_body(
                table, dscr_ref[0:1, :] if use_depth else None, tile,
                e_chunk[e], t_carry, r_start, r_end, tw=tw, th=th,
                chunk=chunk, exact=exact, use_depth=use_depth)
            acc_ref[0:4, :] = acc_ref[0:4, :] + contrib
            if emit_zcut:
                acc_ref[4:5, :] = _sat_update(acc_ref[4:5, :], t_carry, smax)
            trans_ref[0:1, :] = t_next

        last = ((tf >> 25) & 1) == 1

        @pl.when(last)
        def _():
            if emit_zcut:
                # per-band saturation-slot cuts — see _raster_kernel
                acc_ref[4:4 + SAT_BANDS, :] = _sat_flush(
                    acc_ref[4:5, :], trans_ref[0:1, :], th, tw)
            cp = pltpu.make_async_copy(acc_ref, out_ref.at[tile], sem_out)
            cp.start()
            cp.wait()


def _split_zcut(out, touched, emit_zcut):
    """Split the raster output into (color [T,4,P], zcut [T, SAT_BANDS]
    or None), defaulting budget-dropped tiles to color 0 / no cut
    (SAT_NOCUT)."""
    if not emit_zcut:
        if touched is not None:
            out = jnp.where(touched[:, None, None], out, 0.0)
        return out
    color = out[:, 0:4, :]
    zcut = out[:, 4:4 + SAT_BANDS, 0]  # [T, SAT_BANDS]
    if touched is not None:
        color = jnp.where(touched[:, None, None], color, 0.0)
        zcut = jnp.where(touched[:, None], zcut, SAT_NOCUT)
    return color, zcut


def rasterize_pallas(binned, depth_tiles, *, image_wh, tile_wh, chunk: int,
                     interpret: bool = False, exact: bool = True,
                     use_depth: bool = True, step: int | None = None,
                     emit_zcut: bool = False):
    """Run the Pallas tile rasterizer.

    binned: output of bin_pairs. depth_tiles: [T, th*tw] per-pixel depth
    (1.0 when no proxy). Returns rgb_acc [T, 4, P]: premultiplied color +
    alpha per tile block; reassemble with `tiles_to_image`.

    emit_zcut: also return a per-band saturation-SLOT record
    [T, SAT_BANDS] f32 — per 8-px horizontal band, the stream slot
    beyond which no pair can contribute (the render loop feeds it back
    as next frame's binning sat_simg cull), SAT_NOCUT for bands with any
    unsaturated pixel. Return becomes (rgb_acc, scut).

    step: worklist entries per grid step (default GSWT_RASTER_STEP or 4).
    The blocked kernel needs the table domain to be a multiple of
    step*chunk with >= 2 superblocks and an entry count that is a
    multiple of step (build_worklist aligns to 16); anything else falls
    back to the per-entry kernel.
    """
    depth_tiles = depth_tiles.reshape(depth_tiles.shape[0], 1, -1)
    w_img, h_img = image_wh
    tw, th = tile_wh
    ntx = -(-w_img // tw)
    nty = -(-h_img // th)
    n_tiles = ntx * nty
    p_n = th * tw
    rows_out = 8 if emit_zcut else 4
    ne = binned["entry_tf"].shape[0]
    if step is None:
        step = int(os.environ.get("GSWT_RASTER_STEP", "4"))
    dom = binned["table"].shape[1]
    n_chunks = dom // chunk
    if (step > 1 and dom % (step * chunk) == 0 and n_chunks >= 2 * step
            and ne % step == 0):
        return _rasterize_blocked(
            binned, depth_tiles, n_tiles=n_tiles, tw=tw, th=th, chunk=chunk,
            step=step, exact=exact, use_depth=use_depth, interpret=interpret,
            emit_zcut=emit_zcut)

    kernel = functools.partial(_raster_kernel, tw=tw, th=th, ntx=ntx,
                               chunk=chunk, exact=exact, use_depth=use_depth,
                               emit_zcut=emit_zcut)
    n_rows = binned["table"].shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(ne,),
        in_specs=[
            pl.BlockSpec(
                (n_rows, chunk),
                lambda g, etf, ec, rs, re: (0, ec[g]),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, p_n),
                lambda g, etf, ec, rs, re: (etf[g] & 0xFFFFFF, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, rows_out, p_n),
            lambda g, etf, ec, rs, re: (etf[g] & 0xFFFFFF, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((rows_out, p_n), jnp.float32),
            pltpu.VMEM((1, p_n), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles, rows_out, p_n), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        binned["entry_tf"],
        binned["entry_chunk"],
        binned["range_start"],
        binned["range_end"],
        binned["table"],
        depth_tiles,
    )
    # tiles the worklist budget dropped entirely hold uninitialized HBM
    return _split_zcut(out, binned.get("tile_touched"), emit_zcut)


def _rasterize_blocked(binned, depth_tiles, *, n_tiles, tw, th, chunk,
                       step, exact, use_depth, interpret, emit_zcut):
    """Blocked-worklist pallas_call (see _raster_kernel_blocked)."""
    p_n = th * tw
    rows_out = 8 if emit_zcut else 4
    dom = binned["table"].shape[1]
    nblk = dom // (step * chunk)
    ec = binned["entry_chunk"]
    ne = ec.shape[0]
    # superblock base per step, clamped so block blk+1 stays in range;
    # entries advance their chunk by 0/+1 and dead tails repeat the last
    # live chunk (build_worklist), so offsets stay within [0, 2*step)
    blk = jnp.clip(ec[::step] // step, 0, nblk - 2)
    kernel = functools.partial(
        _raster_kernel_blocked, tw=tw, th=th, chunk=chunk, step=step,
        exact=exact, use_depth=use_depth, emit_zcut=emit_zcut)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(ne // step,),
        in_specs=[
            pl.BlockSpec(
                (16, step * chunk),
                lambda g, etf, ec, blk, rs, re: (0, blk[g]),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (16, step * chunk),
                lambda g, etf, ec, blk, rs, re: (0, blk[g] + 1),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((rows_out, p_n), jnp.float32),
            pltpu.VMEM((1, p_n), jnp.float32),
            pltpu.VMEM((1, p_n), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles, rows_out, p_n), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        binned["entry_tf"],
        ec,
        blk,
        binned["range_start"],
        binned["range_end"],
        binned["table"],
        binned["table"],
        depth_tiles,  # (T, 1, P); .at[tile] matches the (1, P) scratch
    )
    return _split_zcut(out, binned.get("tile_touched"), emit_zcut)


def tiles_to_image(tile_acc, *, image_wh, tile_wh):
    """[T, 4, P] tile blocks -> [H, W, 4] image (cropping padding)."""
    w_img, h_img = image_wh
    tw, th = tile_wh
    ntx = -(-w_img // tw)
    nty = -(-h_img // th)
    img = tile_acc.reshape(nty, ntx, 4, th, tw)
    img = img.transpose(0, 3, 1, 4, 2).reshape(nty * th, ntx * tw, 4)
    return img[:h_img, :w_img, :]


def image_to_depth_tiles(depth, *, image_wh, tile_wh):
    """[H, W] depth -> [T, P] tile blocks (padding with 1.0)."""
    w_img, h_img = image_wh
    tw, th = tile_wh
    ntx = -(-w_img // tw)
    nty = -(-h_img // th)
    pad_h = nty * th - h_img
    pad_w = ntx * tw - w_img
    d = jnp.pad(depth, ((0, pad_h), (0, pad_w)), constant_values=1.0)
    d = d.reshape(nty, th, ntx, tw).transpose(0, 2, 1, 3).reshape(ntx * nty, th * tw)
    return d


def rasterize_reference(binned_np, depth_tiles_np, *, image_wh, tile_wh,
                        chunk, emit_zcut=False):
    """NumPy reference with identical semantics to the kernel (for tests)."""
    w_img, h_img = image_wh
    tw, th = tile_wh
    ntx = -(-w_img // tw)
    nty = -(-h_img // th)
    n_tiles = ntx * nty
    p_n = th * tw
    table = np.asarray(binned_np["table"])
    etf = np.asarray(binned_np["entry_tf"])
    ec = np.asarray(binned_np["entry_chunk"])
    rs = np.asarray(binned_np["range_start"])
    re_ = np.asarray(binned_np["range_end"])
    depth = np.asarray(depth_tiles_np)
    out = np.zeros((n_tiles, 4, p_n), np.float32)
    zcut = np.full((n_tiles, SAT_BANDS), SAT_NOCUT, np.float32)
    acc = np.zeros((4, p_n), np.float32)
    rec = np.zeros((1, p_n), np.float32)
    tcar = np.ones((1, p_n), np.float32)
    for g in range(etf.shape[0]):
        tile = int(etf[g]) & 0xFFFFFF
        ef = (int(etf[g]) >> 24) & 1
        el = (int(etf[g]) >> 25) & 1
        if ef:
            acc[:] = 0.0
            rec[:] = 0.0
            tcar[:] = 1.0
        if tcar.max() >= MIN_T:
            blk = table[:, ec[g] * chunk : (ec[g] + 1) * chunk]
            # tile-local pixel coordinates (table k rows are recentered)
            px = (np.arange(tw)[None, :] + 0.5) * np.ones((th, 1))
            py = (np.arange(th)[:, None] + 0.5) * np.ones((1, tw))
            px = px.reshape(-1)
            py = py.reshape(-1)
            feats = np.stack(
                [px * px, px * py, py * py, px, py, np.ones(p_n), np.zeros(p_n),
                 np.zeros(p_n)], axis=0
            ).astype(np.float32)
            expnt = blk[0:8].T @ feats
            z = blk[6, :][:, None]
            ln_alpha = blk[11, :][:, None]
            slot = ec[g] * chunk + np.arange(chunk)[:, None]
            in_run = (slot >= rs[tile]) & (slot < re_[tile])
            ln_eff = np.where(in_run, ln_alpha, -np.inf)
            g_m = np.exp(expnt + ln_eff)
            mask = (expnt >= CUTOFF) & (z < depth[tile][None, :])
            g_m = np.where(mask, g_m, 0.0)
            t_incl = np.cumprod(1.0 - g_m, axis=0)
            t_excl = np.concatenate([np.ones((1, p_n), np.float32), t_incl[:-1]], axis=0)
            weight = g_m * t_excl * tcar
            rgb1 = np.concatenate([blk[8:11], np.ones((1, chunk), np.float32)], axis=0)
            acc[0:4] += rgb1 @ weight
            smax = (float(blk[12, in_run[:, 0]].max())
                    if in_run.any() else -1.0)
            rec = np.where(tcar >= MIN_T, np.maximum(rec, smax), rec)
            tcar = tcar * t_incl[-1:]
        if el:
            out[tile] = acc
            cut_p = np.where(tcar < MIN_T, rec + _SCUT_BUMP, SAT_NOCUT)
            bh = th // SAT_BANDS
            for b in range(SAT_BANDS):
                zcut[tile, b] = cut_p[0, b * bh * tw:(b + 1) * bh * tw].max()
    return (out, zcut) if emit_zcut else out
