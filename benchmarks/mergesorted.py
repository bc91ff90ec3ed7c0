"""Pallas merge of pre-sorted key+payload tables (PARKED in benchmarks/).

Binning's joint pair sort (ops/binning.py) pays XLA's full bitonic-sort
cost (~O(n log^2 n) compare passes) on a domain where MOST of the order is
already known: after one splat-level sort keyed by (first_tile, slot),
every elementwise expansion path emits pairs whose keys
(first_tile + static_offset) << rank_bits | slot are ALREADY ascending —
only a k-way merge of a few sorted sequences is needed, and a merge is
O(n log(2B)) compare passes (B = the kernel's block size, so ~13 passes
instead of the sort network's ~250 at 4M lanes).

Two pieces:
- merge_path_splits: for every output block boundary, how many elements
  come from A vs B (binary search at BLOCK granularity only — ~n/B lanes,
  so the searchsorted-style gather loop that is fatal per element is free
  per boundary).
- merge_sorted_pair: a Pallas kernel; each grid step DMAs one ascending
  A-window and one descending B-window (B is pre-flipped once at the XLA
  level, so the descending window is a contiguous slice) into VMEM,
  bitonic-merges the concatenation in log2(n2) compare-exchange passes
  (pltpu.roll pairing, payload rows swap with the keys), and writes the
  output block's lanes. Mosaic requires DMA lane offsets provably
  128-aligned while merge-path splits are data-dependent, so windows are
  floor-aligned to 128 and widened by 128 (the <= 127 pre-consumed lanes
  per side sort FIRST — they rank before the block — and a dynamic
  rotate by their count excises the true output block).

Keys must be UNIQUE across both inputs (binning's (tile, slot) packing
is): ties would need a stability rule the comparator does not implement.
INT32_MAX is reserved as the padding sentinel.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SENTINEL = np.int32(0x7FFFFFFF)


def _ikey(row):
    """Key row travels bitcast as f32 alongside the payload; compare i32."""
    return jax.lax.bitcast_convert_type(row, jnp.int32)


def merge_path_splits(ka, kb, *, block: int, n_blocks: int):
    """For output block boundaries m = b*block (b in [0, n_blocks)), the
    number of A-elements among the first m merged elements. ka/kb are i32
    ascending with unique keys. Returns i32 [n_blocks].

    Binary search per boundary over ia in [max(0, m-Nb), min(m, Na)]:
    the valid split has ka[ia-1] < kb[m-ia] and kb[m-ia-1] < ka[ia]
    (unique keys make both strict). ~log2(Na) rounds of 2 gathers on
    n_blocks lanes."""
    na = ka.shape[0]
    nb = kb.shape[0]
    m = jnp.arange(n_blocks, dtype=jnp.int32) * block
    lo = jnp.maximum(m - nb, 0)
    hi = jnp.minimum(m, na)

    def body(state):
        lo, hi = state
        mid = (lo + hi + 1) // 2  # candidate ia, probe ka[mid-1] vs kb[m-mid]
        a_prev = ka[jnp.clip(mid - 1, 0, na - 1)]
        b_at = kb[jnp.clip(m - mid, 0, nb - 1)]
        # taking `mid` from A is feasible iff the last taken A-element is
        # smaller than the first remaining B-element (edges: mid == 0 is
        # always feasible probe-wise; m - mid >= nb means B exhausted)
        feasible = (mid == 0) | (m - mid >= nb) | (a_prev < b_at)
        lo = jnp.where(feasible, mid, lo)
        hi = jnp.where(feasible, hi, mid - 1)
        return lo, hi

    def cond(state):
        lo, hi = state
        return jnp.any(lo < hi)

    lo, hi = jax.lax.while_loop(cond, body, (lo, hi))
    return lo


def _merge_kernel(sched, ta_ref, fb_ref, out_ref, va_ref, sem_a, sem_b,
                  *, block: int, w_win: int, n2: int, n_rows: int):
    """sched rows (host-precomputed, see merge_sorted_pair): 0 = A-window
    start / 128, 1 = B-window start in fb / 128, 2 = rot = (#pre-consumed
    lanes in the two windows). Mosaic requires DMA lane offsets PROVABLY
    128-aligned, but merge-path splits are data-dependent — so the windows
    are floor-aligned to 128 (width block+128 covers the overhang) and the
    output is excised from the sorted window by a dynamic rotate."""
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        # middle gap (present when 2*(block+128) is not a power of two)
        # holds +inf keys: [A asc | +inf | B desc] stays bitonic and the
        # gap sorts past every real lane. A/B regions are overwritten by
        # the DMAs below every step; the gap only needs writing once.
        va_ref[:] = jnp.broadcast_to(
            jax.lax.bitcast_convert_type(
                jnp.full((1, 1), SENTINEL, jnp.int32), jnp.float32),
            (n_rows, n2))

    cp_a = pltpu.make_async_copy(
        ta_ref.at[:, pl.ds(sched[0, g] * 128, w_win)],
        va_ref.at[:, pl.ds(0, w_win)], sem_a)
    cp_b = pltpu.make_async_copy(
        fb_ref.at[:, pl.ds(sched[1, g] * 128, w_win)],
        va_ref.at[:, pl.ds(n2 - w_win, w_win)], sem_b)
    cp_a.start()
    cp_b.start()
    cp_a.wait()
    cp_b.wait()

    w = va_ref[:]  # (n_rows, n2): ascending | +inf | descending = bitonic
    lane = jax.lax.broadcasted_iota(jnp.int32, (n_rows, n2), 1)
    d = n2 // 2
    while d >= 1:
        fwd = pltpu.roll(w, n2 - d, axis=1)  # partner at i + d (mod n2)
        bwd = pltpu.roll(w, d, axis=1)       # partner at i - d
        in_lo = (lane & d) == 0
        partner = jnp.where(in_lo, fwd, bwd)
        skey = _ikey(w[0:1, :])
        pkey = _ikey(partner[0:1, :])
        # min lands at the low side of each pair -> ascending output.
        # (1,n2) mask built from its own iota, combined with AND/OR:
        # select_n on bool operands (and slicing a bool vector) both emit
        # an i8->i1 trunci Mosaic cannot lower.
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, n2), 1)
        in_lo1 = (lane1 & d) == 0
        take = (in_lo1 & (pkey < skey)) | (~in_lo1 & (pkey > skey))
        w = jnp.where(take, partner, w)
        d //= 2
    # lanes [0, rot) are the windows' pre-consumed elements (they rank
    # before this output block and sort first); rotate them out
    rot = sched[2, g]
    w = pltpu.roll(w, jnp.where(rot == 0, 0, n2 - rot), axis=1)
    out_ref[:] = w[:, :block]


def merge_sorted_pair(ta, tb, *, block: int = 1920, interpret: bool = False):
    """Merge two sorted tables [R, Na] / [R, Nb] (row 0 = i32 keys bitcast
    to f32, ascending, unique across both; INT32_MAX reserved). Returns
    [R, No] with No = Na + Nb rounded up to `block` (tail = sentinel
    columns; key row stays the bitcast key).

    block must be a multiple of 128. The kernel's bitonic window is
    next_pow2(2*(block+128)) wide — block = 2^k - 128 (default 1920)
    makes the window exactly 2^(k+1) with no sentinel gap."""
    assert block % 128 == 0, "DMA windows are 128-lane aligned"
    n_rows_out, na = ta.shape
    nb = tb.shape[1]
    # raw DMA slices need the row dim aligned to the (8,128) tile: pad
    # payload rows with zeros, slice back after the kernel
    r_pad = (-n_rows_out) % 8
    if r_pad:
        ta = jnp.concatenate(
            [ta, jnp.zeros((r_pad, na), jnp.float32)], axis=0)
        tb = jnp.concatenate(
            [tb, jnp.zeros((r_pad, nb), jnp.float32)], axis=0)
    n_rows = n_rows_out + r_pad
    no = -(-(na + nb) // block) * block
    pad_a = no - na - nb  # content padding (sentinel keys sort last)
    w_win = block + 128  # window width: block + floor-alignment overhang
    n2 = 1 << int(math.ceil(math.log2(2 * w_win)))

    def pad_cols(t, n, where_front=False):
        if n == 0:
            return t
        blkf = jnp.tile(
            jnp.concatenate(
                [jax.lax.bitcast_convert_type(
                    jnp.full((1, n), SENTINEL, jnp.int32), jnp.float32),
                 jnp.zeros((n_rows - 1, n), jnp.float32)], axis=0,
            ), (1, 1))
        return (jnp.concatenate([blkf, t], axis=1) if where_front
                else jnp.concatenate([t, blkf], axis=1))

    ta_p = pad_cols(ta, pad_a + w_win)  # content pad + window overrun pad
    na_c = na + pad_a
    # flipped B with a sentinel FRONT pad sized so every aligned window
    # start stays >= 0 AND (f_pad + nb - w_win) is 128-divisible (the
    # kernel's B offsets are (obase - b0/128)*128): a window reaching past
    # B's start reads +inf lanes, which sit at the front of a descending
    # window as required
    f_pad = w_win + ((-nb) % 128)
    fb = pad_cols(jnp.flip(tb, axis=1), f_pad, where_front=True)

    ka = _ikey(ta_p[0, :na_c])
    kb = _ikey(tb[0])
    n_blocks = no // block
    splits = merge_path_splits(ka, kb, block=block, n_blocks=n_blocks)

    # per-block schedule: floor-128-aligned window starts + the rotation
    # that excises the output from the sorted window (see _merge_kernel)
    m = jnp.arange(n_blocks, dtype=jnp.int32) * block
    ib0 = m - splits
    a0b = splits // 128
    b0b = ib0 // 128
    obase = (f_pad + nb - w_win) // 128
    sched = jnp.stack(
        [a0b, obase - b0b, (splits - a0b * 128) + (ib0 - b0b * 128)], axis=0)

    kernel = functools.partial(
        _merge_kernel, block=block, w_win=w_win, n2=n2, n_rows=n_rows)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (n_rows, block), lambda g, sched: (0, g),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_rows, n2), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_rows, no), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(sched, ta_p, fb)
    return out[:n_rows_out] if r_pad else out


def merge_sorted(tables, *, block: int = 1920, interpret: bool = False):
    """Tournament merge of k sorted tables (pairwise rounds, largest pair
    first keeps rounds balanced). Returns [R, No]."""
    seqs = list(tables)
    assert seqs, "need at least one table"
    while len(seqs) > 1:
        seqs.sort(key=lambda t: t.shape[1])
        a = seqs.pop(0)
        b = seqs.pop(0)
        seqs.append(merge_sorted_pair(a, b, block=block, interpret=interpret))
    return seqs[0]
