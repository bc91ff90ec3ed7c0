"""Tile binning: expand projected splats into (image-tile, splat) pairs,
order them, and emit a chunk worklist for the Pallas rasterizer.

The wgpu reference rasterizes via instanced quads; the TPU equivalent is the
standard tile-binned compositor: each splat lands in every (tile_h x tile_w)
pixel block its bbox overlaps, and within a tile splats keep front-to-back
stream order so ordered alpha blending is exact.

Cost shape on TPU: sorts are cheap per lane, gathers and scatters are
expensive per index, and the padded stream is mostly culled splats (~70%
dead at the 1080p bench). bin_pairs therefore:
1. COMPACTS the stream to its live splats with one payload-carrying sort
   (keys = stream slots, so front-to-back order is preserved) — every
   downstream domain shrinks to the adaptive max_live bucket;
2. emits each splat's FIRST and SECOND overlapped tiles elementwise at its
   own compacted slot (the vast majority of the pair mass needs no
   expansion machinery at all);
3. expands only the k>=elem_paths extras of wide splats via scatter+cummax plus
   one small per-component gather.
All paths sort TOGETHER carrying the packed payload rows, keyed by
(tile, live-rank) packed into one u32 when the bits fit (i32 sort via a
sign flip) — so per-tile runs keep exact front-to-back stream order and
there is NO post-sort gather at all. The [16, P] raster table is then a few
fused element passes over the sorted payload (build_pair_table).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def grid_dims(image_wh, tile_wh):
    """(ntx, nty, n_tiles) with packing-budget validation."""
    w_img, h_img = image_wh
    tw, th = tile_wh
    ntx = -(-w_img // tw)
    nty = -(-h_img // th)
    n_tiles = ntx * nty
    # bbox packs x0/y0/nx into 8 bits each and entry_tf packs the tile id
    # into 24 bits; reject configs that would silently alias
    if ntx > 256 or nty > 256:
        raise ValueError(
            f"tile grid {ntx}x{nty} exceeds the 256x256 bbox packing budget; "
            "increase tile_w/tile_h for this resolution"
        )
    if n_tiles >= 1 << 24:
        raise ValueError(f"n_tiles {n_tiles} exceeds the 24-bit worklist packing")
    return ntx, nty, n_tiles


def expand_bboxes(x0, x1, y0, y1, ok, *, ntx, n_tiles, max_pairs: int):
    """Expand per-primitive tile bboxes (inclusive, pre-clipped to the grid)
    into (tile, primitive) pairs, sorted by tile with original order kept
    inside each tile. Returns (sorted_key, sorted_prim, total, overflow)."""
    nx = jnp.where(ok, x1 - x0 + 1, 0)
    ny = jnp.where(ok, y1 - y0 + 1, 0)
    count = nx * ny

    s_n = count.shape[0]
    offs_incl = jnp.cumsum(count, dtype=jnp.int32)
    offs = offs_incl - count  # exclusive
    total = offs_incl[-1]
    overflow = total > max_pairs

    # pair -> primitive via scatter + cummax (a searchsorted over a
    # MAX_PAIRS table would lower to ~22 real gathers): scatter each
    # contributing primitive's id at its first pair slot, forward-fill by
    # cumulative max (ids increase along the pair axis)
    scatter_to = jnp.where((count > 0) & (offs < max_pairs), offs, max_pairs)
    prim_ids = jnp.arange(s_n, dtype=jnp.int32)
    mark = jnp.full(max_pairs, -1, jnp.int32).at[scatter_to].max(
        prim_ids, mode="drop"
    )
    sp = jnp.maximum(jax.lax.cummax(mark), 0)
    # pack bbox into one i32 (x0 8b | y0 8b | nx 8b); the primitive's
    # first-pair offset rides the same gather as a 2nd component (a
    # scatter+cummax for it would cost ~3x the extra gather component)
    bbox_bits = x0 | (y0 << 8) | (jnp.maximum(nx, 1) << 16)
    bo = jnp.stack([bbox_bits, offs], axis=0)
    bo_rows = bo[:, sp]
    bb = bo_rows[0]
    soff = bo_rows[1]
    pair_i = jnp.arange(max_pairs, dtype=jnp.int32)
    k = pair_i - soff
    pair_ok = pair_i < jnp.minimum(total, max_pairs)
    nx_sp = (bb >> 16) & 0xFF
    tx = (bb & 0xFF) + k % nx_sp
    ty = ((bb >> 8) & 0xFF) + k // nx_sp
    tile = ty * ntx + tx
    key = jnp.where(pair_ok, tile, n_tiles).astype(jnp.int32)

    # stable sort by tile keeps primitive order within each tile; the
    # primitive id rides along as payload (no post-sort index gather)
    sorted_key, sorted_sp = jax.lax.sort([key, sp], num_keys=1, is_stable=True)
    return sorted_key, sorted_sp, total, overflow


def build_worklist(sorted_key, *, n_tiles, max_pairs: int, chunk: int,
                   max_entries: int | None = None):
    """Per-tile ranges + the (tile, chunk) worklist for the Pallas grid.

    max_entries caps the static worklist length: every grid step costs
    ~1-2us even when its entry is dead, so the caller buckets this near the
    OBSERVED entry count instead of the worst case (max_pairs//chunk +
    n_tiles). Overflowing entries are dropped (their tiles would render
    incomplete) and flagged via wl_overflow for a grow-and-retry.

    NOTE a per-tile saturation-slot run TRUNCATION (cutting range_end at
    the recorded cut via one searchsorted) was built and REVERTED here:
    per-pair it removes exactly the entries the raster's saturation early
    exit already skips (no win), and the chunk gaps it leaves between
    consecutive tiles' runs break the blocked kernel's entry_chunk
    +0/+1-monotonicity invariant (wrong-superblock reads). The
    saturation cull lives at the SPLAT level in bin_pairs, where it
    shrinks the compaction/sort/raster domains for real."""
    tile_idx = jnp.arange(n_tiles, dtype=jnp.int32)
    range_start = jnp.searchsorted(sorted_key, tile_idx, side="left").astype(jnp.int32)
    range_end = jnp.searchsorted(sorted_key, tile_idx, side="right").astype(jnp.int32)
    length = range_end - range_start

    # worklist: for tile t, chunks floor(rs/C) .. floor((re-1)/C); empty
    # tiles still get one entry so their output block is zeroed
    c0 = range_start // chunk
    c1 = jnp.where(length > 0, (range_end - 1) // chunk, c0)
    n_entries_tile = jnp.where(length > 0, c1 - c0 + 1, 1)
    e_offs = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(n_entries_tile, dtype=jnp.int32)]
    )
    total_entries = e_offs[-1]
    ne_max = max_pairs // chunk + n_tiles
    if max_entries is not None:
        ne_max = min(ne_max, max_entries)
    # blocked raster kernels consume a multiple-of-`step` entry count
    # (raster.py _raster_kernel_blocked); align up to 16 to cover all steps
    ne_max = -(-ne_max // 16) * 16

    ei = jnp.arange(ne_max, dtype=jnp.int32)
    t_of_e = jnp.searchsorted(e_offs, ei, side="right").astype(jnp.int32) - 1
    t_of_e = jnp.clip(t_of_e, 0, n_tiles - 1)
    live = ei < total_entries
    rank = ei - e_offs[t_of_e]
    entry_tile = jnp.where(live, t_of_e, n_tiles - 1).astype(jnp.int32)
    # dead-tail entries repeat the LAST live chunk so entry_chunk stays
    # monotone (+0/+1 steps) end to end — the blocked kernel derives its
    # per-step table superblock from entry_chunk[step * g] and bounds
    # within-step offsets by that monotonicity
    ec_live = (c0[t_of_e] + rank).astype(jnp.int32)
    ec_last = jnp.max(jnp.where(live, ec_live, 0))
    entry_chunk = jnp.where(live, ec_live, ec_last)
    entry_first = live & (rank == 0)
    # the FINAL in-budget entry is always flagged `last` too: when the
    # budget truncates a tile mid-run, that tile still flushes its partial
    # accumulation instead of leaving its output block uninitialized
    entry_last = live & (
        (rank == n_entries_tile[t_of_e] - 1) | (ei == ne_max - 1)
    )
    # pack (tile | first | last | alive) into one i32 prefetch array: SMEM
    # holds at most ~1 MB of scalar-prefetch data, so the worklist is 2
    # per-entry arrays + 2 per-tile range arrays
    entry_tf = (
        entry_tile
        | (entry_first.astype(jnp.int32) << 24)
        | (entry_last.astype(jnp.int32) << 25)
        | (live.astype(jnp.int32) << 26)
    )
    # dead entries: mask everything via empty range (start == end == 0)
    r_start = jnp.where(length > 0, range_start, 0).astype(jnp.int32)
    r_end = jnp.where(length > 0, range_end, 0).astype(jnp.int32)
    # tiles whose entries were ALL dropped by the max_entries cap never run
    # a single grid step, so their output blocks stay uninitialized HBM;
    # rasterizers mask those to zero so a worklist overflow degrades to
    # missing tiles on a valid background instead of garbage pixels
    tile_touched = e_offs[:n_tiles] < ne_max
    return dict(
        entry_tf=entry_tf,
        entry_chunk=entry_chunk,
        range_start=r_start,
        range_end=r_end,
        n_entries=total_entries,
        n_pairs_ranges=jnp.sum(length),
        tile_touched=tile_touched,
        wl_overflow=total_entries > ne_max,
    )


def build_pair_table(sorted_key, dead, cx, cy, qa, qb, qc, z, r, g, b, a, *,
                     ntx, n_tiles, tile_wh, src=None):
    """Assemble the [16, P] raster table with the exponent quadratic
    RECENTERED to each pair's raster-tile origin:

      e(u, v) = k0 u^2 + k1 uv + k2 v^2 + k3 u + k4 v + k5,   (u, v) local

    algebraically identical to the global monomial form but with operand
    magnitudes bounded by the tile size instead of the image size — the
    raster matmul can then run reduced-precision without breaking the
    exponent, and f32 rounding vs the per-pixel oracle math shrinks.

    Row 11 carries ln(alpha) (-inf for dead/transparent pairs); row 12
    the pair's STREAM SLOT as f32 (exact to 2^24 — for the raster's
    saturation-slot record, ops/raster.py emit_zcut)."""
    tw, th = tile_wh
    tile_c = jnp.minimum(sorted_key, n_tiles - 1)
    ox = (tile_c % ntx * tw).astype(jnp.float32)
    oy = (tile_c // ntx * th).astype(jnp.float32)
    dx = cx - ox
    dy = cy - oy
    av = qa * dx + qb * dy
    bv = qb * dx + qc * dy
    k5 = jnp.where(dead, -1e30, -(dx * av + dy * bv))
    src_row = (jnp.zeros_like(z) if src is None
               else src.astype(jnp.float32))
    return jnp.stack(
        [
            -qa, -2.0 * qb, -qc, 2.0 * av, 2.0 * bv, k5,
            z, jnp.zeros_like(z), r, g, b, jnp.log(a),
            src_row,
        ]
        + [jnp.zeros_like(z)] * 3,
        axis=0,
    )


def _rect_min_q(qa, qb, qc, lx0, lx1, ly0, ly1):
    """Min of the PSD quadratic Q(x,y) = qa x^2 + 2 qb xy + qc y^2 over
    the rectangle [lx0,lx1] x [ly0,ly1] (coordinates relative to the splat
    center). Zero when the center is inside; else the min lies on one of
    the four edges, each a 1D quadratic minimized at its clamped vertex
    (degenerate qa/qc: the huge t* clamps to an endpoint, which IS the
    linear case's minimizer)."""
    inside = (lx0 <= 0.0) & (0.0 <= lx1) & (ly0 <= 0.0) & (0.0 <= ly1)
    tiny = jnp.float32(1e-20)

    def edge_x(dx):  # x fixed at dx, y in [ly0, ly1]
        t = jnp.clip(-qb * dx / jnp.maximum(qc, tiny), ly0, ly1)
        return qa * dx * dx + 2.0 * qb * dx * t + qc * t * t

    def edge_y(dy):  # y fixed at dy, x in [lx0, lx1]
        t = jnp.clip(-qb * dy / jnp.maximum(qa, tiny), lx0, lx1)
        return qc * dy * dy + 2.0 * qb * dy * t + qa * t * t

    m = jnp.minimum(
        jnp.minimum(edge_x(lx0), edge_x(lx1)),
        jnp.minimum(edge_y(ly0), edge_y(ly1)),
    )
    return jnp.where(inside, 0.0, m)


# conservative margin over the exp(-4) cutoff: the raster kernel evaluates
# the SAME coefficients through a recentered bf16 hi/lo matmul (documented
# ~1e-3 absolute exponent error in the fast profile); pairs within the
# margin of the cutoff are kept
_CULL_MARGIN = 0.05


# largest (static) lane count at which jnp.take beats the one-hot matmul
# for the tiny zimg table: measured on-chip 2026-08-19
# (benchmarks/micro_occlookup.py) — take runs ~0.1 ns/lane at <= 512Ki
# lanes but falls to the ~6 ns/lane HBM gather rate at >= 1M, while the
# factored one-hot is flat ~1.7-2.3 ms at every size
_OCC_TAKE_MAX = 1 << 19

# splat-level saturation cull window: a splat is lookup-cullable when its
# bbox spans <= 2 tile columns and <= _SAT_K 8-px band rows (small splats
# — the overwhelming majority; wider splats are NOT sat-culled at all —
# the per-tile-run truncation draft was reverted, see build_worklist NOTE)
_SAT_K = 4


def _zmax_lookup(tx, ty, zimg):
    """Per-lane lookup of zimg[ty, tx] ([nty, ntx] f32). Out-of-range
    ty/tx (dead lanes) return 0.0 (matching jnp.take's clip only at the
    one-hot path; callers only use the value for lanes they keep or that
    are already dead).

    Large domains avoid the element gather: one-hot(ty) @ zimg on the MXU
    selects the row EXACTLY (one-hot rows make the f32 matmul a copy),
    then a masked reduce selects the column — flat ~2 ms at the 3-4M-lane
    binning domains where a gather costs ~20 ms. Small domains use the
    plain take (see _OCC_TAKE_MAX)."""
    nty, ntx = zimg.shape
    if tx.shape[0] <= _OCC_TAKE_MAX:
        t = jnp.clip(ty, 0, nty - 1) * ntx + jnp.clip(tx, 0, ntx - 1)
        inb = (ty >= 0) & (ty < nty) & (tx >= 0) & (tx < ntx)
        return jnp.where(inb, jnp.take(zimg.reshape(-1), t), 0.0)
    oy = (ty[:, None] == jnp.arange(nty, dtype=jnp.int32)[None, :])
    row = oy.astype(jnp.float32) @ zimg  # [L, ntx]
    sel = tx[:, None] == jnp.arange(ntx, dtype=jnp.int32)[None, :]
    return jnp.sum(jnp.where(sel, row, 0.0), axis=1)


def _dilate_max2(zimg):
    """2x2 max-window image: out[y, x] = max of zimg over
    {y, y+1} x {x, x+1} (clipped at the grid edge). A splat whose CLIPPED
    tile bbox is <= 2x2 starting at (x0, y0) has its whole bbox inside
    that window, so one lookup conservatively bounds the bbox max."""
    z1 = jnp.maximum(zimg[:, :-1], zimg[:, 1:])
    zx = jnp.concatenate([z1, zimg[:, -1:]], axis=1)
    z2 = jnp.maximum(zx[:-1, :], zx[1:, :])
    return jnp.concatenate([z2, zx[-1:, :]], axis=0)


def _cull_pair_tiles(tiles, cx, cy, qa, qb, qc, *, ntx, n_tiles, tile_wh):
    """Exact ellipse-tile cull: remap pairs whose quadratic cannot reach
    the exp(-4) discard threshold at ANY pixel center of their tile to the
    dead sentinel (n_tiles), so they sort out of every tile run and shrink
    the raster worklist. Bit-safe: the raster kernel masks those fragments
    to zero anyway (mask = expnt >= CUTOFF, ops/raster.py), so the image
    is unchanged; only dead work is removed. Pixel centers sit at +0.5
    offsets, so the test rect is inset by 0.5 on every side."""
    tw, th = tile_wh
    t_c = jnp.minimum(tiles, n_tiles - 1)
    ox = (t_c % ntx * tw).astype(jnp.float32)
    oy = (t_c // ntx * th).astype(jnp.float32)
    minq = _rect_min_q(
        qa, qb, qc,
        ox + 0.5 - cx, ox + (tw - 0.5) - cx,
        oy + 0.5 - cy, oy + (th - 0.5) - cy,
    )
    return jnp.where(minq > 4.0 + _CULL_MARGIN, n_tiles, tiles)


def bin_pairs(p, *, image_wh, tile_wh, max_pairs: int, chunk: int,
              exact: bool = True, max_entries: int | None = None,
              max_live: int | None = None, elem_paths: int = 2,
              live_buckets: tuple[int, ...] | None = None,
              cull_exact: bool = False, occ_zimg=None, sat_simg=None,
              emit_block_demand: bool = False):
    """p: projection outputs (front-to-back order, S lanes). Static:
    image_wh (W,H), tile_wh (tw, th) pixels, max_pairs, chunk, exact,
    max_entries (worklist budget, see build_worklist), max_live (live-splat
    compaction bucket; None or >= S disables compaction), live_buckets
    (per-path prefix budgets for paths 1..elem_paths-1, see below).

    Multi-path expansion over a COUNT-CLASSED LIVE-COMPACTED stream:
    - compaction: one payload-carrying sort moves the visible splats to a
      contiguous [0, n_live) prefix, ordered by DESCENDING tile-count
      class (key = (elem_paths - min(count, elem_paths)) << slot_bits |
      slot, so splats overlapping more tiles sort first and stream order
      is preserved within each class); all downstream domains shrink from
      S (the padded stream, often ~70% culled) to max_live.
    - paths k < elem_paths: a splat's first elem_paths overlapped tiles
      are emitted ELEMENTWISE at its own compacted slot — no expansion
      machinery for ~the entire pair mass. Thanks to the count ordering,
      path j only reads the [0, #count>j) PREFIX, so its sort stripe is
      live_buckets[j-1] lanes instead of a full max_live stripe (measured
      at the 1080p bench: count>0/1/2/3 = 1.0/0.55/0.27/0.13 of n_live).
    - path k>=elem_paths: only the remaining extras of wider splats go
      through the scatter+cummax expansion and a small per-component
      gather; max_pairs budgets ONLY these. Every extras contributor
      (count > elem_paths) lives in the smallest prefix, so the cumsum /
      scatter source domain shrinks to live_buckets[-1] as well.

    Per-tile pair ORDER is unchanged: the joint sort ranks by the original
    stream slot (recovered from the compaction key), not the compacted
    position, so front-to-back order within each tile is exact.

    The sort domain is max_live + sum(live_buckets) + max_pairs. Returns dict:
      table — [16, dom] f32 rows k0..k5 (recentered to each pair's tile
        origin, build_pair_table), z, 0, r, g, b, a, 0x4. In the fast
        profile the payload carried through the sorts is quantized (bf16
        Cholesky factors of the quadratic — PSD-safe, see the pack site —
        bf16 z, u8 rgba; PARITY.md #8); exact carries f32.
      entry_tf/entry_chunk/range_start/range_end [.] i32 (worklist)
      n_pairs i32 (true pair demand), n_extra i32 (k>=elem_paths demand — bucket
        max_pairs on THIS), n_live i32 (bucket max_live on THIS),
      n_pairs_kept i32 (pairs surviving the exact-ellipse and proxy-depth
        culls — the raster's actual pair domain),

    occ_zimg (optional [nty, ntx] f32): per-raster-tile MAX of the proxy
    depth the raster kernel tests against (pipeline computes it from
    depth_tiles). When given, enables the PROXY-DEPTH OCCLUSION CULL — the
    TPU equivalent of the early-z the reference gets free from the ROP
    (renderer.rs:179-185 depth test Less + proxy.rs:119-125 depth
    pre-pass): a pair whose kernel depth key z is >= the max proxy depth
    anywhere in its tile fails `z < depth` at EVERY pixel
    (ops/raster.py), so dropping it is value-safe up to the blocked
    scan's group-boundary re-association (same contract as cull_exact).
    Two levels, both gather-free (_zmax_lookup):
    - splat level, BEFORE compaction: splats whose clipped bbox is <= 2x2
      tiles test against the 2x2-dilated max image — fully occluded
      splats leave the live stream, so every compaction bucket, sort
      stripe, and the extras domain shrink with them (85% of full-config
      bench pairs are occluded, benchmarks/saturation.py);
    - pair level, per enumerated pair: the exact per-tile test for
      whatever survives (wide splats, partial occlusion).
    The test uses the SAME z the kernel consumes (u16-quantized in the
    fast profile), so cull and depth test can never disagree.

    sat_simg (optional [nty*SAT_BANDS, ntx] f32, band-row-major): per
    8-px-band SATURATION SLOT cut — the stream slot beyond which the
    previous frame's raster proved nothing can contribute to that band
    (all its pixels were opaque: ops/raster.py emit_zcut; pipeline.py
    threads it frame to frame). A pair whose STREAM SLOT is >= the cut
    composites entirely behind a transmittance < MIN_T, so dropping it
    changes the image by < MIN_T per pixel (below the reference ROP's
    quantization). Slot-keyed — not depth-keyed — so the certificate is
    self-renewing: the cull never removes anything BEFORE the recorded
    slot, the kept prefix's transmittance upper-bounds the full-stack
    one, and each frame's record re-certifies from its own run even
    right after a stream re-sort (pipeline.py additionally gates on
    camera motion vs the dilation margin). SPLAT-LEVEL only (unlike
    occ_zimg's two levels): small splats (bbox <= 2 tile columns and
    <= _SAT_K band rows) test one span-exact dilated lookup; wider
    splats are not sat-culled.
      n_live_paths [elem_paths] i32 (#splats with count>j — bucket
        live_buckets[j-1] on entries 1..), overflow bool
    """
    w_img, h_img = image_wh
    tw, th = tile_wh
    ntx, nty, n_tiles = grid_dims(image_wh, tile_wh)
    bc = jax.lax.bitcast_convert_type

    cx, cy = p["cx"], p["cy"]
    ex, ey = p["ext_x"], p["ext_y"]
    valid = p["valid"]
    s_n = cx.shape[0]
    m2 = max((max_pairs // chunk) * chunk, chunk)

    x0 = jnp.clip(jnp.floor((cx - ex) / tw).astype(jnp.int32), 0, ntx - 1)
    x1 = jnp.clip(jnp.floor((cx + ex) / tw).astype(jnp.int32), 0, ntx - 1)
    y0 = jnp.clip(jnp.floor((cy - ey) / th).astype(jnp.int32), 0, nty - 1)
    y1 = jnp.clip(jnp.floor((cy + ey) / th).astype(jnp.int32), 0, nty - 1)
    onscreen = (cx + ex >= 0) & (cx - ex < w_img) & (cy + ey >= 0) & (cy - ey < h_img)
    ok = valid & onscreen
    if occ_zimg is not None:
        # kernel depth key: the fast profile's pair table carries z
        # quantized to u16 fixed point, FLOORED (see the pack site below
        # for why), so the occlusion tests quantize the same way and
        # never disagree with the kernel's `z < depth`. The key must be
        # the exact same integer round-trip the unpack performs (a plain
        # f32 convert round-trip is elided by XLA's simplifier under jit
        # — the round-3 'inert cull' bug)
        if exact:
            zk = p["z"]
        else:
            zk = jnp.floor(
                jnp.clip(p["z"], 0.0, 1.0) * 65535.0
            ) * jnp.float32(1.0 / 65535.0)
        # splat-level proxy-depth cull (see the docstring): bbox <= 2x2
        # tiles -> one dilated-max lookup bounds the bbox max depth
        zdil = _dilate_max2(occ_zimg)
        small = (x1 - x0 <= 1) & (y1 - y0 <= 1)
        ok = ok & ~(small & (zk >= _zmax_lookup(x0, y0, zdil)))
    if sat_simg is not None:
        # splat-level saturation cull at BAND grain: a splat whose bbox
        # spans <= 2 tile columns and <= _SAT_K band rows tests ONE
        # lookup — the cut-image is pre-dilated at every (row-span,
        # col-span) combination and the splat indexes the variant
        # matching ITS span (a fixed max-size window would take NOCUT
        # from rows/cols the splat never touches and barely cull; the
        # span-exact window is the tight max over exactly the cells its
        # pixels can reach). The splat's stream SLOT is its lane index
        # (projection outputs are stream-ordered).
        n_br = sat_simg.shape[0]  # nty * SAT_BANDS band rows
        bh_px = (nty * th) // n_br

        def _coldil(a):  # max over columns {x, x+1}
            return jnp.concatenate(
                [jnp.maximum(a[:, :-1], a[:, 1:]), a[:, -1:]], axis=1)

        rd = sat_simg
        variants = [rd, _coldil(rd)]
        for s in range(1, _SAT_K):
            # max over rows {y .. y+s} (replicate-pad: off-grid rows have
            # no pixels, so they must not poison the window)
            sh = jnp.concatenate(
                [sat_simg[s:], jnp.repeat(sat_simg[-1:], s, axis=0)],
                axis=0)
            rd = jnp.maximum(rd, sh)
            variants += [rd, _coldil(rd)]
        sdil = jnp.concatenate(variants, axis=0)  # [(2K)*n_br, ntx]
        slot_f = jnp.arange(s_n, dtype=jnp.float32)
        gb0 = jnp.clip(
            jnp.floor((cy - p["ext_y"]) / bh_px).astype(jnp.int32),
            0, n_br - 1)
        gb1 = jnp.clip(
            jnp.floor((cy + p["ext_y"]) / bh_px).astype(jnp.int32),
            0, n_br - 1)
        span_y = jnp.clip(gb1 - gb0, 0, _SAT_K - 1)
        span_x = jnp.clip(x1 - x0, 0, 1)
        row = (span_y * 2 + span_x) * n_br + gb0
        small_s = (x1 - x0 <= 1) & (gb1 - gb0 <= _SAT_K - 1)
        ok = ok & ~(small_s & (slot_f >= _zmax_lookup(x0, row, sdil)))
    nx = jnp.where(ok, x1 - x0 + 1, 0)
    ny = jnp.where(ok, y1 - y0 + 1, 0)
    # bbox rides the compaction sort as ONE packed i32 row: x0 | y0<<8 |
    # (nx-1)<<16 | (ny-1)<<24 (grid_dims guarantees <= 256 tiles per axis,
    # so every field fits 8 bits; the (ny-1)<<24 sign wrap is benign)
    bbox_bits = (
        x0 | (y0 << 8)
        | ((jnp.maximum(nx, 1) - 1) << 16)
        | ((jnp.maximum(ny, 1) - 1) << 24)
    )

    # ---- payload rows (elementwise over the stream; no gather) ----
    cr, cg, cb, ca = p["color"]
    qa, qb, qc = p["q"]
    if exact:
        payload = [cx, cy, qa, qb, qc, p["z"], cr, cg, cb, ca]
    else:
        def bf16_hi(x):
            return bc(x.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)

        # The quadratic is quantized as its CHOLESKY factors (Q = L L^T,
        # rows l11|l21 and l22|z), not as (qa, qb, qc): grazing-angle
        # splats reach |qb|/sqrt(qa*qc) within 1e-7 of 1 (axis ratios up
        # to the 1024-px eigen clamp), and bf16's 2^-9 relative rounding
        # on the raw coefficients tips ~half of them INDEFINITE — the
        # exponent then GROWS along the bbox (exp(+1000s) at far tiles)
        # and one splat floods its tiles with inf/NaN. L quantized at any
        # precision keeps L L^T PSD by construction and carries the
        # ill-conditioned factors at full per-entry relative accuracy (a
        # direct |qb| clamp would crush the splat's long axis to
        # ~16:1). Cost: the same two packed rows; unpack is 4 fused
        # multiplies. Worst-case coefficient error doubles to ~2^-8
        # relative (two roundings compose), still inside the fast
        # profile's ROP budget (tests/test_fastmode.py).
        l11 = jnp.sqrt(jnp.maximum(qa, 1e-12))
        l21 = qb / l11
        l22 = jnp.sqrt(jnp.maximum(qc - l21 * l21, 0.0))
        qab = bc((bf16_hi(l11) << 16) | bf16_hi(l21), jnp.float32)
        # z is quantized to u16 FIXED-POINT over NDC [0,1], FLOORED — not
        # bf16, and not round-to-nearest:
        # - fixed point: NDC z only spans [0,1], so bf16 wastes its
        #   exponent bits and resolves only ~4e-3 near the far plane,
        #   while the splat-vs-proxy NDC gaps the depth test must resolve
        #   are ~1e-4..1e-5 at range (reference default proxy_height=-0.5
        #   puts the proxy 0.5 BELOW the splat surface — renderer.rs
        #   CompareFunction::Less keeps the splats). u16 fixed point
        #   resolves 1.53e-5 uniformly, 256x finer where it matters.
        # - floor: ties must resolve to 'in front'. Nearest-rounded bf16
        #   resolved them to 'behind' for ~90% of bench splats, silently
        #   replacing distant splats with the proxy texture (32% of
        #   full-config pixels off by >8/255 vs the exact profile,
        #   benchmarks/dbg_fast_exact_proxy.py). Floor keeps every splat
        #   the reference's f32 test keeps; the <=1-step of extra kept
        #   fragments composite under the surface stack.
        zq16 = jnp.floor(
            jnp.clip(p["z"], 0.0, 1.0) * 65535.0).astype(jnp.uint32)
        qcz = bc((bf16_hi(l22) << 16) | zq16, jnp.float32)

        def u8v(x):
            return jnp.round(
                jnp.clip(jnp.nan_to_num(x), 0.0, 1.0) * 255.0
            ).astype(jnp.uint32)

        rgba = bc(
            u8v(cr) | (u8v(cg) << 8) | (u8v(cb) << 16) | (u8v(ca) << 24),
            jnp.float32,
        )
        payload = [cx, cy, qab, qcz, rgba]

    # ---- per-path live counts (pre-sort, elementwise) ----
    count0 = jnp.where(ok, nx * ny, 0)
    block_demand = None
    if emit_block_demand:
        # exact per-256-lane-block pair demand (lane index = stream slot):
        # the stream-parallel path's host-side segment balancer cuts its
        # boundaries at quantiles of this (parallel/batched.py) — live-lane
        # counts alone can't see footprint density
        bd_pad = -(-s_n // 256) * 256
        block_demand = jnp.sum(
            jnp.pad(count0, (0, bd_pad - s_n)).reshape(-1, 256), axis=1
        )
    n_live_paths = jnp.stack(
        [jnp.sum((count0 > j).astype(jnp.int32)) for j in range(elem_paths)]
    )
    n_live = n_live_paths[0]

    # ---- live compaction: visible splats to a contiguous prefix, ordered
    # by DESCENDING tile-count class (stream order kept within class) ----
    l_pad = s_n if max_live is None else max(min(max_live, s_n), chunk)
    l_pad = (l_pad // chunk) * chunk
    slot_bits = max(int(np.ceil(np.log2(max(s_n, 2)))), 1)
    compacted = l_pad < s_n
    if compacted:
        slot = jnp.arange(s_n, dtype=jnp.int32)
        # class 0 = count >= elem_paths, ..., elem_paths = dead: wider
        # splats sort first so each elementwise path reads only a prefix
        cls = jnp.where(
            ok, elem_paths - jnp.minimum(count0, elem_paths), elem_paths
        )
        ckey = (cls << slot_bits) | slot
        if len(payload) <= 5:
            # fast profile: a SINGLE-key sort (~0.6 ns/lane on v5e vs ~3
            # ns/lane per extra payload array) + one 6-comp gather on the
            # SHRUNK l_pad prefix — ~2x cheaper than carrying the payload
            # rows through the full-stream sort
            skey = jax.lax.sort([ckey], num_keys=1, is_stable=False)[0]
            src = skey[:l_pad] & ((1 << slot_bits) - 1)
            g_tab0 = jnp.stack(
                [bc(bbox_bits, jnp.float32)] + payload, axis=0
            )
            rows0 = g_tab0[:, src]
            bbox_c = bc(rows0[0], jnp.int32)
            payload_c = [rows0[1 + i] for i in range(len(payload))]
        else:
            # exact profile carries the f32 payload (11 rows: a wide
            # gather degrades sharply beyond ~5 components)
            csrt = jax.lax.sort(
                [ckey, bbox_bits] + payload, num_keys=1, is_stable=False
            )
            src = csrt[0][:l_pad] & ((1 << slot_bits) - 1)
            bbox_c = csrt[1][:l_pad]
            payload_c = [r[:l_pad] for r in csrt[2:]]
        live = jnp.arange(l_pad, dtype=jnp.int32) < n_live
        live_overflow = n_live > l_pad
        # per-path prefix budgets (count-ordered: path j's lanes are
        # exactly [0, n_live_paths[j])); without explicit buckets each
        # stripe stays a full max_live
        pref = [l_pad]
        for j in range(1, elem_paths):
            b = l_pad if live_buckets is None else live_buckets[j - 1]
            b = max(min((b // chunk) * chunk, l_pad), chunk)
            pref.append(b)
            live_overflow = live_overflow | (n_live_paths[j] > b)
    else:
        src = jnp.arange(s_n, dtype=jnp.int32)
        bbox_c = bbox_bits
        payload_c = payload
        live = ok
        live_overflow = jnp.bool_(False)
        pref = [l_pad] * elem_paths

    x0c = bbox_c & 0xFF
    y0c = (bbox_c >> 8) & 0xFF
    nxc = ((bbox_c >> 16) & 0xFF) + 1
    countc = jnp.where(live, nxc * (((bbox_c >> 24) & 0xFF) + 1), 0)

    # ---- sort key packing: (tile, stream slot), u32 order via sign flip
    # (the slot, not the compacted position, ranks pairs within a tile:
    # the count-classed compaction reorders lanes across classes) ----
    rank_bits = slot_bits
    tile_bits = max(int(np.ceil(np.log2(n_tiles + 1))), 1)
    packed_key = rank_bits + tile_bits <= 32

    # ---- paths k < elem_paths: first tiles, elementwise at own slot ----
    # enumeration k -> (x0 + k%nx, y0 + k//nx): k=0 is (x0, y0); k=1 is
    # (x0+1, y0) when nx >= 2 else (x0, y0+1); etc. Path j reads only its
    # pref[j] prefix (a full l_pad stripe when uncompacted). Each path
    # removes a whole rank of the k>=elem_paths scatter+gather expansion
    # (measured at 1080p: elem 4 cuts extras demand ~4x, 0.90M -> 0.22M).
    def _cq(rows, sl):
        """(cx, cy, qa, qb, qc) from payload rows (prefix slice sl),
        unpacking the fast profile's bf16-packed quadratic (the cull then
        tests the SAME coefficient values the raster kernel consumes)."""
        if exact:
            return (rows[0][sl], rows[1][sl], rows[2][sl], rows[3][sl],
                    rows[4][sl])
        u2 = bc(rows[2][sl], jnp.int32)
        hi = jnp.int32(-65536)  # 0xFFFF0000
        l11 = bc(u2 & hi, jnp.float32)
        l21 = bc(u2 << 16, jnp.float32)
        l22 = bc(bc(rows[3][sl], jnp.int32) & hi, jnp.float32)
        return (
            rows[0][sl], rows[1][sl],
            l11 * l11, l11 * l21, l21 * l21 + l22 * l22,
        )

    def _pz(rows, sl):
        """Kernel depth key from payload rows (u16-fixed-point-quantized
        in the fast profile — the same value and the same fp op chain as
        build_pair_table row 6, so cull and kernel can never disagree)."""
        if exact:
            return rows[5][sl]
        return (
            (bc(rows[3][sl], jnp.int32) & 0xFFFF).astype(jnp.float32)
            * jnp.float32(1.0 / 65535.0)
        )


    elem_tiles = []
    for j in range(elem_paths):
        b = pref[j]
        txj = x0c[:b] + j % nxc[:b]
        tyj = y0c[:b] + j // nxc[:b]
        tj = jnp.where(
            live[:b] & (countc[:b] >= j + 1), tyj * ntx + txj, n_tiles
        )
        if occ_zimg is not None:
            occ = _pz(payload_c, slice(0, b)) >= _zmax_lookup(
                txj, tyj, occ_zimg)
            tj = jnp.where(occ, n_tiles, tj)
        if cull_exact:
            tj = _cull_pair_tiles(
                tj, *_cq(payload_c, slice(0, b)),
                ntx=ntx, n_tiles=n_tiles, tile_wh=tile_wh)
        elem_tiles.append(tj)

    # ---- path k>=elem_paths: remaining extras via scatter+cummax ----
    # every contributor (count > elem_paths) is in the smallest prefix
    # when compacted, so the whole expansion runs on E lanes, not l_pad
    e_dom = pref[-1] if compacted else l_pad
    cnt2 = jnp.maximum(countc[:e_dom] - elem_paths, 0)
    offs2_incl = jnp.cumsum(cnt2, dtype=jnp.int32)
    offs2 = offs2_incl - cnt2
    total2 = offs2_incl[-1]
    overflow = (total2 > m2) | live_overflow
    rank_e = jnp.arange(e_dom, dtype=jnp.int32)
    # dead lanes get DISTINCT out-of-bounds indices (m2 + lane) so the
    # scatter can be a plain unique-indices set (no combiner) — measurably
    # faster than scatter-max on TPU
    scatter_to = jnp.where((cnt2 > 0) & (offs2 < m2), offs2, m2 + rank_e)
    mark = jnp.full(m2, -1, jnp.int32).at[scatter_to].set(
        rank_e, mode="drop", unique_indices=True
    )
    sp2 = jnp.maximum(jax.lax.cummax(mark), 0)
    # one (2+R)-component gather resolves everything the extras path
    # needs — incl. the owner's stream slot (src) for the joint-sort rank;
    # the owner's first-pair offset is NOT gathered — it equals the slot
    # where sp2 last changed, recovered by a cummax over the change marks
    g_tab = jnp.stack(
        [bc(bbox_c, jnp.float32), bc(src, jnp.float32)] + payload_c, axis=0
    )
    g_rows = g_tab[:, sp2]
    bb2 = bc(g_rows[0], jnp.int32)
    src2 = bc(g_rows[1], jnp.int32)
    pair_i2 = jnp.arange(m2, dtype=jnp.int32)
    run_start = jax.lax.cummax(jnp.where(mark >= 0, pair_i2, -1))
    live2 = pair_i2 < jnp.minimum(total2, m2)
    # k < elem_paths ride the stream elementwise
    k2 = pair_i2 - jnp.maximum(run_start, 0) + elem_paths
    nx2 = ((bb2 >> 16) & 0xFF) + 1
    tx2 = (bb2 & 0xFF) + k2 % nx2
    ty2 = ((bb2 >> 8) & 0xFF) + k2 // nx2
    tile2 = jnp.where(live2, ty2 * ntx + tx2, n_tiles)
    if occ_zimg is not None:
        occ2 = _pz(
            [g_rows[2 + i] for i in range(len(payload_c))], slice(None)
        ) >= _zmax_lookup(tx2, ty2, occ_zimg)
        tile2 = jnp.where(occ2, n_tiles, tile2)
    if cull_exact:
        tile2 = _cull_pair_tiles(
            tile2, *_cq([g_rows[2 + i] for i in range(len(payload_c))],
                        slice(None)),
            ntx=ntx, n_tiles=n_tiles, tile_wh=tile_wh)

    # ---- joint sort carrying payload (no post-sort gather) ----
    n_dom = sum(pref) + m2
    tiles_all = jnp.concatenate(elem_tiles + [tile2])
    ranks_all = jnp.concatenate(
        [src[:b] for b in pref] + [src2]
    )
    rows_all = [
        jnp.concatenate(
            [payload_c[i][:b] for b in pref] + [g_rows[2 + i]]
        )
        for i in range(len(payload_c))
    ]
    if packed_key:
        ukey = (
            tiles_all.astype(jnp.uint32) << rank_bits
        ) | ranks_all.astype(jnp.uint32)
        ikey = bc(ukey ^ jnp.uint32(0x80000000), jnp.int32)
        srt = jax.lax.sort([ikey] + rows_all, num_keys=1, is_stable=False)
        ukeys = bc(srt[0], jnp.uint32) ^ jnp.uint32(0x80000000)
        tile_of = (ukeys >> rank_bits).astype(jnp.int32)
        # the sorted key's low bits ARE the pair's stream slot — free
        src_of = (ukeys & jnp.uint32((1 << rank_bits) - 1)).astype(
            jnp.int32)
        rows_s = srt[1:]
    else:
        # (tile, rank) keys are unique, so the unstable 2-key sort is
        # deterministic (needed when n_tiles * S exceeds 32 bits, e.g. 4K)
        srt = jax.lax.sort(
            [tiles_all, ranks_all] + rows_all, num_keys=2, is_stable=False
        )
        tile_of = srt[0]
        src_of = srt[1]
        rows_s = srt[2:]

    dead = tile_of >= n_tiles
    if exact:
        cxg, cyg = rows_s[0], rows_s[1]
        qag, qbg, qcg = rows_s[2], rows_s[3], rows_s[4]
        zg = rows_s[5]
        rg, gg, bg = rows_s[6], rows_s[7], rows_s[8]
        ag = jnp.where(dead, 0.0, rows_s[9])
    else:
        # unpack POST-sort: fused element passes over the pair arrays
        cxg, cyg = rows_s[0], rows_s[1]
        u2 = bc(rows_s[2], jnp.int32)
        u3 = bc(rows_s[3], jnp.int32)
        u4 = bc(jnp.where(dead, 0.0, rows_s[4]), jnp.int32)
        hi = jnp.int32(-65536)  # 0xFFFF0000
        # Cholesky unpack (see the pack site above): PSD by construction
        l11 = bc(u2 & hi, jnp.float32)
        l21 = bc(u2 << 16, jnp.float32)
        l22 = bc(u3 & hi, jnp.float32)
        qag = l11 * l11
        qbg = l11 * l21
        qcg = l21 * l21 + l22 * l22
        zg = (u3 & 0xFFFF).astype(jnp.float32) * jnp.float32(1.0 / 65535.0)
        inv255 = jnp.float32(1.0 / 255.0)
        rg = (u4 & 0xFF).astype(jnp.float32) * inv255
        gg = ((u4 >> 8) & 0xFF).astype(jnp.float32) * inv255
        bg = ((u4 >> 16) & 0xFF).astype(jnp.float32) * inv255
        ag = ((u4 >> 24) & 0xFF).astype(jnp.float32) * inv255

    table = build_pair_table(
        tile_of, dead, cxg, cyg, qag, qbg, qcg, zg, rg, gg, bg, ag,
        ntx=ntx, n_tiles=n_tiles, tile_wh=tile_wh, src=src_of,
    )

    wl = build_worklist(tile_of, n_tiles=n_tiles, max_pairs=n_dom,
                        chunk=chunk, max_entries=max_entries)
    wl_overflow = wl.pop("wl_overflow")
    n_ranges = wl.pop("n_pairs_ranges")
    return dict(
        table=table,
        **wl,
        # true pair demand: sum(min(c, elem)) + sum(max(c-elem, 0)) = sum(c)
        n_pairs=jnp.sum(countc),
        # pairs surviving the ellipse/proxy/saturation culls AND the
        # per-tile run truncation = the raster's actual composited domain
        n_pairs_kept=n_ranges,
        n_extra=total2,
        n_live=n_live,
        n_live_paths=n_live_paths,
        overflow=overflow | wl_overflow,
        grid_info=(ntx, nty),
        **({"block_demand": block_demand} if emit_block_demand else {}),
    )
