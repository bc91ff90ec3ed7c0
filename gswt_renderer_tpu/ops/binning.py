"""Tile binning: expand projected splats into (image-tile, splat) pairs,
order them, and emit a chunk worklist for the Pallas rasterizer.

The wgpu reference rasterizes via instanced quads; the TPU equivalent is the
standard tile-binned compositor: each splat lands in every (tile_h x tile_w)
pixel block its bbox overlaps, and within a tile splats keep front-to-back
stream order so ordered alpha blending is exact.

Performance shape (XLA gathers cost per *index*, sorts are fast):
- pair -> splat resolution is a searchsorted + ONE 4-component gather;
- the tile ordering is a single stable `lax.sort` carrying the splat id;
- the raster inputs are ONE [16, P] packed table built by ONE 12-component
  gather along the sorted order;
- there is NO chunk-aligned re-layout: the kernel consumes fixed CHUNK-sized
  slices of the sorted array directly, and a worklist entry (tile, chunk,
  range) masks the pairs that belong to other tiles at run boundaries.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


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


def build_worklist(sorted_key, *, n_tiles, max_pairs: int, chunk: int):
    """Per-tile ranges + the (tile, chunk) worklist for the Pallas grid."""
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

    ei = jnp.arange(ne_max, dtype=jnp.int32)
    t_of_e = jnp.searchsorted(e_offs, ei, side="right").astype(jnp.int32) - 1
    t_of_e = jnp.clip(t_of_e, 0, n_tiles - 1)
    live = ei < total_entries
    rank = ei - e_offs[t_of_e]
    entry_tile = jnp.where(live, t_of_e, n_tiles - 1).astype(jnp.int32)
    entry_chunk = jnp.where(live, c0[t_of_e] + rank, 0).astype(jnp.int32)
    entry_first = live & (rank == 0)
    entry_last = live & (rank == n_entries_tile[t_of_e] - 1)
    # pack (tile | first | last) into one i32 prefetch array: SMEM holds at
    # most ~1 MB of scalar-prefetch data, so the worklist is 2 per-entry
    # arrays + 2 per-tile range arrays
    entry_tf = (
        entry_tile
        | (entry_first.astype(jnp.int32) << 24)
        | (entry_last.astype(jnp.int32) << 25)
    )
    # dead entries: mask everything via empty range (start == end == 0)
    r_start = jnp.where(length > 0, range_start, 0).astype(jnp.int32)
    r_end = jnp.where(length > 0, range_end, 0).astype(jnp.int32)
    return dict(
        entry_tf=entry_tf,
        entry_chunk=entry_chunk,
        range_start=r_start,
        range_end=r_end,
    )


def build_pair_table(sorted_key, dead, cx, cy, qa, qb, qc, z, r, g, b, a, *,
                     ntx, n_tiles, tile_wh):
    """Assemble the [16, P] raster table with the exponent quadratic
    RECENTERED to each pair's raster-tile origin:

      e(u, v) = k0 u^2 + k1 uv + k2 v^2 + k3 u + k4 v + k5,   (u, v) local

    algebraically identical to the global monomial form but with operand
    magnitudes bounded by the tile size instead of the image size — the
    raster matmul can then run reduced-precision without breaking the
    exponent, and f32 rounding vs the per-pixel oracle math shrinks."""
    tw, th = tile_wh
    tile_c = jnp.minimum(sorted_key, n_tiles - 1)
    ox = (tile_c % ntx * tw).astype(jnp.float32)
    oy = (tile_c // ntx * th).astype(jnp.float32)
    dx = cx - ox
    dy = cy - oy
    av = qa * dx + qb * dy
    bv = qb * dx + qc * dy
    k5 = jnp.where(dead, -1e30, -(dx * av + dy * bv))
    return jnp.stack(
        [
            -qa, -2.0 * qb, -qc, 2.0 * av, 2.0 * bv, k5,
            z, jnp.zeros_like(z), r, g, b, a,
        ]
        + [jnp.zeros_like(z)] * 4,
        axis=0,
    )


def bin_pairs(p, *, image_wh, tile_wh, max_pairs: int, chunk: int,
              exact: bool = True):
    """p: projection outputs (front-to-back order). Static: image_wh (W,H),
    tile_wh (tw, th) pixels, max_pairs, chunk, exact.

    Returns dict:
      table — exact: [16, max_pairs] f32 rows k0..k5, z, 0, r, g, b, a, 0...
              fast:  [5, max_pairs] packed rows cx, cy, qa|qb (bf16 pair),
              qc|z (bf16 pair), rgba (4xu8); the raster kernel reconstructs
              k0..k5 from (q, center) — exact algebra, so the only deviation
              is the bf16/u8 quantization (PARITY.md #8). 5 gathered
              components instead of 11 on the hottest gather of the frame.
      entry_tile/entry_chunk/entry_start/entry_end/entry_first/entry_last
        [NE] i32 (worklist; NE = max_pairs//chunk + n_tiles)
      n_pairs i32, overflow bool
    """
    w_img, h_img = image_wh
    tw, th = tile_wh
    ntx, nty, n_tiles = grid_dims(image_wh, tile_wh)

    cx, cy = p["cx"], p["cy"]
    ex, ey = p["ext_x"], p["ext_y"]
    valid = p["valid"]

    x0 = jnp.clip(jnp.floor((cx - ex) / tw).astype(jnp.int32), 0, ntx - 1)
    x1 = jnp.clip(jnp.floor((cx + ex) / tw).astype(jnp.int32), 0, ntx - 1)
    y0 = jnp.clip(jnp.floor((cy - ey) / th).astype(jnp.int32), 0, nty - 1)
    y1 = jnp.clip(jnp.floor((cy + ey) / th).astype(jnp.int32), 0, nty - 1)
    onscreen = (cx + ex >= 0) & (cx - ex < w_img) & (cy + ey >= 0) & (cy - ey < h_img)
    ok = valid & onscreen
    sorted_key, sorted_sp, total, overflow = expand_bboxes(
        x0, x1, y0, y1, ok, ntx=ntx, n_tiles=n_tiles, max_pairs=max_pairs
    )
    dead = sorted_key >= n_tiles
    bc = jax.lax.bitcast_convert_type
    cr, cg, cb, ca = p["color"]
    qa, qb, qc = p["q"]

    if exact:
        # ONE 10-component f32 gather assembles the raster inputs
        ptab = jnp.stack(
            [p["cx"], p["cy"], qa, qb, qc, p["z"], cr, cg, cb, ca], axis=0
        )
        rows = ptab[:, sorted_sp]
        cxg, cyg = rows[0], rows[1]
        qag, qbg, qcg = rows[2], rows[3], rows[4]
        zg = rows[5]
        rg, gg, bg = rows[6], rows[7], rows[8]
        ag = jnp.where(dead, 0.0, rows[9])
    else:
        # packed 5-row table: a bf16 is the top 16 bits of its f32
        def bf16_hi(x):
            return bc(x.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)

        qab = bc((bf16_hi(qa) << 16) | bf16_hi(qb), jnp.float32)
        qcz = bc((bf16_hi(qc) << 16) | bf16_hi(p["z"]), jnp.float32)

        def u8(x):
            return jnp.round(
                jnp.clip(jnp.nan_to_num(x), 0.0, 1.0) * 255.0
            ).astype(jnp.uint32)

        rgba = bc(
            u8(cr) | (u8(cg) << 8) | (u8(cb) << 16) | (u8(ca) << 24),
            jnp.float32,
        )
        ptab = jnp.stack([p["cx"], p["cy"], qab, qcz, rgba], axis=0)
        rows = ptab[:, sorted_sp]
        # unpack POST-gather: a handful of fused element passes over the
        # pair arrays (~BW-free), so the raster kernel consumes the same
        # aligned 16-row f32 table as exact mode (a 5-row kernel block
        # mis-tiles VMEM's (8,128) and cost +30ms/frame in kernel DMA)
        cxg = rows[0]
        cyg = rows[1]
        u2 = bc(rows[2], jnp.int32)
        u3 = bc(rows[3], jnp.int32)
        u4 = bc(jnp.where(dead, 0.0, rows[4]), jnp.int32)
        hi = jnp.int32(-65536)  # 0xFFFF0000
        qag = bc(u2 & hi, jnp.float32)
        qbg = bc(u2 << 16, jnp.float32)
        qcg = bc(u3 & hi, jnp.float32)
        zg = bc(u3 << 16, jnp.float32)
        inv255 = jnp.float32(1.0 / 255.0)
        rg = (u4 & 0xFF).astype(jnp.float32) * inv255
        gg = ((u4 >> 8) & 0xFF).astype(jnp.float32) * inv255
        bg = ((u4 >> 16) & 0xFF).astype(jnp.float32) * inv255
        ag = ((u4 >> 24) & 0xFF).astype(jnp.float32) * inv255

    table = build_pair_table(
        sorted_key, dead, cxg, cyg, qag, qbg, qcg, zg, rg, gg, bg, ag,
        ntx=ntx, n_tiles=n_tiles, tile_wh=tile_wh,
    )

    wl = build_worklist(sorted_key, n_tiles=n_tiles, max_pairs=max_pairs,
                        chunk=chunk)
    return dict(
        table=table,
        **wl,
        n_pairs=total,
        overflow=overflow,
        grid_info=(ntx, nty),
    )
