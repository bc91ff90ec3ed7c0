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


def bin_pairs(p, *, image_wh, tile_wh, max_pairs: int, chunk: int):
    """p: projection outputs (front-to-back order). Static: image_wh (W,H),
    tile_wh (tw, th) pixels, max_pairs, chunk.

    Returns dict:
      table [16, max_pairs] f32 rows: k0..k5, z, 0, r, g, b, a, 0...
      entry_tile/entry_chunk/entry_start/entry_end/entry_first/entry_last
        [NE] i32 (worklist; NE = max_pairs//chunk + n_tiles)
      n_pairs i32, overflow bool
    """
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

    cx, cy = p["cx"], p["cy"]
    ex, ey = p["ext_x"], p["ext_y"]
    valid = p["valid"]

    x0 = jnp.clip(jnp.floor((cx - ex) / tw).astype(jnp.int32), 0, ntx - 1)
    x1 = jnp.clip(jnp.floor((cx + ex) / tw).astype(jnp.int32), 0, ntx - 1)
    y0 = jnp.clip(jnp.floor((cy - ey) / th).astype(jnp.int32), 0, nty - 1)
    y1 = jnp.clip(jnp.floor((cy + ey) / th).astype(jnp.int32), 0, nty - 1)
    onscreen = (cx + ex >= 0) & (cx - ex < w_img) & (cy + ey >= 0) & (cy - ey < h_img)
    ok = valid & onscreen
    nx = jnp.where(ok, x1 - x0 + 1, 0)
    ny = jnp.where(ok, y1 - y0 + 1, 0)
    count = nx * ny

    s_n = count.shape[0]
    offs_incl = jnp.cumsum(count, dtype=jnp.int32)
    offs = offs_incl - count  # exclusive
    total = offs_incl[-1]
    overflow = total > max_pairs

    # pair -> splat via scatter + cummax (a searchsorted over a MAX_PAIRS
    # table would lower to ~22 real gathers): scatter each contributing
    # splat's id and start at its first pair slot, then forward-fill by
    # cumulative max (ids and starts both increase along the pair axis)
    scatter_to = jnp.where((count > 0) & (offs < max_pairs), offs, max_pairs)
    splat_ids = jnp.arange(s_n, dtype=jnp.int32)
    mark = jnp.full(max_pairs, -1, jnp.int32).at[scatter_to].max(
        splat_ids, mode="drop"
    )
    sp = jnp.maximum(jax.lax.cummax(mark), 0)
    soff = jnp.zeros(max_pairs, jnp.int32).at[scatter_to].max(offs, mode="drop")
    soff = jax.lax.cummax(soff)
    # pack bbox into one i32 (x0 8b | y0 8b | nx 8b): ONE 1-component gather
    bbox_bits = x0 | (y0 << 8) | (jnp.maximum(nx, 1) << 16)
    bb = bbox_bits[sp]
    pair_i = jnp.arange(max_pairs, dtype=jnp.int32)
    k = pair_i - soff
    pair_ok = pair_i < jnp.minimum(total, max_pairs)
    nx_sp = (bb >> 16) & 0xFF
    tx = (bb & 0xFF) + k % nx_sp
    ty = ((bb >> 8) & 0xFF) + k // nx_sp
    tile = ty * ntx + tx
    key = jnp.where(pair_ok, tile, n_tiles).astype(jnp.int32)

    # stable sort by tile keeps front-to-back order within each tile;
    # the splat id rides along as payload (no post-sort index gather)
    sorted_key, sorted_sp = jax.lax.sort([key, sp], num_keys=1, is_stable=True)

    # ONE 12-component gather assembles the packed raster table
    k0, k1, k2, k3, k4, k5 = p["k"]
    cr, cg, cb, ca = p["color"]
    zero = jnp.zeros_like(k0)
    ptab = jnp.stack(
        [k0, k1, k2, k3, k4, k5, p["z"], zero, cr, cg, cb, ca], axis=0
    )
    rows = ptab[:, sorted_sp]
    dead = sorted_key >= n_tiles
    k5r = jnp.where(dead, -1e30, rows[5])
    car = jnp.where(dead, 0.0, rows[11])
    table = jnp.concatenate(
        [
            rows[0:5],
            k5r[None],
            rows[6:8],
            rows[8:11],
            car[None],
            jnp.zeros((4, max_pairs), jnp.float32),
        ],
        axis=0,
    )

    # per-tile ranges in the sorted array
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
        table=table,
        entry_tf=entry_tf,
        entry_chunk=entry_chunk,
        range_start=r_start,
        range_end=r_end,
        n_pairs=total,
        overflow=overflow,
        grid_info=(ntx, nty),
    )
