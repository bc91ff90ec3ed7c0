"""Unit tests for the adaptive binning buckets and the gather-free height
sampler introduced with the live-compaction binning design:

- live-splat compaction (ops/binning.bin_pairs max_live) must be invisible
  to the output and must flag + grow on overflow;
- the worklist-entry bucket must flag overflow when it truncates tiles;
- _smallmap_resized_bilinear must match the reference chain
  (bicubic resize -> bilinear fetch) bit-for-bit up to f32 rounding.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from gswt_renderer_tpu.ops import binning  # noqa: E402
from gswt_renderer_tpu.ops.project import (  # noqa: E402
    _bilinear_wrap4,
    _smallmap_resized_bilinear,
    pack_tex4,
)
from gswt_renderer_tpu.tiles import surface as surf  # noqa: E402


def _proj(n, seed=0, w=256, h=128):
    """Synthetic projection outputs: n splats scattered over a w x h image."""
    rng = np.random.RandomState(seed)
    cx = rng.uniform(-20, w + 20, n).astype(np.float32)
    cy = rng.uniform(-20, h + 20, n).astype(np.float32)
    ext = rng.uniform(1.0, 40.0, (2, n)).astype(np.float32)
    q = rng.uniform(0.001, 0.1, (3, n)).astype(np.float32)
    q[1] *= 0.1  # keep PSD-ish
    col = rng.uniform(0.0, 1.0, (4, n)).astype(np.float32)
    z = rng.uniform(0.0, 1.0, n).astype(np.float32)
    valid = rng.rand(n) > 0.6  # mostly-dead stream, like the real one
    return dict(
        cx=jnp.asarray(cx), cy=jnp.asarray(cy),
        ext_x=jnp.asarray(ext[0]), ext_y=jnp.asarray(ext[1]),
        q=tuple(jnp.asarray(qi) for qi in q),
        color=tuple(jnp.asarray(ci) for ci in col),
        z=jnp.asarray(z), valid=jnp.asarray(valid),
    )


def _run(p, **kw):
    kw.setdefault("image_wh", (256, 128))
    kw.setdefault("tile_wh", (64, 32))
    kw.setdefault("max_pairs", 1 << 14)
    kw.setdefault("chunk", 128)
    kw.setdefault("exact", True)
    return binning.bin_pairs(p, **kw)


def _live_table_rows(b):
    """Extract (tile, k-rows) for live pairs in sorted order, as a
    canonical comparable array."""
    table = np.asarray(b["table"])
    rs = np.asarray(b["range_start"])
    re_ = np.asarray(b["range_end"])
    rows = []
    for t in range(rs.shape[0]):
        for j in range(rs[t], re_[t]):
            rows.append((t, *table[:12, j]))
    return np.asarray(rows, np.float32)


def test_compaction_is_invisible():
    p = _proj(4096)
    full = _run(p, max_live=None)
    comp = _run(p, max_live=2048)  # > n_live, < s_n
    assert not bool(comp["overflow"])
    assert int(full["n_pairs"]) == int(comp["n_pairs"])
    a = _live_table_rows(full)
    b = _live_table_rows(comp)
    np.testing.assert_array_equal(a, b)


def test_compaction_overflow_flagged():
    p = _proj(4096)
    # n_live counts valid AND onscreen splats (same test as bin_pairs)
    cx, cy = np.asarray(p["cx"]), np.asarray(p["cy"])
    ex, ey = np.asarray(p["ext_x"]), np.asarray(p["ext_y"])
    on = (cx + ex >= 0) & (cx - ex < 256) & (cy + ey >= 0) & (cy - ey < 128)
    n_live = int((np.asarray(p["valid"]) & on).sum())
    tight = _run(p, max_live=512)  # < n_live -> must flag
    assert n_live > 512
    assert bool(tight["overflow"])
    assert int(tight["n_live"]) == n_live  # true demand reported


def test_worklist_entry_overflow_flagged():
    p = _proj(4096)
    full = _run(p, max_live=2048)
    ne = int(full["n_entries"])
    cut = _run(p, max_live=2048, max_entries=max(ne // 2, 8))
    assert bool(cut["overflow"])
    assert int(cut["n_entries"]) == ne  # true demand reported


def test_smallmap_sampler_matches_resized_bilinear():
    rng = np.random.RandomState(3)
    w_src, h_src = 10, 10
    reso = 256  # smaller resize for test speed; same code path
    src = rng.uniform(-1, 1, h_src * w_src).astype(np.float32)
    big = surf.map_resize(src, (w_src, h_src), (reso, reso))
    hm4 = pack_tex4(big, reso, reso)
    n = 3000
    hu = rng.uniform(-0.3, 1.3, n).astype(np.float32)
    hv = rng.uniform(-0.3, 1.3, n).astype(np.float32)
    ref = np.asarray(
        _bilinear_wrap4(jnp.asarray(hm4), reso, reso,
                        jnp.asarray(hu), jnp.asarray(hv))
    )
    h, dx, dy = _smallmap_resized_bilinear(
        jnp.asarray(src.reshape(h_src, w_src)),
        jnp.asarray(hu), jnp.asarray(hv), reso, reso,
    )
    np.testing.assert_allclose(np.asarray(h), ref, atol=2e-6)
    # gradient must equal the analytic bilinear-patch derivative of the
    # resized map (the fast profile's gradient, PARITY.md #8)
    x = hu * reso - 0.5
    y = hv * reso - 0.5
    x0 = np.floor(x)
    y0 = np.floor(y)
    tx, ty = x - x0, y - y0
    base = (y0.astype(np.int64) % reso) * reso + (x0.astype(np.int64) % reso)
    i00, i10, i01, i11 = np.asarray(hm4)[:, base]
    np.testing.assert_allclose(
        np.asarray(dx), (i10 - i00) * (1 - ty) + (i11 - i01) * ty, atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(dy), (i01 - i00) * (1 - tx) + (i11 - i10) * tx, atol=2e-6
    )


@pytest.mark.parametrize("elem", [1, 3, 4, 6])
def test_elem_paths_split_is_invisible(elem):
    """Moving tiles between the elementwise paths and the scatter extras
    path (bin_pairs elem_paths) must not change any tile's pair sequence;
    only n_extra (the extras-bucket demand) may differ."""
    p = _proj(4096, seed=7)
    base = _run(p, max_live=2048)
    alt = _run(p, max_live=2048, elem_paths=elem)
    assert not bool(alt["overflow"])
    assert int(base["n_pairs"]) == int(alt["n_pairs"])
    assert int(alt["n_extra"]) <= int(base["n_extra"]) or elem < 2
    np.testing.assert_array_equal(
        _live_table_rows(base), _live_table_rows(alt)
    )


@pytest.mark.parametrize("elem", [2, 4])
def test_live_path_buckets_invisible_and_flagged(elem):
    """Count-classed per-path prefix budgets (bin_pairs live_buckets):
    budgets >= the per-path demand must be invisible to the output; a
    budget below demand must flag overflow and still report the true
    n_live_paths demand."""
    p = _proj(4096, seed=11)
    base = _run(p, max_live=2048, elem_paths=elem)
    lp = np.asarray(base["n_live_paths"])
    assert lp[0] == int(base["n_live"])
    assert all(lp[j] >= lp[j + 1] for j in range(len(lp) - 1))
    # generous buckets: identical output
    gen = tuple(int(-(-max(int(lp[j]), 1) // 128) * 128) for j in range(1, elem))
    tight = _run(p, max_live=2048, elem_paths=elem, live_buckets=gen)
    assert not bool(tight["overflow"])
    np.testing.assert_array_equal(
        _live_table_rows(base), _live_table_rows(tight)
    )
    # a path bucket below demand must flag (path 1 demand > 128 here)
    assert int(lp[1]) > 128
    under = _run(p, max_live=2048, elem_paths=elem,
                 live_buckets=(128,) * (elem - 1))
    assert bool(under["overflow"])
    np.testing.assert_array_equal(np.asarray(under["n_live_paths"]), lp)


def test_unpacked_two_key_sort_matches_enumeration():
    """4K-scale grids overflow the single-u32 (tile, slot) key packing
    (rank_bits + tile_bits > 32) and bin_pairs falls back to the 2-key
    sort (binning.py packed_key=False). Force that branch — 4096x4096 at
    16x16 tiles (256x256 grid = 17 tile bits) with a 2^17 stream (17 slot
    bits) — and pin the sorted pair sequence against a NumPy enumeration:
    per-tile counts and the exact front-to-back z order."""
    s_n = 1 << 17
    w, h, tw, th = 4096, 4096, 16, 16
    ntx = w // tw
    n_tiles = ntx * (h // th)
    assert int(np.ceil(np.log2(s_n))) + int(np.ceil(np.log2(n_tiles + 1))) > 32

    rng = np.random.RandomState(5)
    cx = rng.uniform(-30, w + 30, s_n).astype(np.float32)
    cy = rng.uniform(-30, h + 30, s_n).astype(np.float32)
    ext = rng.uniform(1.0, 20.0, (2, s_n)).astype(np.float32)
    q = rng.uniform(0.001, 0.1, (3, s_n)).astype(np.float32)
    q[1] *= 0.1
    col = rng.uniform(0.0, 1.0, (4, s_n)).astype(np.float32)
    z = ((np.arange(s_n) + 1.0) / (s_n + 2.0)).astype(np.float32)  # unique
    valid = rng.rand(s_n) < 0.05
    p = dict(
        cx=jnp.asarray(cx), cy=jnp.asarray(cy),
        ext_x=jnp.asarray(ext[0]), ext_y=jnp.asarray(ext[1]),
        q=tuple(jnp.asarray(qi) for qi in q),
        color=tuple(jnp.asarray(ci) for ci in col),
        z=jnp.asarray(z), valid=jnp.asarray(valid),
    )
    b = binning.bin_pairs(
        p, image_wh=(w, h), tile_wh=(tw, th), max_pairs=1 << 16,
        chunk=128, exact=True, max_live=1 << 13, elem_paths=4,
    )
    assert not bool(b["overflow"])

    # NumPy oracle: enumerate (tile, slot) pairs, sort by (tile, slot)
    x0 = np.clip(np.floor((cx - ext[0]) / tw), 0, ntx - 1).astype(np.int64)
    x1 = np.clip(np.floor((cx + ext[0]) / tw), 0, ntx - 1).astype(np.int64)
    y0 = np.clip(np.floor((cy - ext[1]) / th), 0, h // th - 1).astype(np.int64)
    y1 = np.clip(np.floor((cy + ext[1]) / th), 0, h // th - 1).astype(np.int64)
    on = (cx + ext[0] >= 0) & (cx - ext[0] < w) & (cy + ext[1] >= 0) & (cy - ext[1] < h)
    tiles, slots = [], []
    for s in np.nonzero(valid & on)[0]:
        for ty in range(y0[s], y1[s] + 1):
            for tx in range(x0[s], x1[s] + 1):
                tiles.append(ty * ntx + tx)
                slots.append(s)
    tiles = np.asarray(tiles, np.int64)
    slots = np.asarray(slots, np.int64)
    order = np.lexsort((slots, tiles))
    n_pairs = tiles.shape[0]
    assert int(b["n_pairs"]) == n_pairs

    # per-tile counts match
    rs = np.asarray(b["range_start"]); re_ = np.asarray(b["range_end"])
    counts = np.bincount(tiles, minlength=n_tiles)
    np.testing.assert_array_equal(re_ - rs, counts)
    # sorted live pairs are the contiguous prefix of the table, in exact
    # (tile, slot) order: the z row identifies each pair's source splat
    z_got = np.asarray(b["table"])[6, :n_pairs]
    np.testing.assert_array_equal(z_got, z[slots[order]])


@pytest.mark.parametrize("exact", [True, False])
def test_cull_exact_pixel_identical(exact):
    """The exact ellipse-tile cull (bin_pairs cull_exact) removes only
    pairs whose quadratic cannot reach the exp(-4) cutoff at any pixel
    center of their tile, so the rasterized image must be identical up
    to f32 re-association: culled entries contribute exactly-zero weight
    (t == 1.0 multiplies are exact), but removing them shifts the
    blocked transmittance scan's group boundaries, so the surviving
    products associate differently (measured <= 3e-6 with the diff scan
    impl). The worklist must be strictly no larger. The synthetic
    stream's random ext values overshoot the ellipse, so a real cull
    fraction is exercised."""
    from gswt_renderer_tpu.ops import raster

    p = _proj(4096, seed=3)
    # strictly PSD quadratics so exponents are bounded like real splats
    qa, qb, qc = (np.asarray(x) for x in p["q"])
    qb = 0.5 * np.sqrt(qa * qc) * np.sign(qb)
    p["q"] = (jnp.asarray(qa), jnp.asarray(qb), jnp.asarray(qc))
    base = _run(p, max_live=2048, exact=exact)
    cull = _run(p, max_live=2048, exact=exact, cull_exact=True)
    assert int(cull["n_pairs"]) == int(base["n_pairs"])  # demand metric
    # the cull must actually remove pair mass on this stream
    rs_b = np.asarray(base["range_start"]); re_b = np.asarray(base["range_end"])
    rs_c = np.asarray(cull["range_start"]); re_c = np.asarray(cull["range_end"])
    assert (re_c - rs_c).sum() < (re_b - rs_b).sum()
    image_wh, tile_wh, chunk = (256, 128), (64, 32), 128
    n_tiles = 4 * 4
    depth = jnp.ones((n_tiles, 32 * 64), jnp.float32)
    out_b = np.asarray(raster.rasterize_pallas(
        base, depth, image_wh=image_wh, tile_wh=tile_wh, chunk=chunk,
        interpret=True, exact=True, use_depth=False))
    out_c = np.asarray(raster.rasterize_pallas(
        cull, depth, image_wh=image_wh, tile_wh=tile_wh, chunk=chunk,
        interpret=True, exact=True, use_depth=False))
    np.testing.assert_allclose(out_c, out_b, atol=1e-5)


def test_fast_quantization_keeps_degenerate_quadratics_psd():
    """Grazing-angle splats reach |qb|/sqrt(qa*qc) within 1e-7 of 1; naive
    bf16 rounding of (qa, qb, qc) tips ~half of those quadratics
    INDEFINITE, so the exponent GROWS along the bbox and one splat floods
    its tiles with inf/NaN (observed: out max 1.7e38, 7240 NaN pixels).
    The fast payload therefore packs the quadratic's Cholesky factors
    (binning.py) — PSD under any quantization. This pins the bounded
    behavior on the worst indefinite conic found by a 60k-point search."""
    from gswt_renderer_tpu.ops import raster

    def bf(x):
        return np.float32(
            jnp.asarray(np.float32(x)).astype(jnp.bfloat16).astype(jnp.float32)
        )

    rng = np.random.default_rng(7)
    best = None
    for _ in range(60000):
        sig_max = np.float32(rng.uniform(200, 1024))
        sig_min = np.float32(rng.uniform(0.45, 0.8))
        theta = rng.uniform(0, np.pi)
        l1 = np.float32(1.0) / (sig_max * sig_max)
        l2 = np.float32(1.0) / (sig_min * sig_min)
        c = np.float32(np.cos(theta))
        s = np.float32(np.sin(theta))
        qa = l1 * c * c + l2 * s * s
        qc = l1 * s * s + l2 * c * c
        qb = (l2 - l1) * s * c
        qa2, qb2, qc2 = bf(qa), bf(qb), bf(qc)
        eneg = (qa2 + qc2) / 2 - np.sqrt(((qa2 - qc2) / 2) ** 2 + qb2**2)
        if eneg < 0 and (best is None or eneg < best[0]):
            best = (float(eneg), qa, qb, qc, float(sig_max), float(s), float(c))
    assert best is not None and best[0] < -1e-3  # raw bf16 WOULD be indefinite
    _, qa, qb, qc, sig_max, s, c = best

    w, h, tw, th, chunk = 1024, 256, 64, 32, 64
    n = 64
    cx = np.full(n, 100.0, np.float32)
    cy = np.full(n, 128.0, np.float32)
    ext = np.zeros((2, n), np.float32)
    ext[0, 0] = 3.0 * sig_max * abs(c)
    ext[1, 0] = 3.0 * sig_max * abs(s)
    q = np.zeros((3, n), np.float32)
    q[0, 0], q[1, 0], q[2, 0] = qa, qb, qc
    q[0, 1:] = q[2, 1:] = 0.05
    col = np.full((4, n), 0.5, np.float32)
    z = np.linspace(0.1, 0.9, n).astype(np.float32)
    valid = np.zeros(n, bool)
    valid[0] = True
    p = dict(
        cx=jnp.asarray(cx), cy=jnp.asarray(cy),
        ext_x=jnp.asarray(ext[0]), ext_y=jnp.asarray(ext[1]),
        q=tuple(jnp.asarray(qi) for qi in q),
        color=tuple(jnp.asarray(ci) for ci in col),
        z=jnp.asarray(z), valid=jnp.asarray(valid),
    )
    b = binning.bin_pairs(
        p, image_wh=(w, h), tile_wh=(tw, th), max_pairs=1 << 13,
        chunk=chunk, exact=False,
    )
    ntx, nty = -(-w // tw), -(-h // th)
    depth = np.ones((ntx * nty, tw * th), np.float32)
    out = raster.rasterize_reference(
        {k: np.asarray(v) for k, v in b.items()}, depth,
        image_wh=(w, h), tile_wh=(tw, th), chunk=chunk,
    )
    assert np.isfinite(out).all(), f"{np.isnan(out).sum()} NaN pixels"
    assert out.max() <= 1.0 + 1e-3, f"flooded: max {out.max():.3g}"
