"""Joint randomized fuzz across binning x raster configuration space.

Each seeded case draws a random (image, tile shape, elem_paths, cull,
profile, tight-ish buckets, raster step) configuration and checks the
interactions the per-feature unit tests cannot see together:

- a random config's live pair rows must equal the loose trusted config's
  (exact profile; cull off) — compaction / elem-path / bucket interplay;
- in the FAST profile, pair ORDER is still exact: per-tile ranges match
  the loose config and the z sequence matches bf16(z) pairwise;
- the interpret-mode Pallas kernel (per-entry AND blocked step) matches
  the NumPy reference rasterizer on the same binned table.

GSWT_FUZZ_N overrides the case count (CI default keeps the suite fast;
the harness was run at N=60 standalone with zero failures).
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from gswt_renderer_tpu.ops import binning, raster  # noqa: E402

N_CASES = int(os.environ.get("GSWT_FUZZ_N", "4"))


def _proj(rng, n, w, h):
    cx = rng.uniform(-20, w + 20, n).astype(np.float32)
    cy = rng.uniform(-20, h + 20, n).astype(np.float32)
    ext = rng.uniform(0.5, 50.0, (2, n)).astype(np.float32)
    q = rng.uniform(0.001, 0.2, (3, n)).astype(np.float32)
    # strictly PSD like real splat quadratics: |qb| < sqrt(qa*qc)
    q[1] = (rng.uniform(-0.9, 0.9, n) * np.sqrt(q[0] * q[2])).astype(np.float32)
    col = rng.uniform(0.0, 1.0, (4, n)).astype(np.float32)
    col[3] = rng.uniform(0.01, 1.0, n)
    z = rng.permutation(n).astype(np.float32) / (n + 1.0) + 1e-4  # unique
    valid = rng.rand(n) > rng.uniform(0.2, 0.8)
    return dict(
        cx=jnp.asarray(cx), cy=jnp.asarray(cy),
        ext_x=jnp.asarray(ext[0]), ext_y=jnp.asarray(ext[1]),
        q=tuple(jnp.asarray(qi) for qi in q),
        color=tuple(jnp.asarray(ci) for ci in col),
        z=jnp.asarray(z), valid=jnp.asarray(valid),
    )


def _live_rows(b, rows=12):
    table = np.asarray(b["table"])
    rs = np.asarray(b["range_start"])
    re_ = np.asarray(b["range_end"])
    out = []
    for t in range(rs.shape[0]):
        for j in range(rs[t], re_[t]):
            out.append((t, *table[:rows, j]))
    return np.asarray(out, np.float32) if out else np.zeros((0, 1 + rows), np.float32)


@pytest.mark.parametrize("seed", range(3000, 3000 + N_CASES))
def test_joint_fuzz(seed):
    rng = np.random.RandomState(seed)
    w = int(rng.choice([96, 128, 200]))
    h = int(rng.choice([64, 96]))
    tw = int(rng.choice([16, 32, 64]))
    th = int(rng.choice([16, 32]))
    chunk = 64
    n = int(rng.choice([150, 300]))
    p = _proj(rng, n, w, h)
    base_kw = dict(image_wh=(w, h), tile_wh=(tw, th), max_pairs=1 << 13,
                   chunk=chunk, exact=True, elem_paths=2)
    b0 = binning.bin_pairs(p, **base_kw)
    assert not bool(b0["overflow"])
    rs0 = np.asarray(b0["range_start"])
    re0 = np.asarray(b0["range_end"])

    elem = int(rng.choice([1, 2, 3, 4, 6]))
    cull = bool(rng.rand() < 0.5)
    exact = bool(rng.rand() < 0.5)
    n_live0 = int(b0["n_live"])
    ml = max(chunk, int(np.ceil(n_live0 / chunk) * chunk)
             + int(rng.choice([0, chunk])))
    lb = None
    if elem > 1 and rng.rand() < 0.7:
        nlp = np.asarray(jax.device_get(
            binning.bin_pairs(p, **dict(base_kw, elem_paths=elem))["n_live_paths"]))
        lb = tuple(max(chunk, int(np.ceil(c / chunk) * chunk)) for c in nlp[1:elem])
    kw = dict(image_wh=(w, h), tile_wh=(tw, th), max_pairs=1 << 13,
              chunk=chunk, exact=exact, elem_paths=elem, max_live=ml,
              live_buckets=lb, cull_exact=cull)
    b1 = binning.bin_pairs(p, **kw)
    assert not bool(b1["overflow"]), kw
    if not cull:
        if exact:
            np.testing.assert_allclose(
                _live_rows(b0), _live_rows(b1), atol=1e-5,
                err_msg=f"live rows diverge: {kw}")
        else:
            # fast profile: same pairs in the same order (ranges equal), z
            # identifies each pair's source splat up to the u16 fixed-point
            # floor quantization (ops/binning.py pack site)
            rs1 = np.asarray(b1["range_start"])
            re1 = np.asarray(b1["range_end"])
            np.testing.assert_array_equal(re0 - rs0, re1 - rs1, err_msg=str(kw))
            n_pairs = int((re0 - rs0).sum())
            z0 = np.asarray(b0["table"])[6]
            z1 = np.asarray(b1["table"])[6]
            for t in np.nonzero(re0 > rs0)[0]:
                z_want = (
                    np.floor(np.clip(z0[rs0[t]:re0[t]], 0.0, 1.0)
                             * np.float32(65535.0)).astype(np.float32)
                    * np.float32(1.0 / 65535.0)
                )
                np.testing.assert_array_equal(z_want, z1[rs1[t]:re1[t]],
                                              err_msg=f"tile {t} {kw}")

    step = int(rng.choice([1, 4, 8]))
    ntx, nty = -(-w // tw), -(-h // th)
    depth = np.ones((ntx * nty, tw * th), np.float32)
    if rng.rand() < 0.5:
        depth = rng.uniform(0.3, 1.0, depth.shape).astype(np.float32)
    out_k = np.asarray(raster.rasterize_pallas(
        dict(b1), jnp.asarray(depth), image_wh=(w, h), tile_wh=(tw, th),
        chunk=chunk, interpret=True, exact=True, use_depth=True, step=step))
    out_r = raster.rasterize_reference(
        {k: np.asarray(v) for k, v in b1.items()}, depth,
        image_wh=(w, h), tile_wh=(tw, th), chunk=chunk)
    err = (np.abs(out_k - out_r) / np.maximum(1.0, np.abs(out_r))).max()
    assert err < 2e-3, f"raster diverges: {err} step={step} {kw}"
