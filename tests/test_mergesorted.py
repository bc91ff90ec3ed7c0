"""Tests for the Pallas sorted-merge primitive (benchmarks/mergesorted.py):
merge-path splits, pairwise bitonic merge, and the k-way tournament, all
against NumPy merges with payload-association checks.

The primitive is parked in benchmarks/ (not ops/): lax.sort at the real
pair-table domain measures 5.0 ms, so the merge's upside is < 5 ms/frame
(PERFORMANCE.md). These tests keep it correct while parked."""

import os
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"),
)
import mergesorted as ms  # noqa: E402


def _table(keys):
    """[3, N] table: row 0 = i32 keys bitcast f32; rows 1-2 = payloads
    derived from the key so association errors are detectable."""
    k = np.asarray(keys, np.int32)
    row0 = k.view(np.float32)
    row1 = (k.astype(np.float64) * 0.5).astype(np.float32)
    row2 = (k.astype(np.float64) * -3.0 + 7.0).astype(np.float32)
    return jnp.asarray(np.stack([row0, row1, row2]))


def _split_unique(rng, n_total, k):
    keys = rng.choice(np.int64(1) << 30, size=n_total, replace=False)
    keys = keys.astype(np.int32)
    parts = np.array_split(rng.permutation(keys), k)
    return [np.sort(p) for p in parts]


def _check_merged(out, all_keys):
    out = np.asarray(out)
    want = np.sort(np.asarray(all_keys, np.int32))
    got = out[0, : want.shape[0]].view(np.float32).view(np.int32)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_allclose(
        out[1, : want.shape[0]], want.astype(np.float64) * 0.5, rtol=1e-6)
    np.testing.assert_allclose(
        out[2, : want.shape[0]], want.astype(np.float64) * -3.0 + 7.0,
        rtol=1e-5, atol=1e-4)
    # padded tail is sentinel keys
    tail = out[0, want.shape[0]:].view(np.float32).view(np.int32)
    assert (tail == ms.SENTINEL).all()


def test_merge_path_splits_match_numpy():
    rng = np.random.default_rng(0)
    a, b = _split_unique(rng, 3000, 2)
    block = 256
    n_blocks = -(-(a.size + b.size) // block)
    splits = np.asarray(ms.merge_path_splits(
        jnp.asarray(a), jnp.asarray(b), block=block, n_blocks=n_blocks))
    merged_src = np.argsort(np.concatenate([a, b]), kind="stable") < a.size
    cum_a = np.concatenate([[0], np.cumsum(merged_src)])
    for bi in range(n_blocks):
        m = min(bi * block, a.size + b.size)
        assert splits[bi] == cum_a[m], (bi, splits[bi], cum_a[m])


@pytest.mark.parametrize("na,nb", [(1024, 1024), (3000, 777), (64, 4000)])
def test_merge_pair_matches_numpy(na, nb):
    rng = np.random.default_rng(na * 31 + nb)
    keys = rng.choice(np.int64(1) << 30, size=na + nb, replace=False)
    keys = keys.astype(np.int32)
    a = np.sort(keys[:na])
    b = np.sort(keys[na:])
    out = ms.merge_sorted_pair(
        _table(a), _table(b), block=512, interpret=True)
    _check_merged(out, keys)


def test_merge_pair_negative_keys():
    """Sign-flip-packed binning keys span the full i32 range."""
    rng = np.random.default_rng(9)
    keys = (rng.choice(np.int64(1) << 31, size=2048, replace=False)
            - (np.int64(1) << 30)).astype(np.int32)
    a = np.sort(keys[:900])
    b = np.sort(keys[900:])
    out = ms.merge_sorted_pair(_table(a), _table(b), block=256,
                               interpret=True)
    _check_merged(out, keys)


def test_merge_pair_gap_free_window():
    """block=128 -> window 2*(128+128) = 512 is exactly a power of two:
    the kernel's sentinel middle gap is empty (the production block=1920
    shape), so the rotate-excision path is exercised without the gap."""
    rng = np.random.default_rng(77)
    keys = rng.choice(np.int64(1) << 30, size=1500, replace=False)
    keys = keys.astype(np.int32)
    a = np.sort(keys[:640])
    b = np.sort(keys[640:])
    out = ms.merge_sorted_pair(_table(a), _table(b), block=128,
                               interpret=True)
    _check_merged(out, keys)


@pytest.mark.parametrize("k", [3, 5])
def test_merge_tournament(k):
    rng = np.random.default_rng(k)
    parts = _split_unique(rng, 4096 + 123 * k, k)
    out = ms.merge_sorted([_table(p) for p in parts], block=512,
                          interpret=True)
    _check_merged(out, np.concatenate(parts))
