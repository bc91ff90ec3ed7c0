"""The C++ sorters must agree exactly with the NumPy fallback (and both with
the reference counting-sort semantics: bucketize, stable ascending, reverse)."""

import importlib
import os

import numpy as np
import pytest

import gswt_renderer_tpu.native as native


def _ref_counting_sort(raw_depth):
    """Direct transcription of scene.rs:537-583 in slow Python."""
    n = len(raw_depth)
    min_d, max_d = int(raw_depth.min()), int(raw_depth.max())
    size16 = 65536
    inv = (size16 - 1) / np.float32(max_d - min_d) if max_d != min_d else np.float32(0)
    buckets = []
    for d in raw_depth:
        b = int(np.floor(np.float32(d - min_d) * np.float32(inv)))
        buckets.append(min(max(b, 0), size16 - 1))
    counts = [0] * size16
    for b in buckets:
        counts[b] += 1
    starts = [0] * size16
    for i in range(1, size16):
        starts[i] = starts[i - 1] + counts[i - 1]
    out = [0] * n
    for i, b in enumerate(buckets):
        out[starts[b]] = i
        starts[b] += 1
    return np.array(out[::-1], np.uint32)


def test_native_built():
    assert native.HAVE_NATIVE, "C++ host runtime failed to build"


def test_depth_keys_match_formula(rng):
    f = rng.normal(scale=10, size=(1000, 8)).astype(np.float32)
    vp_z = rng.normal(size=3).astype(np.float32)
    got = native.depth_keys(f, vp_z)
    expect = np.trunc(
        ((f[:, :3] @ vp_z) * np.float32(4096.0)).astype(np.float64)
    ).astype(np.int32)
    assert np.array_equal(got, expect)


def test_counting_sort_vs_reference(rng):
    raw = rng.integers(-(10**6), 10**6, 5000).astype(np.int32)
    got = native.counting_sort(raw)
    expect = _ref_counting_sort(raw)
    assert np.array_equal(got, expect)
    # equal depths everywhere
    raw2 = np.full(100, 42, np.int32)
    got2 = native.counting_sort(raw2)
    assert np.array_equal(np.sort(got2), np.arange(100))


def test_counting_sort_orders_back_to_front(rng):
    raw = rng.integers(-(10**6), 10**6, 3000).astype(np.int32)
    order = native.counting_sort(raw)
    d = raw[order].astype(np.int64)
    # bucketized depths must be non-increasing along the output
    min_d, max_d = raw.min(), raw.max()
    inv = np.float32(65535) / np.float32(np.int32(max_d - min_d))
    b = np.clip(np.floor((d - min_d).astype(np.float32) * inv), 0, 65535)
    assert np.all(np.diff(b) <= 0)


def test_merge_sort_matches_single_when_one_segment(rng):
    raw = rng.integers(-1000, 1000, 2048).astype(np.int32)
    seg_id, idx = native.counting_sort_merge(raw, np.array([0, 2048], np.int64))
    single = native.counting_sort(raw)
    assert np.all(seg_id == 0)
    assert np.array_equal(idx, single)


def test_merge_sort_multi_segment(rng):
    a = rng.integers(-500, 500, 700).astype(np.int32)
    b = rng.integers(-500, 500, 300).astype(np.int32)
    concat = np.concatenate([a, b])
    seg_id, idx = native.counting_sort_merge(concat, np.array([0, 700, 1000], np.int64))
    # same multiset of (seg, idx)
    assert sorted(zip(seg_id.tolist(), idx.tolist())) == sorted(
        [(0, i) for i in range(700)] + [(1, i) for i in range(300)]
    )
    # global bucket order non-increasing
    flat = np.where(seg_id == 0, idx, 700 + idx)
    d = concat[flat]
    min_d, max_d = concat.min(), concat.max()
    inv = np.float32(65535) / np.float32(np.int32(max_d - min_d))
    buck = np.clip(np.floor((d - min_d).astype(np.float32) * inv), 0, 65535)
    assert np.all(np.diff(buck) <= 0)


def test_numpy_fallback_agrees(rng, monkeypatch):
    raw = rng.integers(-(10**5), 10**5, 4000).astype(np.int32)
    displ = np.array([0, 1500, 4000], np.int64)
    got_native = native.counting_sort_merge(raw, displ)
    got_sort = native.counting_sort(raw)
    monkeypatch.setattr(native, "HAVE_NATIVE", False)
    got_np = native.counting_sort_merge(raw, displ)
    got_np_sort = native.counting_sort(raw)
    assert np.array_equal(got_native[0], got_np[0])
    assert np.array_equal(got_native[1], got_np[1])
    assert np.array_equal(got_sort, got_np_sort)


def test_gather_and_lookup(rng):
    base = rng.integers(0, 2**31, 100).astype(np.uint32)
    offsets = np.array([0, 40], np.uint32)
    seg = rng.integers(0, 2, 50).astype(np.uint32)
    idx = rng.integers(0, 40, 50).astype(np.uint32)
    got = native.gather_offset_u32(base, seg, idx, offsets)
    assert np.array_equal(got, base[offsets[seg] + idx])
    table = np.array([7, 9], np.uint32)
    assert np.array_equal(native.lookup_u32(table, seg), table[seg])
