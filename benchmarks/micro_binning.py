#!/usr/bin/env python
"""Microbenchmarks for the binning sub-ops at the headline pair scale.

Measures, at N=4.19M pairs / S=3.1M stream lanes:
  - scatter+cummax expansion (current)
  - 2-comp gather by sp (bbox_bits, offs)
  - stable sort [key, sp] (current) vs single packed key sort
  - 5-comp table gather by sorted_sp vs 4-comp packed
  - sort carrying payload rows directly (6-array sort)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _scalarize(out):
    leaves = jax.tree_util.tree_leaves(out)
    acc = jnp.float32(0)
    for x in leaves:
        acc += jnp.sum(x.astype(jnp.float32))
    return acc


def timeit(name, f, *a, n=6):
    # under the axon tunnel block_until_ready can return before execution;
    # device_get of a reduced scalar is the only reliable barrier
    jf = jax.jit(lambda *xs: _scalarize(f(*xs)))
    jax.device_get(jf(*a))
    ts = []
    for _ in range(n):
        t0 = time.time()
        jax.device_get(jf(*a))
        ts.append((time.time() - t0) * 1e3)
    print(f"  {name:44s} {np.median(ts):7.1f} ms  (incl ~25ms sync)")
    return np.median(ts)


def main():
    N = 4_194_304   # max_pairs bucket
    S = 3_145_728   # stream lanes
    key = np.random.default_rng(0)
    kk = np.sort(key.integers(0, 510, N).astype(np.int32))
    sp = np.sort(key.integers(0, S, N).astype(np.int32))
    counts = key.integers(0, 3, S).astype(np.int32)
    tab5 = np.random.rand(5, S).astype(np.float32)
    tab16 = np.random.rand(16, S).astype(np.float32)
    d_kk = jnp.asarray(kk)
    d_sp = jnp.asarray(sp)
    d_counts = jnp.asarray(counts)
    d_tab5 = jnp.asarray(tab5)
    d_keyr = jnp.asarray(key.integers(0, 510, N).astype(np.int32))

    print(f"N={N} pairs, S={S} lanes")

    def expansion(counts):
        offs_incl = jnp.cumsum(counts, dtype=jnp.int32)
        offs = offs_incl - counts
        scatter_to = jnp.where((counts > 0) & (offs < N), offs, N)
        prim_ids = jnp.arange(S, dtype=jnp.int32)
        mark = jnp.full(N, -1, jnp.int32).at[scatter_to].max(
            prim_ids, mode="drop"
        )
        return jnp.maximum(jax.lax.cummax(mark), 0)

    timeit("scatter+cummax expansion", expansion, d_counts)

    def gather2(sp, tab):
        bo = jnp.stack([jnp.arange(S, dtype=jnp.int32),
                        jnp.arange(S, dtype=jnp.int32) * 2], axis=0)
        return bo[:, sp]

    timeit("2-comp gather by sp", gather2, d_sp, d_tab5)

    def gather1(sp):
        t = jnp.arange(S, dtype=jnp.int32)
        return t[sp]

    timeit("1-comp gather by sp", gather1, d_sp)

    def sort2(key, sp):
        return jax.lax.sort([key, sp], num_keys=1, is_stable=True)

    timeit("stable sort [key, sp]", sort2, d_keyr, d_sp)

    def sort1(key, sp):
        packed = (key << 22) | sp
        out = jax.lax.sort([packed], num_keys=1, is_stable=False)[0]
        return out >> 22, out & ((1 << 22) - 1)

    timeit("packed single-key sort", sort1, d_keyr, d_sp)

    def gather5(sp, tab):
        return tab[:, sp]

    timeit("5-comp gather by sorted_sp", gather5, d_sp, d_tab5)

    def gather4(sp, tab):
        return tab[:4, :][:, sp]

    timeit("4-comp gather", gather4, d_sp, d_tab5)

    def gather16(sp, tab):
        return tab[:, sp]

    timeit("16-comp gather", gather16, d_sp, jnp.asarray(tab16))

    def sort6(key, c0, c1, c2, c3, c4):
        return jax.lax.sort([key, c0, c1, c2, c3, c4], num_keys=1,
                            is_stable=True)

    cs = [jnp.asarray(np.random.rand(N).astype(np.float32)) for _ in range(5)]
    timeit("6-array payload sort", sort6, d_keyr, *cs)

    # cumsum/cummax alone at N
    timeit("cummax @N", lambda x: jax.lax.cummax(x), d_sp)
    timeit("cumsum @S", lambda x: jnp.cumsum(x), d_counts)

    # scatter alone
    def scat(counts):
        offs = jnp.cumsum(counts, dtype=jnp.int32) - counts
        scatter_to = jnp.where((counts > 0) & (offs < N), offs, N)
        prim_ids = jnp.arange(S, dtype=jnp.int32)
        return jnp.full(N, -1, jnp.int32).at[scatter_to].max(
            prim_ids, mode="drop"
        )

    timeit("scatter-only (cumsum+scatter)", scat, d_counts)


if __name__ == "__main__":
    main()
