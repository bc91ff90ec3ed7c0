#!/usr/bin/env python
"""A/B the per-lane tile-zmax lookup strategies for the proxy-depth
occlusion cull (ops/binning.py):

  take     — jnp.take(zmax_flat, ty*ntx+tx): one element gather per lane
  onehot   — factored one-hot on the MXU: onehot(ty) @ zimg -> [L, ntx]
             row, then masked reduce over tx (no gather at all)
  onehot_b — same with bf16 matmul inputs (exact: one-hot rows copy
             bf16(zimg) values, but zimg must then be quantized
             conservatively by the caller)

2026-08-19 on-chip: take runs at ~0.2 ns/lane below ~2M lanes (XLA keeps
the 1020-entry table on-chip) but falls off a cliff to the ~6 ns/lane HBM
gather rate above it; onehot is flat ~2 ms regardless. The cull therefore
uses take at <= the measured cliff and onehot above it (OCC_TAKE_MAX).

Run: python benchmarks/micro_occlookup.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ntx, nty = 30, 34
    rng = np.random.default_rng(0)
    sizes = [1 << 19, 1 << 20, 3 << 19, 1 << 21, 3 << 20, 1 << 22]
    for n in sizes:
        tx = jnp.asarray(rng.integers(0, ntx, n, dtype=np.int32))
        ty = jnp.asarray(rng.integers(0, nty, n, dtype=np.int32))
        z = jnp.asarray(rng.random(n, dtype=np.float32))
        zimg = jnp.asarray(rng.random((nty, ntx), dtype=np.float32))

        @jax.jit
        def take(tx, ty, z, zimg):
            zmax = jnp.take(zimg.reshape(-1), ty * ntx + tx)
            return jnp.sum((z >= zmax).astype(jnp.int32))

        @jax.jit
        def onehot(tx, ty, z, zimg):
            with jax.default_matmul_precision("highest"):
                oy = (ty[:, None] == jnp.arange(nty, dtype=jnp.int32)[None, :])
                row = oy.astype(jnp.float32) @ zimg  # [L, ntx]
                sel = tx[:, None] == jnp.arange(ntx, dtype=jnp.int32)[None, :]
                zmax = jnp.sum(jnp.where(sel, row, 0.0), axis=1)
                return jnp.sum((z >= zmax).astype(jnp.int32))

        @jax.jit
        def onehot_b(tx, ty, z, zimg):
            oy = (ty[:, None] == jnp.arange(nty, dtype=jnp.int32)[None, :])
            row = jax.lax.dot(
                oy.astype(jnp.bfloat16), zimg.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
            sel = tx[:, None] == jnp.arange(ntx, dtype=jnp.int32)[None, :]
            zmax = jnp.sum(jnp.where(sel, row, 0.0), axis=1)
            return jnp.sum((z >= zmax).astype(jnp.int32))

        for name, fn in (("take", take), ("onehot", onehot),
                         ("onehot_b", onehot_b)):
            r = fn(tx, ty, z, zimg)
            r.block_until_ready()
            reps = 20
            t0 = time.perf_counter()
            for _ in range(reps):
                r = fn(tx, ty, z, zimg)
            r.block_until_ready()
            dt = (time.perf_counter() - t0) / reps * 1e3
            print(f"n={n:>8} {name:>9}: {dt:7.3f} ms "
                  f"({dt / n * 1e6:5.2f} ns/lane, occ={int(r)})", flush=True)


if __name__ == "__main__":
    main()
