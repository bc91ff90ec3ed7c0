#!/usr/bin/env python
"""Microbench: assemble a [K, NB*B] stream from a [K, NP] table given NB
block srcs (block-aligned), three ways:
  1. XLA gather with slice_sizes (K, B)
  2. element gather with expanded indices (the round-1 baseline)
  3. Pallas blockgather with scalar-prefetch index_map
Timing via device_get(sum) with ~40ms sync overhead subtracted per memory.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 11
B = 256
NP_ = 4 << 20  # 4M-entry table
NB = 12 << 10  # 12k blocks -> 3.1M stream


def timeit(f, *args, n=6):
    out = f(*args)
    jax.device_get(jnp.sum(out[0] if isinstance(out, tuple) else out))
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = f(*args)
        jax.device_get(jnp.sum(out[0] if isinstance(out, tuple) else out))
        ts.append((time.time() - t0) * 1e3)
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random((K, NP_), np.float32))
    src_blocks = jnp.asarray(
        rng.integers(0, NP_ // B - 1, NB, dtype=np.int32)
    )

    @jax.jit
    def slice_gather(table, src):
        # gather of (K, B) slices at column starts src*B
        starts = (src * B)[:, None]
        out = jax.lax.gather(
            table,
            starts,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2),
                collapsed_slice_dims=(),
                start_index_map=(1,),
                operand_batching_dims=(),
                start_indices_batching_dims=(),
            ),
            slice_sizes=(K, B),
            mode="clip",
        )  # [NB, K, B]
        return out

    @jax.jit
    def elem_gather(table, src):
        idx = (src[:, None] * B + jnp.arange(B)[None, :]).reshape(-1)
        return table[:, idx]

    def pallas_blockgather(table, src):
        def kern(src_ref, tab_ref, out_ref):
            out_ref[:] = tab_ref[:]

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NB,),
            in_specs=[
                pl.BlockSpec((K, B), lambda g, src: (0, src[g])),
            ],
            out_specs=pl.BlockSpec((K, B), lambda g, src: (0, g)),
        )
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((K, NB * B), jnp.float32),
            grid_spec=grid_spec,
        )(src, table)

    pallas_jit = jax.jit(pallas_blockgather)

    # block-contiguous layouts: table [NPB, K, B] (one panel = one
    # contiguous K*B*4-byte chunk), out [NB, K, B]
    K16 = 16
    table_bc = jnp.asarray(rng.random((NP_ // B, K16, B), np.float32))
    table_rows = table_bc.reshape(NP_ // B, K16 * B)

    def pallas_bc(table, src, group=8):
        def kern(src_ref, tab_ref, out_ref, sems):
            g = pl.program_id(0)
            for i in range(group):
                b = g * group + i
                pltpu.make_async_copy(
                    tab_ref.at[src_ref[b]], out_ref.at[b], sems.at[i]
                ).start()
            for i in range(group):
                b = g * group + i
                pltpu.make_async_copy(
                    tab_ref.at[src_ref[b]], out_ref.at[b], sems.at[i]
                ).wait()

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NB // group,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA((group,))],
        )
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((NB, K16, B), jnp.float32),
            grid_spec=grid_spec,
        )(src, table)

    pallas_bc_jit = jax.jit(functools.partial(pallas_bc, group=8))
    pallas_bc1_jit = jax.jit(functools.partial(pallas_bc, group=1))

    @jax.jit
    def pallas_bc_t(table, src):
        out = pallas_bc(table, src, group=8)  # [NB, K, B]
        return out.transpose(1, 0, 2).reshape(K16, NB * B)

    @jax.jit
    def row_gather(table_rows, src):
        return table_rows[src]  # [NB, K*B]

    @jax.jit
    def row_gather_t(table_rows, src):
        out = table_rows[src].reshape(NB, K16, B)
        return out.transpose(1, 0, 2).reshape(K16, NB * B)

    t1 = timeit(slice_gather, table, src_blocks)
    t2 = timeit(elem_gather, table, src_blocks)
    t3 = timeit(pallas_jit, table, src_blocks)
    t4 = timeit(pallas_bc_jit, table_bc, src_blocks)
    t4b = timeit(pallas_bc1_jit, table_bc, src_blocks)
    t5 = timeit(pallas_bc_t, table_bc, src_blocks)
    t6 = timeit(row_gather, table_rows, src_blocks)
    t7 = timeit(row_gather_t, table_rows, src_blocks)
    bytes_moved = K * NB * B * 4 * 2 / 1e9
    bytes16 = K16 * NB * B * 4 * 2 / 1e9
    print(f"stream: K={K} x {NB*B/1e6:.1f}M  ({bytes_moved:.2f} GB r+w)")
    for name, t, bm in [
        ("slice_gather", t1, bytes_moved),
        ("elem_gather", t2, bytes_moved),
        ("pallas strided", t3, bytes_moved),
        ("pallas blk-contig g8", t4, bytes16),
        ("pallas blk-contig g1", t4b, bytes16),
        ("pallas blk-contig + transpose", t5, bytes16 * 2),
        ("XLA row gather (16KB rows)", t6, bytes16),
        ("XLA row gather + transpose", t7, bytes16 * 2),
    ]:
        print(f"  {name:30s} {t:7.1f} ms  "
              f"({bm/((t-25)/1e3+1e-9):6.1f} GB/s eff, sync-corrected)")


if __name__ == "__main__":
    main()
