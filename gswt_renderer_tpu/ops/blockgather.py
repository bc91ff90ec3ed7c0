"""Block-panel gather: copy whole 256-column panels out of a resident table.

The frame's splat stream is a concatenation of per-draw segments, and every
segment is a 256-aligned contiguous slice of either the materialized presort
panel table or the per-sort merged scratch (render/pipeline.py stages the
layout). Gathering panels instead of elements is the difference between HBM
bandwidth and XLA's ~30-40 ns/row element gather — measured 25x faster for
the 11-row stream assembly (benchmarks/micro_blockgather.py).

Implemented as a trivial Pallas copy kernel whose input BlockSpec index_map
reads the scalar-prefetched source block ids: Mosaic turns each grid step
into one (K, 256)-panel DMA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 256


def block_gather(table, src_blocks, *, block: int = BLOCK,
                 interpret: bool = False):
    """table [K, N] (N a multiple of `block`), src_blocks [NB] i32 panel ids.

    Returns out [K, NB*block] with
      out[:, b*block:(b+1)*block] == table[:, src[b]*block:(src[b]+1)*block].
    Source ids must be in range (the host stager guarantees this).
    """
    k, n = table.shape
    assert n % block == 0, (n, block)
    nb = src_blocks.shape[0]

    if interpret:
        # the interpreter has no DMA engine model; a plain blocked copy is
        # semantically identical
        def kern(src_ref, tab_ref, out_ref):
            del src_ref
            out_ref[:] = tab_ref[:]

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[pl.BlockSpec((k, block), lambda g, src: (0, src[g]))],
            out_specs=pl.BlockSpec((k, block), lambda g, src: (0, g)),
        )
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((k, nb * block), table.dtype),
            grid_spec=grid_spec,
            interpret=True,
        )(src_blocks.astype(jnp.int32), table)

    # TPU: issue GROUP panel copies per grid step as direct HBM->HBM DMAs —
    # the per-grid-step overhead dominates a one-panel-per-step pipeline
    group = next(g for g in (8, 4, 2, 1) if nb % g == 0)

    def kern(src_ref, tab_ref, out_ref, sems):
        g = pl.program_id(0)
        for i in range(group):
            b = g * group + i
            s0 = src_ref[b] * block
            pltpu.make_async_copy(
                tab_ref.at[:, pl.ds(s0, block)],
                out_ref.at[:, pl.ds(b * block, block)],
                sems.at[i],
            ).start()
        for i in range(group):
            b = g * group + i
            s0 = src_ref[b] * block
            pltpu.make_async_copy(
                tab_ref.at[:, pl.ds(s0, block)],
                out_ref.at[:, pl.ds(b * block, block)],
                sems.at[i],
            ).wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb // group,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((group,))],
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((k, nb * block), table.dtype),
        grid_spec=grid_spec,
    )(src_blocks.astype(jnp.int32), table)
