"""Pallas TPU kernels for the codec's hot memory ops.

XLA lowers dynamic-index gathers/scatters on TPU to a serialized per-index
loop (~0.28us/index measured on v5e — the dominant cost of the codec scan).
This module hand-pipelines those ops: row DMAs issue ahead with a ring of
in-flight copies, hiding HBM latency behind overlap instead of serializing.

Differentially tested against the jnp reference in tests/test_pallas.py;
interpret mode keeps them runnable on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NBUF = 8  # in-flight row DMAs


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


@jax.jit
def gather_rows(table, idx):
    """table[idx]: [N, W] i32, [S] i32 -> [S, W] via pipelined row DMAs.

    The table stays in HBM; each lane's row is DMA'd to a VMEM ring slot
    with NBUF copies outstanding (double-buffering pattern), then stored to
    the output block.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    s = idx.shape[0]
    w = table.shape[1]

    def kernel(idx_ref, table_ref, out_ref):
        def body(scratch, sems):
            # Mosaic requires 8-row-aligned DMA slices of a tiled memref:
            # fetch the aligned 8-row group containing the target row and
            # select the row in-kernel (8x DMA bytes, still latency-bound)
            def dma(i):
                slot = jax.lax.rem(i, NBUF)
                base = pl.multiple_of((idx_ref[i] >> 3) << 3, 8)
                return pltpu.make_async_copy(
                    table_ref.at[pl.ds(base, 8), :],
                    scratch.at[slot],
                    sems.at[slot],
                )

            for j in range(min(NBUF, s)):  # prologue (static)
                dma(jnp.int32(j)).start()

            def loop(i, _):
                dma(i).wait()
                slot = jax.lax.rem(i, NBUF)
                sub = jax.lax.rem(idx_ref[i], 8)
                out_ref[pl.ds(i, 1), :] = scratch[slot, pl.ds(sub, 1), :]

                @pl.when(i + NBUF < s)
                def _():
                    dma(i + NBUF).start()

                return 0

            jax.lax.fori_loop(0, s, loop, 0)

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((NBUF, 8, w), table.dtype),
            sems=pltpu.SemaphoreType.DMA((NBUF,)),
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((s, w), table.dtype),
        grid_spec=grid_spec,
        interpret=_use_interpret(),
    )(idx.astype(jnp.int32), table)


def gather_rows_ref(table, idx):
    return table[idx]
