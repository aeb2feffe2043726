"""Round-2 probes: Mosaic dynamic_gather spellings + DMA pipeline retry.

P6  take_along_axis with broadcast row indices (Mosaic dynamic_gather
    wants indices shaped like the output).
P7  element gather from a [rows,128] table via take_along_axis twice
    (row then column) — the o3 pattern.
P8  one-hot matmul with the one-hot built INSIDE a pallas kernel feeding
    the MXU directly (XLA's 2 ms at 4096+ may be materialization cost).
P9  DMA row pipeline retry with static slot unroll.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 512


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def probe_taa():
    for rows, width in [(2048, 128), (8192, 128), (8192, 256), (512, 260),
                        (65536, 128)]:
        table = jnp.asarray(
            np.random.randint(0, 24576, (rows, width)), jnp.int32
        )
        idx = jnp.asarray(np.random.randint(0, rows, S), jnp.int32)

        def kernel(t_ref, i_ref, o_ref):
            ib = jnp.broadcast_to(i_ref[:][:, None], (S, t_ref.shape[1]))
            o_ref[:] = jnp.take_along_axis(t_ref[:], ib, axis=0)

        @jax.jit
        def run(t, i):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((S, width), jnp.int32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(t, i)

        try:
            out = run(table, idx)
            ok = bool(
                (np.asarray(out) == np.asarray(table)[np.asarray(idx)]).all()
            )
            dt = timeit(run, table, idx)
            print(f"P6 taa [{rows}x{width}]: {dt*1e6:.1f} us exact={ok}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"P6 taa [{rows}x{width}]: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)


def probe_elem():
    """o3-style element gather: row via take_along_axis, col via dot."""
    for bits in (16, 18, 20, 22):
        rows = 1 << max(bits - 7, 0)
        table = jnp.asarray(
            np.random.randint(0, 1 << 12, (rows, 128)), jnp.int32
        )
        idx = jnp.asarray(
            np.random.randint(0, rows * 128, S), jnp.int32
        )

        def kernel(t_ref, i_ref, o_ref):
            r = i_ref[:] >> 7
            cc = i_ref[:] & 127
            rb = jnp.broadcast_to(r[:, None], (S, 128))
            rows_v = jnp.take_along_axis(t_ref[:], rb, axis=0)  # [S,128]
            sel = (
                jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)
                == cc[:, None]
            )
            o_ref[:] = jnp.sum(
                jnp.where(sel, rows_v, 0), axis=1, keepdims=True
            )

        @jax.jit
        def run(t, i):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((S, 1), jnp.int32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(t, i)

        try:
            out = run(table, idx)
            ref = np.asarray(table).reshape(-1)[np.asarray(idx)]
            ok = bool((np.asarray(out)[:, 0] == ref).all())
            dt = timeit(run, table, idx)
            print(f"P7 o3-elem 2^{bits}: {dt*1e6:.1f} us exact={ok}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"P7 o3-elem 2^{bits}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)


def probe_kernel_onehot():
    for rows, width in [(4096, 260), (8192, 260)]:
        wpad = 384  # pad 260 -> 384 (3x128)
        table = jnp.asarray(
            np.random.randint(0, 24576, (rows, wpad)), jnp.float32
        )
        idx = jnp.asarray(np.random.randint(0, rows, S), jnp.int32)

        def kernel(t_ref, i_ref, o_ref):
            oh = (
                jax.lax.broadcasted_iota(jnp.int32, (S, rows), 1)
                == i_ref[:][:, None]
            ).astype(jnp.bfloat16)
            o_ref[:] = jnp.dot(
                oh, t_ref[:].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )

        @jax.jit
        def run(t, i):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((S, wpad), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(t, i)

        try:
            out = run(table, idx)
            ok = bool(
                np.allclose(np.asarray(out), np.asarray(table)[np.asarray(idx)])
            )
            dt = timeit(run, table, idx)
            print(f"P8 kernel onehot [{rows}x{wpad}]: {dt*1e6:.1f} us "
                  f"exact={ok}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"P8 [{rows}]: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


def probe_dma():
    rows, width = 1 << 16, 256
    table = (
        jnp.arange(rows, dtype=jnp.int32)[:, None]
        * jnp.ones((1, width), jnp.int32)
    )
    idx = jnp.asarray(np.random.randint(0, rows, S), jnp.int32)
    depth = 16

    def kernel(i_ref, t_hbm, o_ref, scratch, sems):
        def body(k, _):
            slot = jax.lax.rem(k, depth)

            @pl.when(k + depth < S)
            def _():
                pltpu.make_async_copy(
                    t_hbm.at[i_ref[k + depth]],
                    scratch.at[jax.lax.rem(k + depth, depth)],
                    sems.at[jax.lax.rem(k + depth, depth)],
                ).start()

            pltpu.make_async_copy(
                t_hbm.at[i_ref[k]], scratch.at[slot], sems.at[slot]
            ).wait()
            o_ref[pl.ds(k, 1), :] = scratch[pl.ds(slot, 1), :]
            return 0

        def warm(k, _):
            pltpu.make_async_copy(
                t_hbm.at[i_ref[k]], scratch.at[k], sems.at[k]
            ).start()
            return 0

        jax.lax.fori_loop(0, depth, warm, 0)
        jax.lax.fori_loop(0, S, body, 0)

    @jax.jit
    def run(t, i):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((S, width), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((depth, width), jnp.int32),
                pltpu.SemaphoreType.DMA((depth,)),
            ],
        )(i, t)

    try:
        out = run(table, idx)
        ok = bool((np.asarray(out)[:, 0] == np.asarray(idx)).all())
        dt = timeit(run, table, idx)
        print(f"P9 HBM DMA depth={depth}: {dt*1e6:.1f} us "
              f"({dt/S*1e9:.0f} ns/row) exact={ok}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"P9: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


PROBES = {"p6": probe_taa, "p7": probe_elem, "p8": probe_kernel_onehot,
          "p9": probe_dma}

if __name__ == "__main__":
    for nm in (sys.argv[1:] or list(PROBES)):
        PROBES[nm]()
