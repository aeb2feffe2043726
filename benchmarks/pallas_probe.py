"""TPU primitive-cost probes for the codec megakernel design.

Questions these answer (PERF.md gets the results):
  P1  Does Mosaic lower a vectorized VMEM gather (jnp.take / take_along_axis
      with per-lane dynamic indices) inside a Pallas kernel, and how fast?
  P2  One-hot matmul gather cost at candidate table geometries, f32 HIGHEST
      vs bf16 (exactness of bf16 requires values < 256; counts are capped
      at 24576 so f32 paths matter).
  P3  Per-row dynamic_slice fori_loop from a VMEM table (scalar-issue floor).
  P4  Persistent-kernel step overhead: one Pallas call running T steps with
      state in VMEM vs an XLA scan of T steps.
  P5  HBM row-DMA issue floor at pipeline depth 16/32 (round-1 measured 77
      us/step at depth 8, S=256).

Run on the real chip:  python benchmarks/pallas_probe.py [probe ...]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 512  # lanes


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


# --------------------------------------------------------------------- P1
def probe_vmem_gather():
    """jnp.take with dynamic per-lane indices, table resident in VMEM."""
    for rows, width in [(2048, 128), (8192, 128), (8192, 256), (65536, 8)]:
        table = jnp.arange(rows * width, dtype=jnp.int32).reshape(rows, width)
        idx = jnp.asarray(np.random.randint(0, rows, S), jnp.int32)

        def kernel(t_ref, i_ref, o_ref):
            o_ref[:] = jnp.take(t_ref[:], i_ref[:], axis=0)

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
            ok = bool((np.asarray(out) == np.asarray(table)[np.asarray(idx)]).all())
            dt = timeit(run, table, idx)
            print(f"P1 take[{rows}x{width}] -> [{S},{width}]: "
                  f"{dt*1e6:.1f} us exact={ok}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"P1 take[{rows}x{width}]: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


# --------------------------------------------------------------------- P1b
def probe_vmem_gather_1d():
    """Element gather from a 1D VMEM table (o3-style), via 2D reshape."""
    for bits in (16, 18, 20):
        rows = 1 << (bits - 7)
        table = jnp.arange(rows * 128, dtype=jnp.int32).reshape(rows, 128)
        idx = jnp.asarray(np.random.randint(0, rows * 128, S), jnp.int32)

        def kernel(t_ref, i_ref, o_ref):
            r = i_ref[:] >> 7
            c = i_ref[:] & 127
            rows_v = jnp.take(t_ref[:], r, axis=0)  # [S, 128]
            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1) == c[:, None]
            )
            o_ref[:] = jnp.sum(jnp.where(onehot, rows_v, 0), axis=1,
                               keepdims=True)

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
            print(f"P1b o3-gather 2^{bits}: {dt*1e6:.1f} us exact={ok}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"P1b o3-gather 2^{bits}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


# --------------------------------------------------------------------- P2
def probe_onehot_matmul():
    for rows, width in [(2048, 128), (4096, 260), (8192, 260), (16384, 260)]:
        table_f = jnp.asarray(
            np.random.randint(0, 24576, (rows, width)), jnp.float32
        )
        idx = jnp.asarray(np.random.randint(0, rows, S), jnp.int32)

        @jax.jit
        def gather_hi(t, i):
            oh = (i[:, None] == jnp.arange(rows)[None, :]).astype(jnp.float32)
            return jnp.dot(oh, t, precision=jax.lax.Precision.HIGHEST)

        @jax.jit
        def gather_bf(t, i):
            oh = (i[:, None] == jnp.arange(rows)[None, :]).astype(jnp.bfloat16)
            return jnp.dot(oh, t.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)

        d1 = timeit(gather_hi, table_f, idx)
        d2 = timeit(gather_bf, table_f, idx)
        ok1 = bool(
            (np.asarray(gather_hi(table_f, idx))
             == np.asarray(table_f)[np.asarray(idx)]).all()
        )
        print(f"P2 onehot [{S},{rows}]@[{rows},{width}]: "
              f"HIGHEST {d1*1e6:.1f} us (exact={ok1}), bf16 {d2*1e6:.1f} us",
              flush=True)


# --------------------------------------------------------------------- P3
def probe_dynslice_loop():
    rows, width = 8192, 256
    table = jnp.arange(rows * width, dtype=jnp.int32).reshape(rows, width)
    idx = jnp.asarray(np.random.randint(0, rows, S), jnp.int32)

    def kernel(t_ref, i_ref, o_ref):
        def body(k, _):
            o_ref[k, :] = t_ref[i_ref[k], :]
            return 0

        jax.lax.fori_loop(0, S, body, 0)

    @jax.jit
    def run(t, i):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((S, width), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, i)

    try:
        out = run(table, idx)
        ok = bool((np.asarray(out) == np.asarray(table)[np.asarray(idx)]).all())
        dt = timeit(run, table, idx)
        print(f"P3 dynslice loop {S}x[{width}] from VMEM: {dt*1e6:.1f} us "
              f"({dt/S*1e9:.0f} ns/row) exact={ok}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"P3: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


# --------------------------------------------------------------------- P4
def probe_persistent_steps():
    """T steps inside ONE kernel vs an XLA scan: per-step overhead."""
    T = 512
    rows = 2048
    table = jnp.asarray(np.random.randint(0, 255, (rows, 128)), jnp.float32)

    def kernel(t_ref, o_ref):
        def body(t, s):
            idx = (s.astype(jnp.int32) & (rows - 1))
            oh = (idx[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (S, rows), 1)).astype(jnp.float32)
            r = jnp.dot(oh, t_ref[:], preferred_element_type=jnp.float32)
            return s + r[:, 0]

        s = jax.lax.fori_loop(0, T, body, jnp.zeros((S,), jnp.float32))
        o_ref[:] = s[:, None]

    @jax.jit
    def run_pallas(t):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((S, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t)

    @jax.jit
    def run_scan(t):
        def body(s, _):
            idx = (s.astype(jnp.int32) & (rows - 1))
            oh = (idx[:, None] == jnp.arange(rows)[None, :]).astype(
                jnp.float32
            )
            r = jnp.dot(oh, t, precision=jax.lax.Precision.HIGHEST)
            return s + r[:, 0], 0

        s, _ = jax.lax.scan(body, jnp.zeros((S,), jnp.float32),
                            jnp.arange(T))
        return s

    try:
        d1 = timeit(run_pallas, table, n=5)
        print(f"P4 pallas persistent {T} steps: {d1*1e3:.2f} ms "
              f"({d1/T*1e6:.1f} us/step)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"P4 pallas: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
    d2 = timeit(run_scan, table, n=5)
    print(f"P4 xla scan {T} steps: {d2*1e3:.2f} ms ({d2/T*1e6:.1f} us/step)",
          flush=True)


# --------------------------------------------------------------------- P5
def probe_dma_depth():
    """HBM row DMAs at deeper pipelining (round 1: depth 8 = 77us/S=256)."""
    rows, width = 1 << 16, 256  # 64MB-class table stays in HBM
    table = jnp.arange(rows, dtype=jnp.int32)[:, None] * jnp.ones(
        (1, width), jnp.int32
    )
    idx = jnp.asarray(np.random.randint(0, rows, S), jnp.int32)

    for depth in (16, 32):
        def kernel(i_ref, t_hbm, o_ref, scratch, sems, depth=depth):
            def start(k):
                pltpu.make_async_copy(
                    t_hbm.at[i_ref[k]], scratch.at[k % depth],
                    sems.at[k % depth],
                ).start()

            def body(k, _):
                @pl.when(k + depth < S)
                def _():
                    start(k + depth)

                pltpu.make_async_copy(
                    t_hbm.at[i_ref[k]], scratch.at[k % depth],
                    sems.at[k % depth],
                ).wait()
                o_ref[k, :] = scratch[k % depth]
                return 0

            for k in range(depth):
                start(k)
            jax.lax.fori_loop(0, S, body, 0)

        @jax.jit
        def run(t, i, kernel=kernel, depth=depth):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((S, width), jnp.int32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((depth, width), jnp.int32),
                    pltpu.SemaphoreType.DMA((depth,)),
                ],
            )(i, t)

        try:
            out = run(table, idx)
            ok = bool(
                (np.asarray(out)[:, 0] == np.asarray(idx)).all()
            )
            dt = timeit(run, table, idx)
            print(f"P5 HBM row-DMA depth={depth}: {dt*1e6:.1f} us "
                  f"({dt/S*1e9:.0f} ns/row) exact={ok}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"P5 depth={depth}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


PROBES = {
    "p1": probe_vmem_gather,
    "p1b": probe_vmem_gather_1d,
    "p2": probe_onehot_matmul,
    "p3": probe_dynslice_loop,
    "p4": probe_persistent_steps,
    "p5": probe_dma_depth,
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(PROBES)
    print(f"devices: {jax.devices()}", flush=True)
    for nm in names:
        PROBES[nm]()
