"""Probe: primitive costs for the block-parallel (scan-free) match finder.

The mode-'F' encoder redesign replaces the per-step search scan with one
vectorized pass over all N positions: hash every position, sort by
(hash, pos), adjacent-compare for previous occurrences, then extend
candidates by gathered byte windows.  Which gather spelling wins decides
the design — PERF.md's scan-body numbers do not transfer to standalone
whole-block ops, so measure exactly the shapes the finder would issue.

Run on the real chip:  python benchmarks/fastscan_probe.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

_i32 = jnp.int32
_u32 = jnp.uint32


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


@functools.partial(jax.jit, static_argnums=())
def sort_pairs(h, p):
    return jax.lax.sort((h, p), num_keys=1, is_stable=True)


@jax.jit
def elem_gather(tab, idx):
    return tab[idx]


@jax.jit
def matrix_gather8(tab, idx):
    offs = jax.lax.broadcasted_iota(_i32, (idx.shape[0], 8), 1)
    return tab[idx[:, None] + offs]


@jax.jit
def row_gather(tab2d, idx):
    return tab2d[idx]


@jax.jit
def scatter_set(tab, idx, val):
    return tab.at[idx].set(val, mode="drop")


def main():
    print(f"devices: {jax.devices()}")
    for n in (1 << 20, 1 << 22):
        rng = np.random.default_rng(0)
        h = jnp.asarray(rng.integers(0, 1 << 31, n, dtype=np.int32))
        p = jnp.asarray(np.arange(n, dtype=np.int32))
        idx = jnp.asarray(rng.integers(0, n - 64, n, dtype=np.int32))
        tab = jnp.asarray(rng.integers(0, 1 << 31, n, dtype=np.int32))
        nrows = n // 8
        tab2d = tab[: nrows * 8].reshape(nrows, 8)
        idx_row = jnp.asarray(
            rng.integers(0, nrows - 2, n, dtype=np.int32)
        )
        val = jnp.asarray(rng.integers(0, 1 << 31, n, dtype=np.int32))

        t_sort = timeit(sort_pairs, h, p)
        t_eg = timeit(elem_gather, tab, idx)
        t_mg = timeit(matrix_gather8, tab, idx)
        t_rg = timeit(row_gather, tab2d, idx_row)
        t_sc = timeit(scatter_set, tab, idx, val)
        mb = n / (1 << 20)
        print(f"\nN = {n} ({mb:.0f}M positions)")
        print(f"  sort (h,p) u32 pair        {t_sort*1e3:8.2f} ms"
              f"  ({t_sort/n*1e9:6.2f} ns/key)")
        print(f"  element gather [N]         {t_eg*1e3:8.2f} ms"
              f"  ({t_eg/n*1e9:6.2f} ns/elem)")
        print(f"  matrix gather [N,8] words  {t_mg*1e3:8.2f} ms"
              f"  ({t_mg/(8*n)*1e9:6.2f} ns/elem, {t_mg/n*1e9:6.2f} ns/pos)")
        print(f"  row gather [N] rows of 8   {t_rg*1e3:8.2f} ms"
              f"  ({t_rg/n*1e9:6.2f} ns/row)")
        print(f"  scatter set [N]            {t_sc*1e3:8.2f} ms"
              f"  ({t_sc/n*1e9:6.2f} ns/elem)")


if __name__ == "__main__":
    main()
