"""Per-pass timing of the F2 fast-profile pipeline on the default
platform — where does the fast profile's wall actually go?

Stages timed separately (each jitted + warmed, then timed with
block_until_ready; round-4 F2 architecture, codec/fast.py):
  1. find+parse          (_fast_find_matches: sort finder + parse DP)
  2. device encode       (_encode_fast: 1 + replay + tokenize +
                          histogram + reverse rANS window writes)
  3. full block encode   (encode_block_fast: 2 + host compaction)
  4. device decode scan  (decode_block_fast_start handles)
  5. full block decode   (4 + native f2_execute copy resolution)

Usage: python benchmarks/f_profile.py [MB] [LANES]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, reps=3):
    import jax

    r = jax.block_until_ready(fn(*args))  # warm/compile
    t0 = time.time()
    for _ in range(reps):
        r = jax.block_until_ready(fn(*args))
    return (time.time() - t0) / reps, r


def main() -> None:
    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    lanes = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    from comprox_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from bench import build_corpus
    from comprox_tpu.codec import fast
    from comprox_tpu.codec.block import BlockParams

    n = int(mb * 1048576)
    p = BlockParams(lanes=lanes, steps=n // lanes, mode="F", min_len=6)
    data = build_corpus(n)
    buf = np.zeros((p.lanes, p.steps), np.uint8)
    buf.reshape(-1)[:n] = data
    inp = jnp.asarray(buf)
    nn = jnp.int32(n)
    inp_flat = inp.reshape(-1)

    fm = jax.jit(functools.partial(fast._fast_find_matches, p))
    t_fm, _ = timeit(fm, inp_flat, nn)
    print(f"find+parse:     {t_fm*1e3:8.1f} ms", flush=True)

    t_enc, _ = timeit(
        functools.partial(fast._encode_fast, p), inp, nn
    )
    print(
        f"device encode:  {t_enc*1e3:8.1f} ms  "
        f"(replay+tok+hist+rans = {1e3*(t_enc-t_fm):.1f})",
        flush=True,
    )

    def full_enc(d):
        return fast.encode_block_fast(d, p)

    t0 = time.time()
    payload = full_enc(data)
    t_cold = time.time() - t0
    t0 = time.time()
    payload = full_enc(data)
    t_full = time.time() - t0
    print(
        f"block encode:   {t_full*1e3:8.1f} ms  (host share = "
        f"{1e3*(t_full-t_enc):.1f})  -> {n/t_full/1e6:.2f} MB/s  "
        f"[cold {t_cold*1e3:.0f}]",
        flush=True,
    )

    def dec_scan(pl):
        # started[5] = the _fast_decode_scan device handles
        return jax.block_until_ready(
            fast.decode_block_fast_start(pl, n, p)[5]
        )

    dec_scan(payload)
    t0 = time.time()
    for _ in range(3):
        dec_scan(payload)
    t_scan = (time.time() - t0) / 3
    t0 = time.time()
    out = fast.decode_block_fast(payload, n, p)
    t_dec = time.time() - t0
    ok = bool((out == data).all())
    print(
        f"decode scan:    {t_scan*1e3:8.1f} ms\n"
        f"block decode:   {t_dec*1e3:8.1f} ms  (host executor share = "
        f"{1e3*(t_dec-t_scan):.1f})  -> {n/t_dec/1e6:.2f} MB/s  "
        f"roundtrip={'OK' if ok else 'FAIL'}",
        flush=True,
    )
    print(f"payload {len(payload)} B ({len(payload)*8/n:.4f} bpb)")


if __name__ == "__main__":
    main()
