"""Per-pass timing of the mode-'F' encode/decode pipeline on the default
platform — where does the fast profile's wall actually go?

Encode passes timed separately (each jitted + warmed, then timed with
block_until_ready):
  1. sort_candidates        (whole-block vector search)
  2. parse scan             (_parse_body over T steps, reverse)
  3. full _encode_fast      (1+2 + replay scan + histogram + rANS scan)
  4. _fast_decode_scan      (the decode while-loop)

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
    from comprox_tpu.codec.block import BlockParams, sort_candidates

    n = int(mb * 1048576)
    p = BlockParams(lanes=lanes, steps=n // lanes, mode="F")
    data = build_corpus(n)
    buf = np.zeros((p.lanes, p.steps), np.uint8)
    buf.reshape(-1)[:n] = data
    inp = jnp.asarray(buf)
    nn = jnp.int32(n)
    inp_flat = inp.reshape(-1)

    sc = jax.jit(
        functools.partial(
            sort_candidates,
            p,
            n_cands=fast._F_CANDS,
            ext=min(fast._F_EXT, p.window),
        )
    )
    t_sort, _ = timeit(sc, inp_flat, nn)
    print(f"sort_candidates: {t_sort*1e3:8.1f} ms")

    fm = jax.jit(functools.partial(fast._fast_find_matches, p))
    t_fm, _ = timeit(fm, inp_flat, nn)
    print(f"find+parse:      {t_fm*1e3:8.1f} ms  (parse = {1e3*(t_fm-t_sort):.1f})")

    t_enc, enc_out = timeit(fast._encode_fast, p, inp, nn)
    print(
        f"encode total:    {t_enc*1e3:8.1f} ms  "
        f"(replay+hist+rans = {1e3*(t_enc-t_fm):.1f})  "
        f"-> {n/t_enc/1e6:.2f} MB/s"
    )

    a_freq, l_freq, states, emitp, words = enc_out
    emit = np.unpackbits(
        np.asarray(emitp), axis=-1, bitorder="little"
    ).astype(bool)
    stream_np = np.asarray(words)[emit]
    stream = np.zeros((p.stream_pad,), np.uint16)
    stream[: stream_np.size] = stream_np
    t_dec, dec_out = timeit(
        fast._fast_decode_scan,
        p,
        a_freq,
        l_freq,
        states,
        jnp.asarray(stream),
        nn,
    )
    x, base, out = dec_out
    ok = bool((np.asarray(out).reshape(-1)[:n] == data).all())
    print(
        f"decode scan:     {t_dec*1e3:8.1f} ms  -> {n/t_dec/1e6:.2f} MB/s  "
        f"({t_dec/p.steps*1e6:.1f} us/step)  roundtrip={'OK' if ok else 'FAIL'}"
    )
    print(
        f"stream words={stream_np.size}  bpb={(16*stream_np.size + 32*lanes + 8*fast._TAB_BYTES)/n:.4f}"
    )


if __name__ == "__main__":
    main()
