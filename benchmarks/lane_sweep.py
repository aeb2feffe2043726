"""Lane-count scaling sweep on the real chip: encode+decode MB/s and bpb
at S in {512, 1024, 2048} on the same corpus (4 MiB, one block).

Round-1 PERF.md dismissed S>512 as "~neutral speed" — but that predates
the layout fixes, and the XLA cost-model probe (benchmarks/xla_probe.py)
shows per-row random-access cost dropping 4-8x from S=512 to S=2048.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0
    import jax

    from bench import build_corpus
    from comprox_tpu.codec.block import BlockParams, decode_block, encode_block
    from comprox_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    n = int(mb * 1048576)
    data = build_corpus(n)
    for lanes in (512, 1024, 2048):
        p = BlockParams(
            lanes=lanes, steps=-(-n // lanes), mode="R", min_len=5,
            rolz_ctx_bytes=4 if n >= 4 * 1048576 else 3,
        )
        t0 = time.time()
        payload = encode_block(data, p)
        print(f"S={lanes}: encode compile+warm {time.time()-t0:.0f}s",
              flush=True)
        t0 = time.time()
        out = decode_block(payload, n, p)
        print(f"S={lanes}: decode compile+warm {time.time()-t0:.0f}s",
              flush=True)
        assert bytes(out) == bytes(data)
        t0 = time.time()
        payload = encode_block(data, p)
        enc_s = time.time() - t0
        t0 = time.time()
        out = decode_block(payload, n, p)
        dec_s = time.time() - t0
        assert bytes(out) == bytes(data)
        print(
            f"S={lanes}: enc {n/1e6/enc_s:.2f} MB/s  dec {n/1e6/dec_s:.2f} "
            f"MB/s  {8*len(payload)/n:.4f} bpb  "
            f"({enc_s/p.steps*1e6:.0f}/{dec_s/p.steps*1e6:.0f} us/step)",
            flush=True,
        )


if __name__ == "__main__":
    main()
