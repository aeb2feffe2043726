"""Flagship 8 MiB ratio ledger: crz on the bench doc-text corpus, full
container path (same method as the PERF.md R search-knob sweep), with
optional chain mode — the round-5 configuration matrix for VERDICT task 2
(take crz past ref comprox's 0.405 bpb; comprolz 0.392 is the stretch).

  python benchmarks/flagship.py                 # single 8 MiB block
  FLAG_CHAIN=2 FLAG_BLOCK_MB=2 python benchmarks/flagship.py   # crz -C

Env: FLAG_MODE (R), FLAG_BLOCK_MB (8), FLAG_CHAIN (0|1|2), FLAG_LANES
(512), FLAG_MB (8).
"""

from __future__ import annotations

import io
import os
import sys
import time

import numpy as np


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import build_corpus
    from comprox_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from comprox_tpu.cli.main import make_params
    from comprox_tpu.codec.container import decode_stream, encode_stream

    mode = os.environ.get("FLAG_MODE", "R")
    block_mb = float(os.environ.get("FLAG_BLOCK_MB", "8"))
    chain = os.environ.get("FLAG_CHAIN", "0")
    lanes = int(os.environ.get("FLAG_LANES", "512"))
    mb = float(os.environ.get("FLAG_MB", "8"))

    name = {"R": "crz", "X": "crx", "P": "crp", "F": "crf"}[mode]
    cp = make_params(
        name,
        {
            "lanes": lanes,
            "block_mb": block_mb,
            "chain": chain in ("1", "2"),
            "chain_match": chain == "2",
        },
    )
    data = build_corpus(int(mb * 1048576))

    buf = io.BytesIO()
    t0 = time.time()
    encode_stream(data, buf, cp, dictionary=True,
                  chain=chain in ("1", "2"))
    enc_s = time.time() - t0
    buf.seek(0)
    out = io.BytesIO()
    t0 = time.time()
    decode_stream(buf, out)
    dec_s = time.time() - t0
    ok = out.getvalue() == data.tobytes()
    csize = len(buf.getvalue())
    print(
        f"flagship {name} {int(mb)}MiB block={block_mb}MiB chain={chain}: "
        f"{'BIT-EXACT' if ok else 'MISMATCH'} {csize} B "
        f"({csize * 8 / data.size:.4f} bpb), "
        f"enc {data.size / 1048576 / enc_s:.2f} MB/s, "
        f"dec {data.size / 1048576 / dec_s:.2f} MB/s",
        flush=True,
    )
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
