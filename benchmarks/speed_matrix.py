"""Per-mode speed/ratio matrix on the current default device.

Runs each codec mode over the bench corpus at production geometry with
configurable block batching, verifies every round trip, and prints
PERF.md-ready rows.

  python benchmarks/speed_matrix.py            # crz+crf, 8MiB, G=1 and 4
  SM_MODES=R,F,X,P SM_MB=8 SM_GROUPS=1,4 python benchmarks/speed_matrix.py
"""

from __future__ import annotations

import io
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    modes = os.environ.get("SM_MODES", "R,F").split(",")
    mb = float(os.environ.get("SM_MB", "8"))
    groups = [int(g) for g in os.environ.get("SM_GROUPS", "1,4").split(",")]
    block_mb = float(os.environ.get("SM_BLOCK", "2"))
    lanes = int(os.environ.get("SM_LANES", "512"))

    from bench import build_corpus
    from comprox_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from comprox_tpu.codec import container
    from comprox_tpu.codec.block import BlockParams
    from comprox_tpu.codec.container import ContainerParams

    data = build_corpus(int(mb * 1048576))
    for mode in modes:
        steps = max(1, int(block_mb * 1048576) // lanes)
        bp = BlockParams(
            lanes=lanes,
            steps=steps,
            mode=mode,
            min_len={"R": 5, "X": 6, "F": 6, "P": 4}[mode],
            rolz_ctx_bytes=4 if block_mb >= 4 else 3,
            rolz_dec=2 if mode == "R" else 1,
        )
        cp = ContainerParams(codec=mode.encode(), block=bp)
        for g in groups:
            try:
                # warmup / compile
                warm = data[: min(bp.capacity, 1 << 20)]
                buf = io.BytesIO()
                container.encode_stream(warm, buf, cp, group=g)
                buf.seek(0)
                out = io.BytesIO()
                container.decode_stream(buf, out, group=g)
                assert out.getvalue() == warm.tobytes()

                t0 = time.time()
                buf = io.BytesIO()
                csize = container.encode_stream(data, buf, cp, group=g)
                enc_s = time.time() - t0
                buf.seek(0)
                out = io.BytesIO()
                t0 = time.time()
                container.decode_stream(buf, out, group=g)
                dec_s = time.time() - t0
                ok = out.getvalue() == data.tobytes()
                print(
                    f"mode={mode} block={block_mb:g}MiB G={g}: "
                    f"{'OK' if ok else 'MISMATCH!'} "
                    f"{csize * 8 / data.size:.4f} bpb, "
                    f"enc {data.size / enc_s / 1e6:.2f} MB/s, "
                    f"dec {data.size / dec_s / 1e6:.2f} MB/s",
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001
                print(f"mode={mode} G={g}: FAILED {e!r}", flush=True)


if __name__ == "__main__":
    main()
