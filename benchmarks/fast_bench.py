"""Measure mode 'F' (static-table fast profile) on the default platform.

Times container-level encode/decode at the bench geometry and prints the
MB/s + ratio; round trip verified bit-exact first (the cmp oracle).

Usage: python benchmarks/fast_bench.py [MB] [LANES]
"""

from __future__ import annotations

import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    lanes = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    from comprox_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from comprox_tpu.cli.main import make_params
    from comprox_tpu.codec import container
    from bench import build_corpus

    cp = make_params("crf", {"lanes": lanes, "block_mb": mb})
    data = build_corpus(int(mb * 1048576))

    warm = data[: min(cp.block.capacity, 1 << 20)]
    buf = io.BytesIO()
    container.encode_stream(warm, buf, cp)
    buf.seek(0)
    out = io.BytesIO()
    container.decode_stream(buf, out)
    assert out.getvalue() == warm.tobytes(), "warmup round trip failed"

    t0 = time.time()
    buf = io.BytesIO()
    csize = container.encode_stream(data, buf, cp)
    enc_s = time.time() - t0
    buf.seek(0)
    out = io.BytesIO()
    t0 = time.time()
    container.decode_stream(buf, out)
    dec_s = time.time() - t0
    assert out.getvalue() == data.tobytes(), "ROUND TRIP FAILED"
    print(
        f"crf {mb:g}MiB lanes={lanes}: "
        f"enc {data.size / enc_s / 1e6:.2f} MB/s, "
        f"dec {data.size / dec_s / 1e6:.2f} MB/s, "
        f"ratio {csize / data.size:.4f} ({csize * 8 / data.size:.3f} bpb)"
    )


if __name__ == "__main__":
    main()
