"""Benchmark driver: encodes+decodes a text corpus on the default platform
(the real TPU chip under axon) and prints ONE JSON line.

Metric: single-chip encode throughput in MB/s, with vs_baseline relative to
the reference comprox binary's measured encode speed on this class of
hardware-independent corpus (BASELINE.md: 16.2 MB/s on doc text, Xeon x4).
Round trip is verified bit-exact before any number is reported.

Env knobs:
  BENCH_MB      corpus size in MiB          (default 8)
  BENCH_LANES   lanes per block             (default 512)
  BENCH_BLOCK   block capacity in MiB       (default 8)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REF_ENCODE_MBPS = 16.2  # BASELINE.md measured reference encode speed


def build_corpus(n_bytes: int) -> np.ndarray:
    """Deterministic English-text corpus from /usr/share/doc (the same
    content class as BASELINE.md's doc8.6M), falling back to synthetic."""
    chunks = []
    total = 0
    for path in sorted(Path("/usr/share/doc").rglob("copyright")):
        try:
            b = path.read_bytes()
        except OSError:
            continue
        chunks.append(b)
        total += len(b)
        if total >= n_bytes:
            break
    if total < n_bytes:
        # enwik-class sizes (>8.6 MiB of docs available): extend with
        # Python sources, deterministic sorted order — same text+markup
        # content class at 100 MB scale
        for root in ("/opt/venv/lib", "/usr/lib/python3.11"):
            if total >= n_bytes:
                break
            for path in sorted(Path(root).rglob("*.py")):
                try:
                    b = path.read_bytes()
                except OSError:
                    continue
                chunks.append(b)
                total += len(b)
                if total >= n_bytes:
                    break
    if total < n_bytes:
        rng = np.random.default_rng(42)
        words = [b"the ", b"compression ", b"of ", b"data ", b"blocks ",
                 b"with ", b"adaptive ", b"models ", b"and ", b"entropy ",
                 b"coding ", b"on ", b"tensor ", b"processing ", b"units "]
        while total < n_bytes:
            w = words[int(rng.integers(0, len(words)))]
            chunks.append(w)
            total += len(w)
    data = np.frombuffer(b"".join(chunks), np.uint8)[:n_bytes]
    return data.copy()


def main() -> None:
    corpus_mb = float(os.environ.get("BENCH_MB", "8"))
    lanes = int(os.environ.get("BENCH_LANES", "512"))
    block_mb = float(os.environ.get("BENCH_BLOCK", "8"))

    from comprox_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from comprox_tpu.codec.block import BlockParams
    from comprox_tpu.codec.container import ContainerParams
    from comprox_tpu.codec import container
    import io

    steps = max(1, int(block_mb * 1048576) // lanes)
    bp = BlockParams(
        lanes=lanes,
        steps=steps,
        mode="R",
        min_len=5,
        rolz_ctx_bytes=4 if block_mb >= 4 else 3,
        rolz_dec=2,  # measured ratio-positive AND cheaper (PERF.md round 2)
    )
    cp = ContainerParams(codec=b"R", block=bp)
    data = build_corpus(int(corpus_mb * 1048576))

    # warmup: compile encode+decode (shapes depend only on the geometry,
    # so a small slice compiles everything)
    warm = data[: min(bp.capacity, 1 << 20)]
    buf = io.BytesIO()
    container.encode_stream(warm, buf, cp)
    buf.seek(0)
    out = io.BytesIO()
    container.decode_stream(buf, out)
    assert out.getvalue() == warm.tobytes(), "warmup round trip failed"

    # timed encode
    t0 = time.time()
    buf = io.BytesIO()
    csize = container.encode_stream(data, buf, cp)
    enc_s = time.time() - t0

    # timed decode + verification
    buf.seek(0)
    out = io.BytesIO()
    t0 = time.time()
    container.decode_stream(buf, out)
    dec_s = time.time() - t0
    ok = out.getvalue() == data.tobytes()
    if not ok:
        print(json.dumps({"metric": "encode MB/s (ROUND TRIP FAILED)",
                          "value": 0.0, "unit": "MB/s", "vs_baseline": 0.0}))
        sys.exit(1)

    enc_mbps = data.size / enc_s / 1e6
    dec_mbps = data.size / dec_s / 1e6
    bpb = csize * 8 / data.size
    print(
        json.dumps(
            {
                "metric": (
                    f"single-chip encode throughput, {corpus_mb:g}MiB doc-text"
                    f" corpus, round-trip verified (decode {dec_mbps:.2f}"
                    f" MB/s, ratio {csize / data.size:.4f}, {bpb:.3f} bpb)"
                ),
                "value": round(enc_mbps, 3),
                "unit": "MB/s",
                "vs_baseline": round(enc_mbps / REF_ENCODE_MBPS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
