"""Benchmark harness — the equivalent of the reference's benchmark/Makefile
(/root/reference/benchmark/Makefile:17-46): times encode/decode for every
codec, verifies each round trip byte-exact (the cmp oracle), and compares
against gzip/bzip2/xz and, when present, the reference binaries.

Usage:  python benchmarks/run.py <file> [--codecs crz,crp,crx] [--ref DIR]
"""

from __future__ import annotations

import argparse
import hashlib
import io
import shutil
import subprocess
import sys
import time
from pathlib import Path

import numpy as np


def run_ours(name: str, data: np.ndarray, lanes: int, block_mb: float,
             filters: bool = False):
    from comprox_tpu.cli.main import make_params
    from comprox_tpu.codec.container import decode_stream, encode_stream

    cp = make_params(name, {"lanes": lanes, "block_mb": block_mb})
    buf = io.BytesIO()
    t0 = time.time()
    csize = encode_stream(data, buf, cp, dictionary=True, filters=filters)
    enc_s = time.time() - t0
    buf.seek(0)
    out = io.BytesIO()
    t0 = time.time()
    decode_stream(buf, out)
    dec_s = time.time() - t0
    ok = out.getvalue() == data.tobytes()
    return csize, enc_s, dec_s, ok


def run_tool(cmd_c, cmd_d, path: Path):
    t0 = time.time()
    comp = subprocess.run(cmd_c, capture_output=True).stdout
    enc_s = time.time() - t0
    t0 = time.time()
    out = subprocess.run(cmd_d, input=comp, capture_output=True).stdout
    dec_s = time.time() - t0
    ok = hashlib.sha256(out).digest() == hashlib.sha256(
        path.read_bytes()
    ).digest()
    return len(comp), enc_s, dec_s, ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("file")
    ap.add_argument("--codecs", default="crz,crp,crx")
    ap.add_argument("--lanes", type=int, default=256)
    ap.add_argument("--block-mb", type=float, default=8)
    ap.add_argument("--ref", default=None, help="reference bin dir")
    ap.add_argument("--filters", action="store_true")
    args = ap.parse_args()
    path = Path(args.file)
    data = np.fromfile(path, np.uint8)
    n = data.size
    print(f"corpus: {path} ({n:,} bytes)")
    rows = []
    for name in args.codecs.split(","):
        csize, enc_s, dec_s, ok = run_ours(
            name, data, args.lanes, args.block_mb, args.filters
        )
        rows.append((name, csize, enc_s, dec_s, ok))
    for tool, cc, dd in [
        ("gzip-9", ["gzip", "-9c", str(path)], ["gzip", "-dc"]),
        ("bzip2-9", ["bzip2", "-9c", str(path)], ["bzip2", "-dc"]),
        ("xz-6", ["xz", "-6c", str(path)], ["xz", "-dc"]),
    ]:
        if shutil.which(cc[0]):
            rows.append((tool, *run_tool(cc, dd, path)))
    if args.ref:
        import tempfile

        for b in ("comprox", "comprolz", "comprop"):
            exe = Path(args.ref) / b
            if not exe.exists():
                continue
            with tempfile.TemporaryDirectory() as td:
                cf = Path(td) / "c"
                of = Path(td) / "o"
                t0 = time.time()
                subprocess.run([str(exe), "-q", "e", str(path), str(cf)])
                enc_s = time.time() - t0
                t0 = time.time()
                subprocess.run([str(exe), "-q", "d", str(cf), str(of)])
                dec_s = time.time() - t0
                ok = of.read_bytes() == path.read_bytes()
                rows.append((b, cf.stat().st_size, enc_s, dec_s, ok))
    print(f"{'codec':10} {'size':>12} {'bpb':>7} {'enc MB/s':>9} "
          f"{'dec MB/s':>9}  ok")
    for name, csize, enc_s, dec_s, ok in rows:
        print(
            f"{name:10} {csize:12,} {csize * 8 / n:7.3f} "
            f"{n / enc_s / 1e6:9.2f} {n / dec_s / 1e6:9.2f}  "
            f"{'OK' if ok else 'FAIL'}"
        )
        if not ok:
            sys.exit(1)


if __name__ == "__main__":
    main()
