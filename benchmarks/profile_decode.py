"""Profile one decode (and optionally encode) scan on the real chip and
aggregate device op time by fused-op name (PERF.md methodology: per-op
microbenchmarks mislead; the profile's fusion/copy names matched against
compiled HLO metadata find the real step costs).

Usage: python benchmarks/profile_decode.py [MB] [lanes]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    lanes = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    import jax

    from bench import build_corpus
    from comprox_tpu.codec.block import BlockParams, decode_block, encode_block
    from comprox_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    n = int(mb * 1048576)
    data = build_corpus(n)
    p = BlockParams(
        lanes=lanes, steps=-(-n // lanes), mode="R", min_len=5,
        rolz_ctx_bytes=4 if n >= 4 * 1048576 else 3,
    )
    print(f"geometry lanes={p.lanes} steps={p.steps}", flush=True)
    t0 = time.time()
    payload = encode_block(data, p)
    print(f"encode warm+compile {time.time()-t0:.1f}s "
          f"({8*len(payload)/n:.4f} bpb)", flush=True)
    t0 = time.time()
    out = decode_block(payload, n, p)
    print(f"decode warm+compile {time.time()-t0:.1f}s", flush=True)
    assert bytes(out) == bytes(data), "round trip failed"

    tdir = "/tmp/cpx_profile"
    with jax.profiler.trace(tdir):
        t0 = time.time()
        out = decode_block(payload, n, p)
        jax.block_until_ready(out)
        dec_s = time.time() - t0
    print(f"decode {dec_s:.2f}s = {n/1e6/dec_s:.2f} MB/s "
          f"({dec_s/p.steps*1e6:.0f} us/step)", flush=True)

    # aggregate the trace
    paths = sorted(glob.glob(tdir + "/**/*.trace.json.gz", recursive=True))
    if not paths:
        print("no trace found", flush=True)
        return
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    agg = collections.Counter()
    cnt = collections.Counter()
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        pid_name = ev.get("pid")
        name = ev.get("name", "")
        # device lanes only: heuristic — op names with dots or fusion/copy
        if any(k in name for k in ("fusion", "copy", "dynamic", "scatter",
                                   "gather", "dot", "convert", "loop",
                                   "while", "reduce", "broadcast", "iota",
                                   "select", "slice", "transpose", "concat",
                                   "bitcast", "compare", "add", "multiply")):
            agg[name] += ev["dur"]
            cnt[name] += 1
    total = sum(agg.values())
    print(f"\ntop device ops (of {total/1e3:.1f} ms aggregated):")
    top = agg.most_common(25)
    for name, dur in top:
        print(f"  {dur/1e3:9.2f} ms  x{cnt[name]:<6} {name[:90]}")

    # map fusion names to source lines via compiled HLO metadata
    import jax.numpy as jnp

    from comprox_tpu.codec.block import _decode_scan
    from comprox_tpu.ops.rans_scalar import RANS_L

    states = jnp.full((p.lanes,), RANS_L, jnp.uint32)
    stream = jnp.zeros((p.stream_pad,), jnp.uint16)
    hlo = (
        jax.jit(_decode_scan, static_argnums=(0,))
        .lower(p, states, stream, jnp.int32(n))
        .compile()
        .as_text()
    )
    import re

    wanted = {name.split("/")[-1] for name, _ in top[:12]}
    print("\nsource attribution:")
    for m in re.finditer(r"^\s*%?([\w.\-]+)\s*=.*?metadata=\{([^}]*)\}",
                         hlo, re.M):
        opname, meta = m.group(1), m.group(2)
        if opname.rstrip(".0123456789") not in {
            w.rstrip(".0123456789") for w in wanted
        }:
            continue
        if opname not in wanted and opname.split(".")[0] not in wanted:
            continue
        f = re.search(r'source_file="([^"]*)"', meta)
        ln = re.search(r"source_line=(\d+)", meta)
        op = re.search(r'op_name="([^"]*)"', meta)
        print(f"  {opname}: {f.group(1).split('/')[-1] if f else '?'}:"
              f"{ln.group(1) if ln else '?'}  {op.group(1)[:80] if op else ''}")
        wanted.discard(opname)


if __name__ == "__main__":
    main()
