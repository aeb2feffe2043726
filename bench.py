"""Benchmark driver: encodes+decodes a text corpus on the default platform
(the real TPU chip under axon) and prints ONE JSON line.

Metric: single-chip encode throughput in MB/s, with vs_baseline relative to
the reference comprox binary's measured encode speed on this class of
hardware-independent corpus (BASELINE.md: 16.2 MB/s on doc text, Xeon x4).
Round trip is verified bit-exact before any number is reported.

Capture-proofing (round-2 verdict #1: BENCH_r02 was an empty rc=1 after a
transient TPU backend outage): backend bring-up failures re-exec with
backoff up to BENCH_TRIES times, then fall back to a small CPU run, and
EVERY exit path prints a JSON line — the driver always records a number.

Env knobs:
  BENCH_MB      corpus size in MiB          (default 32)
  BENCH_LANES   lanes per block             (default 512)
  BENCH_BLOCK   block capacity in MiB       (default 8)
  BENCH_GROUP   blocks vmap-batched per device scan (default 1: the r3
                speed matrix measured G=4 SLOWER than G=1 on the v5e —
                R dec 0.93 vs 2.16 MB/s — vmapped table scatters scale
                super-linearly in G; see PERF.md)
  BENCH_TRIES   backend bring-up attempts   (default 5)
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
    if total < n_bytes and chunks:
        # enwik9-class sizes exceed the ~511 MB of real text on this image:
        # tile the real content cyclically.  Blocks are independent (models
        # reset per block), so repeated content re-runs the same work per
        # block — honest for speed/memory/scale claims (noted in PERF.md)
        base = list(chunks)
        i = 0
        while total < n_bytes:
            chunks.append(base[i % len(base)])
            total += len(base[i % len(base)])
            i += 1
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


def build_corpus_file(path: str, n_bytes: int) -> None:
    """Stream the SAME corpus bytes as build_corpus to ``path`` without
    ever holding the whole corpus (or its chunk list) in host memory —
    the scale runs memory-map the result (VERDICT r3 #7: 1 GiB peak RSS
    was dominated by whole-file host arrays, not the codec)."""
    total = 0
    with open(path, "wb") as f:

        def put(b: bytes) -> int:
            nonlocal total
            take = min(len(b), n_bytes - total)
            f.write(b[:take])
            total += take
            return total

        for p in sorted(Path("/usr/share/doc").rglob("copyright")):
            try:
                b = p.read_bytes()
            except OSError:
                continue
            if put(b) >= n_bytes:
                return
        for root in ("/opt/venv/lib", "/usr/lib/python3.11"):
            if total >= n_bytes:
                return
            for p in sorted(Path(root).rglob("*.py")):
                try:
                    b = p.read_bytes()
                except OSError:
                    continue
                if put(b) >= n_bytes:
                    return
        # tile: re-read what was already written (same cyclic content as
        # build_corpus's chunk recycling, which repeats the real content
        # in the same order)
        base = total
        if base == 0:
            rng = np.random.default_rng(42)
            words = [b"the ", b"compression ", b"of ", b"data ", b"blocks ",
                     b"with ", b"adaptive ", b"models ", b"and ", b"entropy ",
                     b"coding ", b"on ", b"tensor ", b"processing ", b"units "]
            while total < n_bytes:
                put(words[int(rng.integers(0, len(words)))])
            return
        f.flush()
        with open(path, "rb") as r:
            off = 0
            while total < n_bytes:
                r.seek(off)
                b = r.read(min(1 << 24, base - off, n_bytes - total))
                if not b:
                    off = 0
                    continue
                off += len(b)
                put(b)


def emit(metric: str, value: float, extra: str = "") -> None:
    """The one JSON line the driver records; every exit path lands here."""
    print(
        json.dumps(
            {
                "metric": metric + (f" [{extra}]" if extra else ""),
                "value": round(value, 3),
                "unit": "MB/s",
                "vs_baseline": round(value / REF_ENCODE_MBPS, 4),
            }
        ),
        flush=True,
    )


def _reexec(extra_env: dict) -> None:
    env = dict(os.environ)
    env.update({k: str(v) for k, v in extra_env.items()})
    os.execve(sys.executable, [sys.executable, os.path.abspath(__file__)], env)


def _backend_or_fallback() -> str:
    """Bring up the JAX backend; on failure re-exec with backoff (a failed
    backend init is cached in-process, so retry means a fresh interpreter),
    finally degrading to a small CPU-only run.

    The probe runs in a SUBPROCESS with a hard deadline first: a remote-
    TPU outage makes backend init HANG for ~25 minutes (measured round 3),
    which would otherwise turn the retry loop into hours of dead air."""
    tries = int(os.environ.get("BENCH_TRIES", "5"))
    attempt = int(os.environ.get("BENCH_ATTEMPT", "0"))
    probe_s = float(os.environ.get("BENCH_INIT_TIMEOUT", "300"))
    try:
        if os.environ.get("JAX_PLATFORMS") != "cpu":
            import subprocess

            r = subprocess.run(
                [
                    sys.executable,
                    "-c",
                    "import jax; d = jax.devices();"
                    "v = jax.numpy.arange(8) + 1;"
                    "assert int(v.sum()) == 36;"
                    "print(d[0].platform)",
                ],
                capture_output=True,
                text=True,
                timeout=probe_s,
            )
            if r.returncode != 0:
                raise RuntimeError(
                    f"probe rc={r.returncode}: {r.stderr[-300:]}"
                )
        import jax

        plat = jax.devices()[0].platform
        # smoke computation: backend registration alone can succeed while
        # the remote chip is unreachable
        v = jax.numpy.arange(8) + 1
        assert int(v.sum()) == 36
        return plat
    except Exception as e:  # noqa: BLE001
        sys.stderr.write(f"bench: backend bring-up failed: {e!r}\n")
        if attempt + 1 < tries:
            time.sleep(min(60, 15 * (attempt + 1)))
            _reexec({"BENCH_ATTEMPT": attempt + 1})
        if os.environ.get("JAX_PLATFORMS") != "cpu":
            # final fallback: a degraded CPU measurement beats an empty
            # rc=1 record
            _reexec(
                {
                    "JAX_PLATFORMS": "cpu",
                    "PALLAS_AXON_POOL_IPS": "",
                    "BENCH_ATTEMPT": 0,
                    "BENCH_DEGRADED": "cpu-fallback",
                    "BENCH_MB": min(
                        float(os.environ.get("BENCH_MB", "32")), 1.0
                    ),
                    "BENCH_BLOCK": 0.25,
                    "BENCH_LANES": 256,
                    "BENCH_GROUP": 1,
                }
            )
        emit(
            "single-chip encode throughput (BACKEND UNAVAILABLE, "
            f"{type(e).__name__})",
            0.0,
        )
        sys.exit(0)


def main() -> None:
    corpus_mb = float(os.environ.get("BENCH_MB", "32"))
    lanes = int(os.environ.get("BENCH_LANES", "512"))
    block_mb = float(os.environ.get("BENCH_BLOCK", "8"))
    group = int(os.environ.get("BENCH_GROUP", "1"))
    degraded = os.environ.get("BENCH_DEGRADED", "")

    plat = _backend_or_fallback()

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

    try:
        # warmup: compile encode+decode at the run's exact geometry and
        # group shape (a 1-block input pads to the same [G, S, T] batch)
        warm = data[: min(bp.capacity, 1 << 20)]
        buf = io.BytesIO()
        container.encode_stream(warm, buf, cp, group=group)
        buf.seek(0)
        out = io.BytesIO()
        container.decode_stream(buf, out, group=group)
        assert out.getvalue() == warm.tobytes(), "warmup round trip failed"

        # timed encode
        t0 = time.time()
        buf = io.BytesIO()
        csize = container.encode_stream(data, buf, cp, group=group)
        enc_s = time.time() - t0

        # timed decode + verification
        buf.seek(0)
        out = io.BytesIO()
        t0 = time.time()
        container.decode_stream(buf, out, group=group)
        dec_s = time.time() - t0
        ok = out.getvalue() == data.tobytes()
    except Exception as e:  # noqa: BLE001
        sys.stderr.write(f"bench: run failed: {e!r}\n")
        if group > 1:
            # e.g. HBM OOM on the batched path: retry unbatched
            _reexec({"BENCH_GROUP": 1, "BENCH_DEGRADED": "group=1 retry"})
        emit(
            f"single-chip encode throughput (RUN FAILED, {type(e).__name__})",
            0.0,
            degraded,
        )
        sys.exit(0)
    if not ok:
        emit("encode MB/s (ROUND TRIP FAILED)", 0.0, degraded)
        sys.exit(1)

    enc_mbps = data.size / enc_s / 1e6
    dec_mbps = data.size / dec_s / 1e6
    bpb = csize * 8 / data.size

    # comparability (round-3 verdict #5): this config is PINNED to the
    # BENCH_r03 run (32MiB corpus, mode R, 8MiB blocks, G=1, 512 lanes);
    # the metric text carries the explicit delta vs that record, and any
    # future corpus/knob change must be spelled out here too.
    r03 = 0.254  # BENCH_r03.json, same corpus + config
    vs_r03 = (
        f", r03 same-config 0.254 MB/s ({(enc_mbps / r03 - 1) * 100:+.0f}%)"
        if corpus_mb == 32 and block_mb == 8 and group == 1 and lanes == 512
        else ", CONFIG DIFFERS FROM r03 (0.254 MB/s at 32MiB/R/8MiB/G1/512)"
    )

    # fast profile on the SAME corpus bytes: mode F2's speed story, in
    # the metric text only (headline value stays the r03-comparable R
    # number).  Failure here must not erase the headline.
    f_txt = ""
    try:
        from comprox_tpu.cli.main import make_params

        fp = make_params("crf", {"lanes": lanes, "block_mb": block_mb})
        warm = data[: min(fp.block.capacity, 1 << 20)]
        buf = io.BytesIO()
        container.encode_stream(warm, buf, fp, group=1)
        buf.seek(0)
        out = io.BytesIO()
        container.decode_stream(buf, out, group=1)
        assert out.getvalue() == warm.tobytes()
        t0 = time.time()
        buf = io.BytesIO()
        fsize = container.encode_stream(data, buf, fp, group=1)
        f_enc = data.size / (time.time() - t0) / 1e6
        buf.seek(0)
        out = io.BytesIO()
        t0 = time.time()
        container.decode_stream(buf, out, group=1)
        f_dec = data.size / (time.time() - t0) / 1e6
        if out.getvalue() == data.tobytes():
            f_txt = (
                f"; fast profile crf same corpus: enc {f_enc:.2f} /"
                f" dec {f_dec:.2f} MB/s, {fsize * 8 / data.size:.3f} bpb"
            )
    except Exception as e:  # noqa: BLE001
        sys.stderr.write(f"bench: crf extra run failed: {e!r}\n")

    # flagship ratio witness (round-5 verdict #8): single-block crz on the
    # first 8 MiB of the same corpus (= build_corpus(8 MiB) exactly —
    # build_corpus is prefix-consistent), vs the reference binaries run on
    # those IDENTICAL bytes (BASELINE.md flagship-corpus table, md5
    # d0246b7b).  Metric text only; headline value stays r03-comparable.
    r_txt = ""
    try:
        if corpus_mb >= 8 and block_mb == 8 and lanes == 512:
            from comprox_tpu.cli.main import make_params

            rp = make_params("crz", {"lanes": lanes, "block_mb": 8})
            flag = data[: 8 << 20]
            buf = io.BytesIO()
            rsize = container.encode_stream(flag, buf, rp, group=1)
            buf.seek(0)
            out = io.BytesIO()
            container.decode_stream(buf, out, group=1)
            if out.getvalue() == flag.tobytes():
                r_txt = (
                    f"; flagship crz 8MiB single block: {rsize * 8 / flag.size:.4f}"
                    " bpb vs ref-on-identical-bytes comprox 0.4109 /"
                    " comprolz 0.3947 / comprop 0.4097"
                )
    except Exception as e:  # noqa: BLE001
        sys.stderr.write(f"bench: flagship ratio extra run failed: {e!r}\n")

    emit(
        f"single-chip encode throughput, {corpus_mb:g}MiB doc-text corpus,"
        f" {plat}, block={block_mb:g}MiB x{group}-batched, round-trip"
        f" verified (decode {dec_mbps:.2f} MB/s, ratio"
        f" {csize / data.size:.4f}, {bpb:.3f} bpb{vs_r03}{f_txt}{r_txt})",
        enc_mbps,
        degraded,
    )


if __name__ == "__main__":
    main()
