"""Mode 'F' (static-table fast profile) round trips and fail-clean checks.

The oracle is round-trip equality, as for every codec (SURVEY.md §4); the
static tables additionally must serialize/normalize deterministically.
"""

import io

import numpy as np
import pytest

from comprox_tpu.codec.block import BlockParams
from comprox_tpu.codec.container import (
    ContainerParams,
    decode_stream,
    encode_stream,
)
from comprox_tpu.codec.fast import (
    M,
    decode_block_fast,
    encode_block_fast,
    normalize_freqs,
)

SMALL_F = BlockParams(lanes=8, steps=512, mode="F", min_len=6, window=64)


def corpus(name: str, n: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    if name == "random":
        return rng.integers(0, 256, n, dtype=np.uint8)
    if name == "zeros":
        return np.zeros(n, np.uint8)
    if name == "text":
        words = [b"the ", b"quick ", b"brown ", b"fox ", b"jumps ", b"over "]
        buf = b"".join(words[rng.integers(0, len(words))] for _ in range(n))
        return np.frombuffer(buf[:n], np.uint8).copy()
    if name == "period7":
        pat = rng.integers(0, 256, 7, dtype=np.uint8)
        return np.tile(pat, n // 7 + 1)[:n]
    raise KeyError(name)


def roundtrip(data, p=SMALL_F):
    payload = encode_block_fast(data, p)
    out = decode_block_fast(payload, data.size, p)
    np.testing.assert_array_equal(out, data)
    return payload


@pytest.mark.parametrize("name", ["random", "zeros", "text", "period7"])
def test_roundtrip_full_block(name):
    roundtrip(corpus(name, SMALL_F.capacity, seed=1))


@pytest.mark.parametrize("n", [1, 2, 7, 100, 511, 4095])
def test_roundtrip_partial_block(n):
    roundtrip(corpus("text", n, seed=2))


def test_ratio_text_beats_raw():
    data = corpus("text", SMALL_F.capacity, seed=3)
    payload = roundtrip(data)
    assert len(payload) < data.size


def test_normalize_freqs_exact_sum():
    import jax.numpy as jnp

    for h in (
        np.array([5, 0, 3, 1], np.int32),
        np.ones(282, np.int32),
        np.concatenate([[10**7], np.ones(281, np.int32)]),
        np.zeros(256, np.int32),  # absent class: mass lands on symbol 0
    ):
        s = np.asarray(normalize_freqs(jnp.asarray(h), h.size))
        assert s.sum() == M
        assert ((s > 0) | (h == 0)).all()
        assert (s[h == 0][1:] == 0).all() if (h == 0).any() else True


def test_container_crf_roundtrip():
    data = corpus("text", 3 * SMALL_F.capacity // 2, seed=4)
    cp = ContainerParams(codec=b"F", block=SMALL_F)
    buf = io.BytesIO()
    encode_stream(data, buf, cp, dictionary=True)
    buf.seek(0)
    out = io.BytesIO()
    decode_stream(buf, out)
    assert out.getvalue() == data.tobytes()


def test_fuzzed_payload_fails_clean():
    rng = np.random.default_rng(9)
    data = corpus("text", SMALL_F.capacity, seed=5)
    payload = bytearray(encode_block_fast(data, SMALL_F))
    for _ in range(8):
        mut = bytearray(payload)
        i = int(rng.integers(0, len(mut)))
        mut[i] ^= 1 << int(rng.integers(0, 8))
        try:
            out = decode_block_fast(bytes(mut), data.size, SMALL_F)
        except ValueError:
            continue
        # a flip that doesn't raise must not corrupt silently
        assert out.tobytes() == data.tobytes()


def test_fast_group_batched_matches_sequential():
    """F-mode single-chip block batching must produce byte-identical
    archives and round-trip through the batched decode path."""
    import io

    import numpy as np

    from comprox_tpu.codec.block import BlockParams
    from comprox_tpu.codec.container import (
        ContainerParams,
        decode_stream,
        encode_stream,
    )

    rng = np.random.default_rng(21)
    words = [b"fast ", b"static ", b"tables ", b"blocks ", b"entropy "]
    buf = b"".join(words[rng.integers(0, len(words))] for _ in range(4000))
    data = np.frombuffer(buf, np.uint8)[: 2048 * 5 + 123].copy()
    cp = ContainerParams(codec=b"F", block=BlockParams(
        lanes=8, steps=256, mode="F", min_len=6, window=32,
        o3_bits=12, rolz_bits=10, rolz_depth=16,
    ))
    seq, bat = io.BytesIO(), io.BytesIO()
    encode_stream(data, seq, cp, dictionary=False)
    encode_stream(data, bat, cp, dictionary=False, group=3)
    assert seq.getvalue() == bat.getvalue()
    bat.seek(0)
    out = io.BytesIO()
    decode_stream(bat, out, group=3)
    assert out.getvalue() == data.tobytes()
