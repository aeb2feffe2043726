"""Container-level tests across all codecs: header fidelity, multi-block
streams, stored fallback."""

import io

import numpy as np
import pytest

from comprox_tpu.codec.block import BlockParams
from comprox_tpu.codec.container import (
    ContainerParams,
    decode_stream,
    encode_stream,
    read_header,
)


def params_for(codec: bytes) -> ContainerParams:
    mode = {b"P": "P", b"R": "R", b"X": "X"}[codec]
    return ContainerParams(
        codec=codec,
        block=BlockParams(lanes=8, steps=128, mode=mode, min_len=5,
                          o3_bits=12, rolz_bits=10, rolz_depth=16),
    )


@pytest.mark.parametrize("codec", [b"P", b"R", b"X"])
def test_header_roundtrip_preserves_params(codec):
    cp = params_for(codec)
    buf = io.BytesIO()
    encode_stream(np.zeros(10, np.uint8), buf, cp, dictionary=False)
    buf.seek(0)
    cp2, flags = read_header(buf)
    assert cp2.block == cp.block, (cp2.block, cp.block)
    assert cp2.codec == codec


@pytest.mark.parametrize("codec", [b"P", b"R", b"X"])
def test_multiblock_stream_roundtrip(codec):
    cp = params_for(codec)
    rng = np.random.default_rng(1)
    text = b"some words repeat, some words do not repeat at all. "
    data = np.frombuffer(text * 90, np.uint8)[: cp.block.capacity * 4 + 77]
    data = data.copy()
    buf = io.BytesIO()
    encode_stream(data, buf, cp, dictionary=True)
    buf.seek(0)
    out = io.BytesIO()
    decode_stream(buf, out)
    assert out.getvalue() == data.tobytes()


def test_incompressible_stored_fallback():
    cp = params_for(b"R")
    rng = np.random.default_rng(2)
    data = rng.integers(0, 256, cp.block.capacity * 2, dtype=np.uint8)
    from comprox_tpu.codec.container import BLKHDR_LEN, HEADER_LEN

    buf = io.BytesIO()
    csize = encode_stream(data, buf, cp, dictionary=True)
    # stored fallback bounds expansion to fixed per-block framing overhead
    assert csize <= data.size + HEADER_LEN + 3 * BLKHDR_LEN
    buf.seek(0)
    out = io.BytesIO()
    decode_stream(buf, out)
    assert out.getvalue() == data.tobytes()


def test_precomp_only_roundtrip():
    """-p: dictionary substitution only, stored uncoded (ref -p flag)."""
    cp = params_for(b"R")
    words = b"precompress only mode stores substituted words verbatim "
    data = np.frombuffer(words * 200, np.uint8).copy()
    buf = io.BytesIO()
    csize = encode_stream(data, buf, cp, dictionary=True, precomp_only=True)
    buf.seek(0)
    out = io.BytesIO()
    decode_stream(buf, out)
    assert out.getvalue() == data.tobytes()
    assert csize < data.size  # substitution alone must shrink wordy text


def test_x_mode_capacity_cap():
    """Mode 'X' blocks above 16 MiB would alias dist >= 2^24 onto the
    repeat-distance symbol and encode undecodable archives (ADVICE r1)."""
    with pytest.raises(ValueError, match="16 MiB"):
        BlockParams(lanes=1024, steps=(1 << 24) // 1024 + 1, mode="X")
    BlockParams(lanes=1024, steps=(1 << 24) // 1024, mode="X")  # at cap: ok

    from comprox_tpu.cli.main import make_params

    cp = make_params("crx", {"block_mb": 64, "lanes": 256, "window": 250})
    assert cp.block.capacity <= 1 << 24  # CLI clamps oversized -b for crx


def test_knob_fingerprint_guard(monkeypatch):
    """Archives are self-describing about CPX_* model constants: decoding
    under different knobs fails with a clear error (ADVICE r1)."""
    from comprox_tpu.models import ppm

    cp = params_for(b"P")
    data = np.frombuffer(b"knob guard test data " * 40, np.uint8).copy()
    buf = io.BytesIO()
    encode_stream(data, buf, cp, dictionary=False)
    buf.seek(0)
    monkeypatch.setattr(ppm, "INC2", ppm.INC2 + 1)
    with pytest.raises(ValueError, match="model constants"):
        read_header(buf)


def test_archive_bitflip_fuzz():
    """Flip single bits across every field class of a real archive (header,
    dict blob, block headers, coded payload, stored block): decode must
    raise ValueError — never crash, hang, or return silently wrong bytes.
    Owns the corruption probe that found the historical dict-CRC bug."""
    cp = params_for(b"R")
    rng = np.random.default_rng(7)
    text = b"the words of this corpus repeat the words of this corpus. "
    data = np.frombuffer(text * 40, np.uint8).copy()
    # second block is incompressible -> stored fallback path in the same file
    data = np.concatenate(
        [data, rng.integers(0, 256, cp.block.capacity, dtype=np.uint8)]
    )
    buf = io.BytesIO()
    encode_stream(data, buf, cp, dictionary=True)
    archive = bytearray(buf.getvalue())
    positions = set(
        int(i) for i in rng.integers(0, len(archive), 24)
    ) | {0, 9, 12, 30, len(archive) - 1}  # magic, codec, geometry, tail
    for pos in sorted(positions):
        mut = bytearray(archive)
        mut[pos] ^= 1 << int(rng.integers(0, 8))
        out = io.BytesIO()
        try:
            decode_stream(io.BytesIO(bytes(mut)), out)
        except ValueError:
            continue  # clean rejection: the expected path
        assert out.getvalue() == data.tobytes(), (
            f"silent corruption from bit flip at offset {pos}"
        )


@pytest.mark.parametrize("codec", [b"P", b"R", b"X"])
def test_fuzzed_payload_fails_clean(codec):
    """Adversarial payloads must raise ValueError, never crash or hang
    (the reference decodes garbage silently, SURVEY §5)."""
    from comprox_tpu.codec.block import decode_block

    cp = params_for(codec)
    rng = np.random.default_rng(5)
    for trial in range(3):
        n_words = int(rng.integers(4, 200))
        payload = (
            np.array([n_words], np.uint32).tobytes()
            + rng.integers(0, 2**32, cp.block.lanes, dtype=np.uint32)
            .astype("<u4").tobytes()
            + rng.integers(0, 2**16, n_words, dtype=np.uint16)
            .astype("<u2").tobytes()
        )
        try:
            out = decode_block(payload, 500, cp.block)
            assert out.size == 500  # decoded garbage is acceptable...
        except ValueError:
            pass  # ...and a clean rejection is the expected path


def test_header_preserves_nondefault_format_fields():
    """Every format-relevant BlockParams field must survive the header at a
    NON-default value (the historical silent-corruption bug class: a field
    left at its default in tests hides a missing header ride)."""
    cp = ContainerParams(
        codec=b"R",
        block=BlockParams(lanes=16, steps=256, mode="R", min_len=6,
                          o3_bits=13, rolz_bits=11, rolz_depth=32,
                          rolz_ctx_bytes=4, short_depth=16, rolz_dec=2),
    )
    buf = io.BytesIO()
    encode_stream(np.zeros(10, np.uint8), buf, cp, dictionary=False)
    buf.seek(0)
    cp2, _ = read_header(buf)
    for f in ("lanes", "steps", "mode", "min_len", "o3_bits", "rolz_bits",
              "rolz_depth", "rolz_ctx_bytes", "short_depth", "rolz_dec"):
        assert getattr(cp2.block, f) == getattr(cp.block, f), f


def test_rolz_insert_decimation_roundtrip():
    """rolz_dec=2 halves bucket inserts; encode and decode must replay the
    identical decimated insert sequence (format knob, PERF.md rev-2 #2)."""
    rng = np.random.default_rng(11)
    words = [b"the ", b"quick ", b"brown ", b"fox ", b"jumps "]
    buf = b"".join(words[rng.integers(0, len(words))] for _ in range(2000))
    for dec in (2, 4):
        cp = ContainerParams(
            codec=b"R",
            block=BlockParams(lanes=8, steps=256, mode="R", min_len=5,
                              o3_bits=12, rolz_bits=10, rolz_depth=16,
                              rolz_dec=dec),
        )
        data = np.frombuffer(buf[: cp.block.capacity], np.uint8).copy()
        out = io.BytesIO()
        encode_stream(data, out, cp, dictionary=False)
        out.seek(0)
        dst = io.BytesIO()
        decode_stream(out, dst)
        assert dst.getvalue() == data.tobytes()


# --------------------------------------------------------------------------
# chain mode: PPM model carry-over across blocks (the reference's
# once-per-file model reset, src/main.c:174-206; opt-in via F_CHAIN)
# --------------------------------------------------------------------------


@pytest.mark.parametrize("codec", [b"P", b"R", b"X"])
def test_chain_mode_roundtrip_and_gain(codec):
    cp = params_for(codec)
    text = b"some words repeat, some words do not repeat at all. "
    data = np.frombuffer(text * 90, np.uint8)[: cp.block.capacity * 4 + 77]
    data = data.copy()
    sizes = {}
    for chain in (False, True):
        buf = io.BytesIO()
        sizes[chain] = encode_stream(
            data, buf, cp, dictionary=True, chain=chain
        )
        buf.seek(0)
        out = io.BytesIO()
        decode_stream(buf, out)
        assert out.getvalue() == data.tobytes(), f"chain={chain}"
    # model amortization must pay on repetitive multi-block text
    assert sizes[True] < sizes[False], sizes


def test_chain_mode_stored_block_mid_chain():
    """A stored-fallback block must leave the chained models untouched on
    BOTH sides (the decoder never models its bytes)."""
    cp = params_for(b"R")
    rng = np.random.default_rng(5)
    text = b"all work and no play makes jack a dull boy. " * 40
    cap = cp.block.capacity
    data = np.concatenate([
        np.frombuffer(text, np.uint8)[:cap],
        rng.integers(0, 256, cap, dtype=np.uint8),  # stored
        np.frombuffer(text, np.uint8)[:cap],
    ])
    buf = io.BytesIO()
    encode_stream(data, buf, cp, dictionary=False, chain=True)
    buf.seek(0)
    out = io.BytesIO()
    decode_stream(buf, out)
    assert out.getvalue() == data.tobytes()


def test_chain_mode_rejects_parallel_and_static():
    cp = params_for(b"R")
    data = np.zeros(100, np.uint8)
    with pytest.raises(ValueError, match="chain"):
        encode_stream(data, io.BytesIO(), cp, chain=True, group=4)
    from comprox_tpu.codec.container import ContainerParams as CP

    fcp = CP(codec=b"F", block=BlockParams(
        lanes=8, steps=128, mode="F", min_len=6, o3_bits=12,
        rolz_bits=10, rolz_depth=16))
    with pytest.raises(ValueError, match="chain"):
        encode_stream(data, io.BytesIO(), fcp, chain=True)


def test_chain_mode_decode_ignores_group():
    """Chained archives are sequentially dependent; a -g decode request
    must still produce correct output (sequential path forced)."""
    cp = params_for(b"R")
    text = b"the rain in spain falls mainly on the plain. " * 120
    data = np.frombuffer(text, np.uint8)[: cp.block.capacity * 3 + 13].copy()
    buf = io.BytesIO()
    encode_stream(data, buf, cp, dictionary=False, chain=True)
    buf.seek(0)
    out = io.BytesIO()
    decode_stream(buf, out, group=4)
    assert out.getvalue() == data.tobytes()


# --------------------------------------------------------------------------
# chain mode v2 (chain_match): ROLZ bucket table + previous-block bytes
# carry over — match reach spans two blocks (F_CHAIN_MATCH)
# --------------------------------------------------------------------------


def _cm_params() -> ContainerParams:
    import dataclasses

    cp = params_for(b"R")
    return ContainerParams(
        codec=b"R", block=dataclasses.replace(cp.block, chain_match=True)
    )


def test_chain_match_roundtrip_and_gain():
    """Multi-block text whose repeats span BLOCK boundaries must
    round-trip bit-exact and beat plain chain mode (the repeated
    content's sources live in the previous block — reachable only with
    the carried bucket table + window)."""
    cp_cm = _cm_params()
    cp = params_for(b"R")
    rng = np.random.default_rng(11)
    words = [b"alpha ", b"bravo ", b"charlie ", b"delta ", b"echo ",
             b"foxtrot ", b"golf ", b"hotel ", b"india ", b"juliet "]
    base = b"".join(
        words[int(i)] for i in rng.integers(0, len(words), 260)
    )[: cp.block.capacity]  # ~one block of non-self-repeating word salad
    data = np.frombuffer(base * 4, np.uint8)[: cp.block.capacity * 4 - 61]
    data = data.copy()
    sizes = {}
    for name, c in (("chain", cp), ("chain_match", cp_cm)):
        buf = io.BytesIO()
        sizes[name] = encode_stream(data, buf, c, dictionary=False,
                                    chain=True)
        buf.seek(0)
        out = io.BytesIO()
        decode_stream(buf, out)
        assert out.getvalue() == data.tobytes(), name
    assert sizes["chain_match"] < sizes["chain"], sizes


def test_chain_match_stored_block_mid_chain():
    """A stored block must leave the carried window AND bucket table
    untouched on both sides (the decoder skips stored blocks)."""
    cp = _cm_params()
    rng = np.random.default_rng(7)
    text = b"carry me across the stored block boundary, carefully. " * 30
    cap = cp.block.capacity
    data = np.concatenate([
        np.frombuffer(text, np.uint8)[:cap],
        rng.integers(0, 256, cap, dtype=np.uint8),  # stored fallback
        np.frombuffer(text, np.uint8)[:cap],
    ])
    buf = io.BytesIO()
    encode_stream(data, buf, cp, dictionary=False, chain=True)
    buf.seek(0)
    out = io.BytesIO()
    decode_stream(buf, out)
    assert out.getvalue() == data.tobytes()


def test_chain_match_requires_chain_and_mode_r():
    cp = _cm_params()
    data = np.zeros(100, np.uint8)
    with pytest.raises(ValueError, match="chain_match"):
        encode_stream(data, io.BytesIO(), cp, chain=False)
    with pytest.raises(ValueError, match="chain_match"):
        BlockParams(lanes=8, steps=128, mode="X", min_len=6, o3_bits=12,
                    chain_match=True)


def test_chain_match_header_flag_roundtrip():
    """F_CHAIN_MATCH must reconstruct chain_match at decode (a forgotten
    header field = silent corruption at non-default geometry)."""
    from comprox_tpu.codec.container import read_header, write_header

    cp = _cm_params()
    buf = io.BytesIO()
    write_header(buf, cp, flags=4 | 8)  # F_CHAIN | F_CHAIN_MATCH
    buf.seek(0)
    cp2, flags = read_header(buf)
    assert cp2.block.chain_match is True
    assert flags & 8
