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
    buf = io.BytesIO()
    csize = encode_stream(data, buf, cp, dictionary=True)
    assert csize < data.size + 64  # stored fallback bounds expansion
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
