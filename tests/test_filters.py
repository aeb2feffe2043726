"""Filter-layer tests: x86 E8/E9 and BMP transforms, container integration.

The reference verifies filters only via whole-archive round trips; we add
direct invertibility tests per transform plus detection checks on real
binaries (any ELF on this machine) and synthetic BMPs.
"""

import io
import struct

import numpy as np
import pytest

from comprox_tpu.ops import filters as flt
from comprox_tpu.utils import native


def make_code(n, seed=0):
    """Synthetic x86-ish stream with embedded E8/E9 rel32 sites."""
    rng = np.random.default_rng(seed)
    buf = rng.integers(0, 256, n, dtype=np.uint8)
    for off in range(16, n - 16, 37):
        buf[off] = 0xE8 if off % 2 else 0xE9
        rel = int(rng.integers(-off, n - off))
        buf[off + 1 : off + 5] = np.frombuffer(
            struct.pack("<i", rel), np.uint8
        )
    return buf


def make_bmp(width=40, height=30, bpp=24, seed=1):
    rng = np.random.default_rng(seed)
    row_size = (width * (bpp // 8) + 3) & ~3
    pix_bytes = row_size * height
    hdr = struct.pack(
        "<2sIHHIIiihHIIiiII",
        b"BM", 54 + pix_bytes, 0, 0, 54, 40, width, height, 1, bpp,
        0, pix_bytes, 2835, 2835, 0, 0,
    )
    base = rng.integers(100, 120, (1, 1, bpp // 8))  # per-channel base
    grad = np.arange(width)[None, :, None] // 4
    vgrad = np.arange(height)[:, None, None] // 8
    pix = ((base + grad + vgrad) % 256).astype(np.uint8)
    rows = np.zeros((height, row_size), np.uint8)
    rows[:, : width * (bpp // 8)] = pix.reshape(height, -1)
    return np.frombuffer(hdr + rows.tobytes(), np.uint8).copy()


class TestE8E9:
    def test_invertible_native_or_python(self):
        buf = make_code(4096)
        orig = buf.copy()
        work = buf.copy()
        native.e8e9_transform(work, 0, work.size, encode=True)
        assert not np.array_equal(work, orig)  # it did something
        native.e8e9_transform(work, 0, orig.size, encode=False)
        np.testing.assert_array_equal(work, orig)

    def test_python_matches_native(self):
        if native.get_lib() is None:
            pytest.skip("no C toolchain")
        buf = make_code(2048, seed=3)
        a, b = buf.copy(), buf.copy()
        native._e8e9_python(a, 0, a.size, 0)
        lib = native.get_lib()
        lib.e8e9_transform(b.ctypes.data, b.size, 0, b.size, 0)
        np.testing.assert_array_equal(a, b)

    def test_improves_call_target_redundancy(self):
        # repeated calls to one target from different sites become equal
        n = 8192
        buf = np.zeros(n, np.uint8)
        target = 4000
        sites = list(range(64, 3000, 100))
        for off in sites:
            buf[off] = 0xE8
            rel = target - (off + 1)
            buf[off + 1 : off + 5] = np.frombuffer(
                struct.pack("<i", rel), np.uint8
            )
        work = buf.copy()
        native.e8e9_transform(work, 0, n, encode=True)
        ops = {work[o + 1 : o + 5].tobytes() for o in sites}
        assert len(ops) == 1  # all sites now encode the same absolute target


class TestBMP:
    @pytest.mark.parametrize("bpp", [24, 32])
    def test_detect_and_invert(self, bpp):
        data = make_bmp(bpp=bpp)
        spans = flt.detect_spans(data)
        assert len(spans) == 1 and spans[0].kind == flt.FT_BMP
        enc = flt.apply_spans(data, spans, encode=True)
        assert not np.array_equal(enc, data)
        dec = flt.apply_spans(enc, spans, encode=False)
        np.testing.assert_array_equal(dec, data)

    def test_gradient_compresses_flatter(self):
        data = make_bmp(width=64, height=64)
        spans = flt.detect_spans(data)
        enc = flt.apply_spans(data, spans, encode=True)
        # after decorrelation + deltas a gradient image is mostly near-zero
        assert (enc[54:] < 8).mean() > 0.5


class TestDetection:
    def test_real_elf_detected(self):
        with open("/bin/ls", "rb") as f:
            data = np.frombuffer(f.read(), np.uint8).copy()
        spans = flt.detect_spans(data)
        assert any(s.kind == flt.FT_X86 and s.off == 0 for s in spans)
        enc = flt.apply_spans(data, spans, encode=True)
        dec = flt.apply_spans(enc, spans, encode=False)
        np.testing.assert_array_equal(dec, data)

    def test_span_packing(self):
        spans = [
            flt.FilterSpan(flt.FT_X86, 0, 1000, 1000, 0),
            flt.FilterSpan(flt.FT_BMP, 2000, 500, 40, 120 | (24 << 24)),
        ]
        blob = flt.pack_spans(spans)
        got, off = flt.unpack_spans(blob + b"trailing")
        assert got == spans and off == len(blob)


def test_container_with_filters_roundtrip():
    from comprox_tpu.codec.block import BlockParams
    from comprox_tpu.codec.container import (
        ContainerParams,
        decode_stream,
        encode_stream,
    )

    bmp = make_bmp(width=32, height=20)
    text = np.frombuffer(b"some text around the image " * 20, np.uint8)
    data = np.concatenate([text, bmp, text]).copy()
    cp = ContainerParams(
        codec=b"P",
        block=BlockParams(lanes=8, steps=256, match=True, o3_bits=12),
    )
    buf = io.BytesIO()
    encode_stream(data, buf, cp, filters=True)
    buf.seek(0)
    out = io.BytesIO()
    decode_stream(buf, out)
    assert out.getvalue() == data.tobytes()
