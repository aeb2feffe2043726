"""Container format + file driver.

TPU re-architecture of the reference file driver (/root/reference/src/
main.c:89-305): magic header, optional dictionary blob, then a sequence of
independently coded blocks with per-block headers and a stored-block
fallback (roxmain/cr-coder.c:273-275).  One deliberate format change vs the
reference (SURVEY.md §5 checkpoint/resume): model state resets **per block**,
making every block an independently decodable unit — this is what unlocks
block-level data parallelism across a TPU mesh and restartable decode.

Layout (all little-endian):

    magic    8B   b"CPXTPU01"
    codec    1B   b'P' (LZP) / b'X' (LZ77) / b'R' (ROLZ)
    flags    1B   bit0: dictionary present, bit1: filters enabled
    lanes    2B   u16  S
    steps    4B   u32  T   (block capacity = S*T bytes)
    [dict blob: u32 len + payload]                 (if flags bit0)
    repeat:
        raw_n    4B   u32  raw bytes in this block (0 terminates)
        blen     4B   u32  payload length
        bflags   1B   bit0: stored (raw bytes follow, uncoded)
                      bit1: filtered
                      bit2: dictionary-coded
        payload  blen bytes
    end:
        raw_n=0 sentinel
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import BinaryIO, Callable, Iterator, Optional

import numpy as np

from comprox_tpu.codec.block import BlockParams, decode_block, encode_block

MAGIC = b"CPXTPU01"
BF_STORED = 1
BF_FILTERED = 2
BF_DICT = 4
F_DICT = 1
F_FILTER = 2


@dataclass(frozen=True)
class ContainerParams:
    codec: bytes = b"P"
    block: BlockParams = BlockParams()


def write_header(f: BinaryIO, cp: ContainerParams, flags: int = 0) -> None:
    b = cp.block
    f.write(MAGIC)
    f.write(cp.codec)
    f.write(
        struct.pack(
            "<BHIBBB",
            flags,
            b.lanes,
            b.steps,
            b.o3_bits,
            b.min_len,
            1 if b.match else 0,
        )
    )


def read_header(f: BinaryIO) -> tuple[ContainerParams, int]:
    magic = f.read(8)
    if magic != MAGIC:
        raise ValueError(f"bad magic {magic!r}: not a comprox_tpu archive")
    codec = f.read(1)
    flags, lanes, steps, o3_bits, min_len, match = struct.unpack(
        "<BHIBBB", f.read(10)
    )
    bp = BlockParams(
        lanes=lanes,
        steps=steps,
        match=bool(match),
        min_len=min_len,
        o3_bits=o3_bits,
    )
    return ContainerParams(codec=codec, block=bp), flags


def iter_blocks(data: np.ndarray, capacity: int) -> Iterator[np.ndarray]:
    for off in range(0, data.size, capacity):
        yield data[off : off + capacity]


def encode_stream(
    src: np.ndarray,
    dst: BinaryIO,
    cp: ContainerParams,
    encode_fn: Optional[Callable] = None,
    progress: Optional[Callable[[int, int], None]] = None,
    filters: bool = False,
) -> int:
    """Encode ``src`` into ``dst``; returns compressed byte count."""
    encode_fn = encode_fn or (lambda blk: encode_block(blk, cp.block))
    write_header(dst, cp, flags=F_FILTER if filters else 0)
    written = 19
    total = src.size
    done = 0
    for raw_blk in iter_blocks(src, cp.block.capacity):
        blk = raw_blk
        bflags = 0
        prefix = b""
        if filters:
            from comprox_tpu.ops import filters as flt

            spans = flt.detect_spans(blk)
            if spans:
                blk = flt.apply_spans(blk, spans, encode=True)
                prefix = flt.pack_spans(spans)
                bflags |= BF_FILTERED
        payload = prefix + encode_fn(blk)
        if len(payload) >= raw_blk.size:  # stored fallback, raw unfiltered
            payload, bflags = raw_blk.tobytes(), BF_STORED
        blk = raw_blk
        dst.write(struct.pack("<IIB", blk.size, len(payload), bflags))
        dst.write(payload)
        written += 9 + len(payload)
        done += blk.size
        if progress:
            progress(done, total)
    dst.write(struct.pack("<IIB", 0, 0, 0))
    return written + 9


def decode_stream(
    src: BinaryIO,
    dst: BinaryIO,
    decode_fn: Optional[Callable] = None,
    progress: Optional[Callable[[int, int], None]] = None,
) -> int:
    """Decode an archive; returns raw byte count."""
    cp, _flags = read_header(src)
    decode_fn = decode_fn or (
        lambda payload, n: decode_block(payload, n, cp.block)
    )
    total = 0
    while True:
        hdr = src.read(9)
        if len(hdr) < 9:
            raise ValueError("truncated archive: missing block header")
        raw_n, blen, bflags = struct.unpack("<IIB", hdr)
        if raw_n == 0:
            break
        payload = src.read(blen)
        if len(payload) < blen:
            raise ValueError("truncated archive: short block payload")
        spans = []
        if bflags & BF_FILTERED and not bflags & BF_STORED:
            from comprox_tpu.ops import filters as flt

            spans, off = flt.unpack_spans(payload)
            payload = payload[off:]
        if bflags & BF_STORED:
            out = np.frombuffer(payload, np.uint8)
        else:
            out = decode_fn(payload, raw_n)
        if spans:
            from comprox_tpu.ops import filters as flt

            out = flt.apply_spans(out, spans, encode=False)
        dst.write(out.tobytes())
        total += raw_n
        if progress:
            progress(total, total)
    return total
