"""Mesh data-parallel encode/decode over the virtual 8-device CPU mesh."""

import numpy as np

from comprox_tpu.codec.block import BlockParams, encode_block
from comprox_tpu.parallel.mesh import decode_blocks, encode_blocks, make_mesh

P_SMALL = BlockParams(lanes=8, steps=32, match=True, o3_bits=12)


def _data(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.choice(
        np.frombuffer(b"compress me compress me again \n", np.uint8), n
    ).astype(np.uint8)


def test_mesh_roundtrip_multiblock():
    mesh = make_mesh()  # all 8 virtual devices
    data = _data(P_SMALL.capacity * 11 + 37)  # non-multiple of devices
    payloads = encode_blocks(data, P_SMALL, mesh)
    ns = [
        min(P_SMALL.capacity, data.size - b * P_SMALL.capacity)
        for b in range(len(payloads))
    ]
    out = decode_blocks(payloads, ns, P_SMALL, mesh)
    np.testing.assert_array_equal(out, data)


def test_mesh_payloads_match_sequential():
    """Sharding is a pure throughput decision: mesh output must be
    bit-identical to single-device encode_block."""
    mesh = make_mesh(2)
    data = _data(P_SMALL.capacity * 3, seed=7)
    payloads = encode_blocks(data, P_SMALL, mesh)
    for b, payload in enumerate(payloads):
        blk = data[b * P_SMALL.capacity : (b + 1) * P_SMALL.capacity]
        assert payload == encode_block(blk, P_SMALL), f"block {b} differs"


def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    import jax

    jax.jit(fn).lower(*args)  # compile-check single device
    # 2 devices keeps the suite fast; the dryrun now runs PRODUCTION
    # table geometry (S=512, 1 MiB blocks, 2^18x64 ROLZ), ~2 min/device
    # on the virtual CPU mesh.  The driver runs the full 8-device pass.
    ge.dryrun_multichip(2)


def test_mesh_encode_stream_matches_sequential():
    """encode_stream(mesh=...) must produce a byte-identical archive."""
    import io

    from comprox_tpu.codec.container import ContainerParams, encode_stream

    cp = ContainerParams(codec=b"P", block=P_SMALL)
    data = _data(P_SMALL.capacity * 5 + 17, seed=9)
    seq, par = io.BytesIO(), io.BytesIO()
    encode_stream(data, seq, cp, dictionary=True)
    encode_stream(data, par, cp, dictionary=True, mesh=make_mesh(4))
    assert seq.getvalue() == par.getvalue()


def test_mesh_decode_stream_matches():
    import io

    from comprox_tpu.codec.container import (
        ContainerParams,
        decode_stream,
        encode_stream,
    )

    cp = ContainerParams(codec=b"P", block=P_SMALL)
    data = _data(P_SMALL.capacity * 6 + 5, seed=11)
    buf = io.BytesIO()
    encode_stream(data, buf, cp, dictionary=True)
    buf.seek(0)
    out = io.BytesIO()
    decode_stream(buf, out, mesh=make_mesh(4))
    assert out.getvalue() == data.tobytes()


def test_group_batched_encode_stream_matches_sequential():
    """Single-chip block batching (group=G, no mesh) must produce a
    byte-identical archive to the sequential path — vmap is a pure
    throughput decision."""
    import io

    from comprox_tpu.codec.container import ContainerParams, encode_stream

    cp = ContainerParams(codec=b"R", block=BlockParams(
        lanes=8, steps=32, mode="R", min_len=5, window=32,
        o3_bits=12, rolz_bits=10, rolz_depth=16,
    ))
    data = _data(cp.block.capacity * 5 + 17, seed=13)
    seq, bat = io.BytesIO(), io.BytesIO()
    encode_stream(data, seq, cp, dictionary=True)
    encode_stream(data, bat, cp, dictionary=True, group=4)
    assert seq.getvalue() == bat.getvalue()


def test_group_batched_decode_stream_matches():
    import io

    from comprox_tpu.codec.container import (
        ContainerParams,
        decode_stream,
        encode_stream,
    )

    cp = ContainerParams(codec=b"R", block=BlockParams(
        lanes=8, steps=32, mode="R", min_len=5, window=32,
        o3_bits=12, rolz_bits=10, rolz_depth=16,
    ))
    data = _data(cp.block.capacity * 6 + 5, seed=15)
    buf = io.BytesIO()
    encode_stream(data, buf, cp, dictionary=True, group=4)
    buf.seek(0)
    out = io.BytesIO()
    decode_stream(buf, out, group=4)
    assert out.getvalue() == data.tobytes()
