"""Round-trip tests for the block codec (LZP + PPM + interleaved rANS).

The reference's only oracle is round-trip equality (SURVEY.md §4,
benchmark/Makefile:40-46); we apply it across adversarial content classes
and block geometries, plus compression-ratio sanity vs raw size.
"""

import numpy as np
import pytest

from comprox_tpu.codec.block import BlockParams, decode_block, encode_block

SMALL = BlockParams(lanes=8, steps=64, match=True, min_len=6, window=32,
                    o3_bits=14)
SMALL_R = BlockParams(lanes=8, steps=64, mode="R", min_len=5, window=32,
                      o3_bits=14, rolz_bits=10, rolz_depth=16)
SMALL_X = BlockParams(lanes=8, steps=64, mode="X", min_len=6, window=32,
                      o3_bits=14, rolz_bits=10, rolz_depth=16)
SMALL_NOMATCH = BlockParams(lanes=8, steps=64, match=False, o3_bits=14)
ALL_MODES = {"P": SMALL, "R": SMALL_R, "X": SMALL_X}


def roundtrip(data: np.ndarray, p: BlockParams) -> bytes:
    payload = encode_block(data, p)
    out = decode_block(payload, data.size, p)
    np.testing.assert_array_equal(out, data)
    return payload


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
    if name == "lowentropy":
        return rng.choice(
            np.arange(4, dtype=np.uint8), n, p=[0.85, 0.1, 0.04, 0.01]
        ).astype(np.uint8)
    raise KeyError(name)


@pytest.mark.parametrize("mode", ["P", "R", "X"])
@pytest.mark.parametrize("name", ["random", "zeros", "text", "period7", "lowentropy"])
def test_roundtrip_full_block(name, mode):
    roundtrip(corpus(name, SMALL.capacity, seed=1), ALL_MODES[mode])


@pytest.mark.parametrize("mode", ["P", "R", "X"])
@pytest.mark.parametrize("n", [1, 2, 7, 63, 64, 65, 100, 511, 512])
def test_roundtrip_partial_block(n, mode):
    roundtrip(corpus("text", n, seed=2), ALL_MODES[mode])


def test_roundtrip_no_match_layer(self=None):
    for name in ["random", "text", "zeros"]:
        roundtrip(corpus(name, 300, seed=3), SMALL_NOMATCH)


def test_ratio_text_beats_raw():
    data = corpus("text", SMALL.capacity, seed=4)
    payload = roundtrip(data, SMALL)
    # 8 lanes * 4B state + 4B header = 36B overhead; text must still win
    assert len(payload) < data.size


def test_ratio_zeros_strongly_compressed():
    data = corpus("zeros", SMALL.capacity, seed=5)
    payload = roundtrip(data, SMALL)
    assert len(payload) < data.size // 3


def test_all_byte_values():
    data = np.arange(512, dtype=np.uint32).astype(np.uint8)
    roundtrip(data, SMALL)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


def test_roundtrip_medium_geometry():
    """Geometry-sensitive regression (bugs have appeared only at larger
    S/T than the tiny test params): one medium block per codec mode."""
    for mode, ml in [("P", 4), ("R", 5), ("X", 8)]:
        p = BlockParams(lanes=64, steps=512, mode=mode, min_len=ml,
                        o3_bits=16, rolz_bits=12, rolz_depth=32)
        roundtrip(corpus("text", p.capacity - 13, seed=42), p)


@pytest.mark.parametrize("name", ["text", "random", "period7"])
def test_roundtrip_rolz_ctx4(name):
    """4-byte ROLZ bucket contexts (large-block rule, rolzmain/
    cr-matcher.c:38-42) must round-trip through the shared insert/query
    path on both sides."""
    p = BlockParams(lanes=8, steps=64, mode="R", min_len=5, window=32,
                    o3_bits=14, rolz_bits=10, rolz_depth=16,
                    rolz_ctx_bytes=4)
    roundtrip(corpus(name, p.capacity, seed=5), p)


@pytest.mark.parametrize("name", ["text", "period7", "lowentropy"])
def test_roundtrip_short_table(name):
    """ROLZ secondary short-match table (rolzmain/cr-matcher.c:165-179):
    idx symbols rolz_depth..+D-1 name short-table ranks; decode resolves
    them via the exact one-hot-matmul table replay.  Off by default
    (ratio-negative on doc text, PERF.md) but the format supports it."""
    p = BlockParams(lanes=8, steps=128, mode="R", min_len=5, window=32,
                    o3_bits=14, rolz_bits=10, rolz_depth=16, short_depth=16)
    roundtrip(corpus(name, p.capacity, seed=6), p)


def test_x_parse_decisions_causal():
    """Regression: the rep-aware second parse (X flexible parsing) once
    emitted repeat-source decisions whose source step was >= t — lanes
    decode in lock-step, so the decoder would copy bytes not yet
    produced.  Every emitted decision must satisfy src % steps < t.
    Found by a CLI round trip at 64x512 on C-like source text (smaller
    geometries and word-salad corpora dodge it)."""
    import jax.numpy as jnp

    from comprox_tpu.codec import block as B

    p = BlockParams(lanes=64, steps=512, mode="X", min_len=6, window=64,
                    o3_bits=14, rolz_bits=12, rolz_depth=16)
    # adversarial construction: at step 0 the simulated prev_dist is the
    # init value 1, so a run of identical NON-zero bytes crossing a lane
    # boundary yields a rep candidate whose source is the PREVIOUS lane's
    # step 511 — decoded later in lock-step.  Only the causal mask rejects
    # it (all-zero runs hide the bug: the unwritten decode buffer is 0).
    data = np.random.default_rng(8).integers(
        0, 256, p.capacity, dtype=np.uint8
    )
    data[4 * p.steps - 8 : 4 * p.steps + 12] = 0x41
    n = data.size
    inp = jnp.asarray(data.reshape(p.lanes, p.steps))
    inp_flat = inp.reshape(-1)
    inp_w32 = B._pack_words(inp_flat)
    inp_pad = jnp.pad(inp, ((0, 0), (0, p.window + 1)))
    _, take, src = B._search_and_parse(p, inp_pad, inp_flat, inp_w32, n)
    take, src = np.asarray(take), np.asarray(src)
    t_grid = np.arange(p.steps)[:, None]
    bad = (take > 0) & ((src % p.steps) >= t_grid)
    assert not bad.any(), f"{bad.sum()} non-causal parse decisions"
    # Backward-source invariant: X codes dist = pos - src >= 1, so every
    # accepted decision must point strictly backward in POSITION space
    # too (bucket entries from higher lanes at earlier steps are
    # step-causal but unexpressible; the searcher masks them pre-top-k).
    pos_grid = np.arange(p.lanes)[None, :] * p.steps + t_grid
    fwd = (take > 0) & (src >= pos_grid)
    assert not fwd.any(), f"{fwd.sum()} forward-source parse decisions"
    roundtrip(data, p)


@pytest.mark.slow
def test_roundtrip_bench_geometry():
    """Bench-class geometry (S=512 — the production lane count) with a
    multi-100KB block per codec mode; the two historical bug classes
    (header-field omission, silent numeric corruption) only appeared at
    geometries the small tests never reach."""
    rng = np.random.default_rng(17)
    words = [b"the ", b"compression ", b"of ", b"blocks ", b"entropy ",
             b"coding ", b"adaptive ", b"models ", b"tensor ", b"units "]
    buf = b"".join(words[rng.integers(0, len(words))] for _ in range(80000))
    for mode, ml in [("R", 5), ("X", 6), ("P", 4)]:
        p = BlockParams(lanes=512, steps=512, mode=mode, min_len=ml,
                        o3_bits=16, rolz_bits=14, rolz_depth=32)
        roundtrip(
            np.frombuffer(buf[: p.capacity - 7], np.uint8).copy(), p
        )


def test_parse_dp_cost_saturation(monkeypatch):
    """Regression (advisor, round 2): when per-lane cost-to-go exceeds
    _P_INF (long low-match blocks: ~74,900 literal steps at _P_LIT_R=14),
    masked no-candidate entries in _cand_min_cost keyed at _P_INF*256
    became CHEAPER than real saturating costs, so the parse emitted bogus
    matches (take=256, src=0) with zero admissible candidates — silently
    corrupt archives.  Reproduced here at small geometry by inflating the
    literal price so steps*lit blows past _P_INF, on incompressible data
    (no real candidates to hide behind)."""
    from comprox_tpu.codec import block as B

    # 4096 * 1200 = 4.9M > _P_INF = 2^22: overflow by step ~3500
    monkeypatch.setattr(B, "_P_LIT_R", 1200)
    p = BlockParams(lanes=8, steps=4096, mode="R", min_len=5, window=32,
                    o3_bits=14, rolz_bits=10, rolz_depth=16)
    data = np.random.default_rng(99).integers(
        0, 256, p.capacity, dtype=np.uint8
    )
    roundtrip(data, p)


def test_parse_dp_no_candidate_never_wins():
    """Unit form of the saturation invariant: with cost-to-go already at
    the cap and NO admissible candidate (length=0), _parse_body must pick
    the literal, never a bogus match."""
    import jax.numpy as jnp

    from comprox_tpu.codec import block as B

    p = BlockParams(lanes=8, steps=64, mode="R", min_len=5, window=32,
                    o3_bits=14, rolz_bits=10, rolz_depth=16)
    cw = jnp.full((p.lanes, p.window), B._P_INF - 1, jnp.int32)
    zero = jnp.zeros((p.lanes,), jnp.int32)
    xs = (zero, zero, zero, zero)  # t=0, length=0, src=0, idx=0
    cw2, (take, src, _idx) = B._parse_body(p, p.capacity, cw, xs, n_c=1)
    assert int(np.asarray(take).max()) == 0, "bogus match with no candidate"
    assert int(np.asarray(cw2).max()) < B._P_INF, "stored cost not saturated"


def test_stream_read_strategies_bit_identical():
    """CPX_STREAM_READ is a pure decode-side performance knob: all three
    strategies must read the identical words from the identical stream
    (round-5 lane-sweep infrastructure; PERF.md F2 strategy table)."""
    import jax

    from comprox_tpu.ops import rans

    data = corpus("text", SMALL_R.lanes * SMALL_R.steps)
    payload = encode_block(data, SMALL_R)
    prior = rans.STREAM_READ
    try:
        for strat in ("onehot", "sort", "gather", "auto"):
            rans.STREAM_READ = strat
            jax.clear_caches()  # retrace: the knob binds at trace time
            out = decode_block(payload, data.size, SMALL_R)
            np.testing.assert_array_equal(out, data)
    finally:
        rans.STREAM_READ = prior
        jax.clear_caches()
