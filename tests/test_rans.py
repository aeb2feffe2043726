"""Differential tests: vectorized rANS (ops.rans) vs the scalar oracle.

Strategy mirrors SURVEY.md §4: the reference has round-trip-only testing; we
add the stream-level differential tests it lacks — every lane of the
vectorized coder must produce byte-identical streams to the scalar spec.
"""

import numpy as np
import pytest

from comprox_tpu.ops import rans_scalar as rs


def random_events(rng, n, max_tot=rs.M):
    """Random raw (cum, frq, tot) coding events."""
    events = []
    for _ in range(n):
        tot = int(rng.integers(1, max_tot + 1))
        frq = int(rng.integers(1, tot + 1))
        cum = int(rng.integers(0, tot - frq + 1))
        events.append((cum, frq, tot))
    return events


class TestScalarOracle:
    def test_norm_cf_bounds(self):
        rng = np.random.default_rng(0)
        for cum, frq, tot in random_events(rng, 2000):
            c, f = rs.norm_cf(cum, frq, tot)
            assert f >= 1
            assert 0 <= c and c + f <= rs.M

    def test_norm_cf_partition(self):
        # normalized intervals of a full distribution exactly tile [0, M)
        rng = np.random.default_rng(1)
        for _ in range(200):
            k = int(rng.integers(2, 40))
            freqs = rng.integers(0, 50, size=k)
            freqs[rng.integers(0, k)] += 1  # ensure tot >= 1
            tot = int(freqs.sum())
            if tot > rs.M:
                continue
            cum = 0
            end_prev = 0
            for f in freqs:
                if f == 0:
                    cum += 0
                    continue
                c, fn = rs.norm_cf(cum, int(f), tot)
                assert c == end_prev
                end_prev = c + fn
                cum += int(f)
            assert end_prev == rs.M

    def test_decode_target_inverts_norm(self):
        # c'(C) <= slot  ⇔  C <= decode_target(slot, tot), exactly.
        rng = np.random.default_rng(2)
        for _ in range(500):
            tot = int(rng.integers(1, rs.M + 1))
            slot = int(rng.integers(0, rs.M))
            t = rs.decode_target(slot, tot)
            for c_raw in (0, t, min(t + 1, tot), tot):
                lhs = (c_raw << rs.M_BITS) // tot <= slot
                assert lhs == (c_raw <= t)

    def test_round_trip_random_tables(self):
        rng = np.random.default_rng(3)
        for trial in range(30):
            n = int(rng.integers(1, 200))
            k = int(rng.integers(2, 30))
            rows, events, syms = [], [], []
            for _ in range(n):
                freqs = rng.integers(0, 30, size=k)
                freqs[rng.integers(0, k)] += 1
                tot = int(freqs.sum())
                assert tot <= rs.M
                p = freqs / freqs.sum()
                sym = int(rng.choice(k, p=p))
                if freqs[sym] == 0:
                    sym = int(np.argmax(freqs))
                cum = int(freqs[:sym].sum())
                rows.append([int(v) for v in freqs])
                events.append((cum, int(freqs[sym]), tot))
                syms.append(sym)
            state, words = rs.encode_symbols(events)
            decoded = rs.decode_with_tables(state, words, rows)
            assert decoded == syms

    def test_compression_ratio_sanity(self):
        # a skewed static distribution should approach its entropy
        rng = np.random.default_rng(4)
        freqs = [29000, 3000, 500, 268]
        tot = sum(freqs)
        p = np.array(freqs) / tot
        n = 20000
        syms = rng.choice(4, size=n, p=p)
        cums = np.concatenate([[0], np.cumsum(freqs)])
        events = [(int(cums[s]), freqs[s], tot) for s in syms]
        state, words = rs.encode_symbols(events)
        bits = len(words) * 16 + 32
        entropy_bits = -n * float((p * np.log2(p)).sum())
        assert bits < entropy_bits * 1.02 + 64


class TestVectorized:
    def test_identity_event_is_noop(self):
        import jax.numpy as jnp

        from comprox_tpu.ops import rans

        x = jnp.array([rs.RANS_L, 0xDEADBEEF, 0xFFFFFFFF, 70000], jnp.uint32)
        c, f = rans.identity_cf(x.shape)
        x2, emit, _ = rans.enc_put(x, c, f)
        assert not bool(emit.any())
        np.testing.assert_array_equal(np.asarray(x2), np.asarray(x))
        x3, need = rans.dec_advance(x, c, f)
        assert not bool(need.any())
        np.testing.assert_array_equal(np.asarray(x3), np.asarray(x))

    def test_enc_steps_match_scalar(self):
        import jax.numpy as jnp

        from comprox_tpu.ops import rans

        rng = np.random.default_rng(5)
        n_lanes, n_steps = 16, 40
        lane_events = [random_events(rng, n_steps) for _ in range(n_lanes)]

        # scalar: encode each lane independently (backward over events)
        scalar = []
        for ev in lane_events:
            enc = rs.RansEncoder()
            states, emits, words = [], [], []
            for cum, frq, tot in reversed(ev):
                c, f = rs.norm_cf(cum, frq, tot)
                x = enc.x
                em = x >= (f << (32 - rs.M_BITS))
                w = x & rs.MASK16
                enc.put_normalized(c, f)
                states.append(enc.x)
                emits.append(em)
                words.append(w)
            scalar.append((states, emits, words))

        # vectorized: all lanes in lock-step
        x = rans.init_states(n_lanes)
        for step in range(n_steps):
            ev = [lane_events[l][n_steps - 1 - step] for l in range(n_lanes)]
            cum = jnp.array([e[0] for e in ev], jnp.uint32)
            frq = jnp.array([e[1] for e in ev], jnp.uint32)
            tot = jnp.array([e[2] for e in ev], jnp.uint32)
            c, f = rans.norm_cf(cum, frq, tot)
            x, emit, word = rans.enc_put(x, c, f)
            xs, ems, ws = np.asarray(x), np.asarray(emit), np.asarray(word)
            for l in range(n_lanes):
                assert int(xs[l]) == scalar[l][0][step]
                assert bool(ems[l]) == scalar[l][1][step]
                if bool(ems[l]):
                    assert int(ws[l]) == scalar[l][2][step]

    def test_vector_round_trip_interleaved(self):
        """Full interleaved-stream round trip: S lanes, one shared stream."""
        import jax.numpy as jnp

        from comprox_tpu.ops import rans

        rng = np.random.default_rng(6)
        n_lanes, n_steps = 16, 40
        # events[step][lane] with some inactive lanes
        active = rng.random((n_steps, n_lanes)) < 0.8
        raw = np.zeros((n_steps, n_lanes, 3), np.uint32)
        for t in range(n_steps):
            for l in range(n_lanes):
                if active[t, l]:
                    raw[t, l] = random_events(rng, 1)[0]

        # --- encode: backward over steps, lanes in lock-step ---
        x = rans.init_states(n_lanes)
        rev_words = []
        for t in range(n_steps - 1, -1, -1):
            cum = jnp.asarray(raw[t, :, 0])
            frq = jnp.asarray(raw[t, :, 1])
            tot = jnp.asarray(raw[t, :, 2])
            act = jnp.asarray(active[t])
            c, f = rans.norm_cf(cum, jnp.maximum(frq, 1), jnp.maximum(tot, 1))
            c, f = rans.select_cf(act, c, f)
            x, emit, word = rans.enc_put(x, c, f)
            # decode order within a step is lane-ascending, so backward
            # encode must emit lane-descending
            for l in range(n_lanes - 1, -1, -1):
                if bool(emit[l]):
                    rev_words.append(int(word[l]))
        states = np.asarray(x)
        stream = np.array(rev_words[::-1], np.uint16)

        # --- decode: forward, computing word ranks per step ---
        x = jnp.asarray(states)
        base = jnp.uint32(0)
        for t in range(n_steps):
            cum = jnp.asarray(raw[t, :, 0])
            frq = jnp.asarray(raw[t, :, 1])
            tot = jnp.asarray(raw[t, :, 2])
            act = jnp.asarray(active[t])
            slot = rans.dec_slot(x)
            # check the slot identifies the correct interval on active lanes
            tgt = rans.dec_target(slot, jnp.maximum(tot, 1))
            ok = (cum <= tgt) & (tgt < cum + frq)
            assert bool(jnp.where(act, ok, True).all())
            c, f = rans.norm_cf(cum, jnp.maximum(frq, 1), jnp.maximum(tot, 1))
            c, f = rans.select_cf(act, c, f)
            x_tmp, need = rans.dec_advance(x, c, f)
            idx, base = rans.stream_positions(need, base)
            words = jnp.asarray(stream)[jnp.minimum(idx, len(stream) - 1)]
            x = rans.dec_renorm(x_tmp, need, words)
        np.testing.assert_array_equal(
            np.asarray(x), np.full(n_lanes, rs.RANS_L, np.uint32)
        )
        assert int(base) == len(stream)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
