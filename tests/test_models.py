"""Model-layer unit tests: table primitives and PPM read/update semantics.

The reference has no unit tests (SURVEY.md §4); these pin the batched
model semantics that both encode and decode must share — any change here
is a format change.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from comprox_tpu.models import ppm
from comprox_tpu.models import tables as tb


class TestTables:
    def test_exclusive_cumsum_matches_numpy(self):
        rng = np.random.default_rng(0)
        rows = rng.integers(0, 1000, (16, 260)).astype(np.int32)
        got = np.asarray(tb.exclusive_cumsum(jnp.asarray(rows)))
        want = np.cumsum(rows, axis=1) - rows
        np.testing.assert_array_equal(got, want)

    def test_elect_winners_min_lane(self):
        idx = jnp.asarray([5, 3, 5, 7, 3, 5], jnp.int32)
        mask = jnp.asarray([True, True, True, False, True, True])
        got = np.asarray(tb.elect_winners(idx, mask))
        # winners: lane 0 (first 5), lane 1 (first 3); lane 3 masked
        np.testing.assert_array_equal(
            got, [True, True, False, False, False, False]
        )

    def test_rescale_read_halves_until_under_cap(self):
        rows = jnp.full((2, 8), 100, jnp.int32)  # sum 800
        out, did = tb.rescale_read(rows, 300, jnp.ones((1,), bool))
        assert bool(did.all())
        assert int(jnp.sum(out[0])) <= 300
        # ceil-halving keeps entries >= 1
        rows1 = jnp.ones((1, 8), jnp.int32) * 2
        out1, did1 = tb.rescale_read(rows1, 8, jnp.ones((1,), bool))
        assert int(out1.min()) >= 1

    def test_find_symbol_identifies_interval(self):
        rows = jnp.asarray([[3, 0, 5, 2]], jnp.int32)
        cums = tb.exclusive_cumsum(rows)
        for target, want in [(0, 0), (2, 0), (3, 2), (7, 2), (8, 3), (9, 3)]:
            sym, c, f = tb.find_symbol(rows, cums, jnp.asarray([target]))
            assert int(sym[0]) == want, (target, int(sym[0]))
            assert int(f[0]) > 0


class TestPPM:
    def test_o2_read_excludes_predicted_and_clamps_escape(self):
        t = ppm.init_tables(True, o3_bits=12)
        # drive the escape slot negative like the eliminator can
        t["o2"] = t["o2"].at[7, ppm.SYM_ESC].set(-50)
        ctx2 = jnp.asarray([7, 7], jnp.int32)
        pred = jnp.asarray([65, 66], jnp.int32)
        coding = jnp.ones((2,), bool)
        t["o2"] = t["o2"].at[7, 65].set(40).at[7, 66].set(24)
        t2, rows, rowmod, cums, tot, hd, _ = ppm.read_o2(
            t, ctx2, pred, coding
        )
        rm = np.asarray(rowmod)
        assert rm[0, 65] == 0 and rm[1, 66] == 0  # predicted excluded
        assert rm[0, 66] == 24 and rm[1, 65] == 40
        assert rm[0, ppm.SYM_ESC] == 1  # clamped read-locally

    def test_o2_update_learns_and_eliminates(self):
        t = ppm.init_tables(True, o3_bits=12)
        s = 4
        ctx2 = jnp.full((s,), 3, jnp.int32)
        zeros = jnp.zeros((s,), jnp.int32)
        # all lanes code literal byte 10 in ctx 3 (first sighting)
        t2 = ppm.apply_updates(
            t,
            coding=jnp.ones((s,), bool),
            ctx2=ctx2,
            sym_a=jnp.full((s,), 10, jnp.int32),
            byte=jnp.full((s,), 10, jnp.int32),
            old_f_byte=zeros,
            p1=zeros,
            h3=jnp.arange(s, dtype=jnp.int32),
            pred=jnp.full((s,), 99, jnp.int32),
            conf=zeros,
            sym_len=zeros,
        )
        assert int(t2["o2"][3, 10]) == s * ppm.INC2
        # second sighting with old_f == INC2 fires the escape eliminator
        t3 = ppm.apply_updates(
            t2,
            coding=jnp.ones((s,), bool),
            ctx2=ctx2,
            sym_a=jnp.full((s,), 10, jnp.int32),
            byte=jnp.full((s,), 10, jnp.int32),
            old_f_byte=jnp.full((s,), ppm.INC2, jnp.int32),
            p1=zeros,
            h3=jnp.arange(s, dtype=jnp.int32),
            pred=jnp.full((s,), 99, jnp.int32),
            conf=zeros,
            sym_len=zeros,
        )
        assert int(t3["o2"][3, ppm.SYM_ESC]) < int(t2["o2"][3, ppm.SYM_ESC])

    def test_o3_predictor_hit_and_replace(self):
        t = ppm.init_tables(True, o3_bits=12)
        s = 2
        zeros = jnp.zeros((s,), jnp.int32)
        h3 = jnp.asarray([100, 200], jnp.int32)
        # miss with conf 0 -> replace pred with byte, conf 1
        t2 = ppm.apply_updates(
            t, jnp.ones((s,), bool), zeros,
            sym_a=jnp.asarray([65, 66], jnp.int32),
            byte=jnp.asarray([65, 66], jnp.int32),
            old_f_byte=zeros, p1=zeros, h3=h3,
            pred=zeros, conf=zeros, sym_len=zeros,
        )
        pred, conf, _p2, _c2, _raw = ppm.o3_read(t2, h3)
        np.testing.assert_array_equal(np.asarray(pred), [65, 66])
        np.testing.assert_array_equal(np.asarray(conf), [1, 1])
        # hit -> confidence grows, pred kept
        t3 = ppm.apply_updates(
            t2, jnp.ones((s,), bool), zeros,
            sym_a=jnp.full((s,), ppm.SYM_HIT, jnp.int32),
            byte=jnp.asarray([65, 66], jnp.int32),
            old_f_byte=zeros, p1=zeros, h3=h3,
            pred=jnp.asarray([65, 66], jnp.int32),
            conf=jnp.asarray([1, 1], jnp.int32), sym_len=zeros,
        )
        pred3, conf3, _p23, _c23, _raw3 = ppm.o3_read(t3, h3)
        np.testing.assert_array_equal(np.asarray(pred3), [65, 66])
        np.testing.assert_array_equal(np.asarray(conf3), [2, 2])

    def test_shared_ctx_model_separates_contexts(self):
        t = ppm.init_tables(True, o3_bits=12)
        s = 4
        mask = jnp.ones((s,), bool)
        ctx = jnp.asarray([0, 0, 1, 1], jnp.int32)
        t2 = dict(t)
        # bump symbol 5 in ctx 0 only
        t2 = ppm.apply_updates(
            t2, jnp.zeros((s,), bool), jnp.zeros((s,), jnp.int32),
            sym_a=jnp.full((s,), ppm.SYM_MATCH, jnp.int32),
            byte=jnp.zeros((s,), jnp.int32),
            old_f_byte=jnp.zeros((s,), jnp.int32),
            p1=jnp.zeros((s,), jnp.int32),
            h3=jnp.zeros((s,), jnp.int32),
            pred=jnp.zeros((s,), jnp.int32),
            conf=jnp.zeros((s,), jnp.int32),
            sym_len=jnp.full((s,), 5, jnp.int32),
            len_ctx=ctx,
        )
        # coding mask was False -> no update at all
        np.testing.assert_array_equal(
            np.asarray(t2["len"]), np.asarray(t["len"])
        )
        _, rows, cums, tots = ppm.read_len(t, mask, ctx)
        assert rows.shape == (s, ppm.LEN_W)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
