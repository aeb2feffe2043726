"""Pallas kernel differential tests (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from comprox_tpu.ops.pallas_ops import gather_rows, gather_rows_ref


def test_gather_rows_matches_xla():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 1000, (512, 128), dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, 512, 64, dtype=np.int32))
    got = gather_rows(table, idx)
    want = gather_rows_ref(table, idx)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_gather_rows_duplicate_indices():
    table = jnp.arange(64 * 128, dtype=jnp.int32).reshape(64, 128)
    idx = jnp.asarray([3, 3, 3, 0, 63, 63, 8, 9], jnp.int32)
    got = np.asarray(gather_rows(table, idx))
    want = np.asarray(table)[np.asarray(idx)]
    np.testing.assert_array_equal(got, want)
