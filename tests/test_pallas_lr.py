"""Pallas length-regulator kernel vs the XLA formulation (interpret mode on
CPU; the same kernel compiles for real on TPU via length_regulator_auto)."""

import numpy as np

import jax.numpy as jnp

from forwardtacotron_tpu.ops.length_regulator import length_regulator
from forwardtacotron_tpu.ops.pallas.length_regulator import \
    length_regulator_pallas


def test_pallas_matches_xla():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(3, 24, 16).astype(np.float32))
    dur = jnp.asarray(rs.uniform(-1, 15, (3, 24)).astype(np.float32))
    want = np.asarray(length_regulator(x, dur, 256))
    got = np.asarray(length_regulator_pallas(x, dur, 256, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pallas_non_tile_multiple_crops():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(1, 8, 4).astype(np.float32))
    dur = jnp.asarray(rs.uniform(0, 10, (1, 8)).astype(np.float32))
    want = np.asarray(length_regulator(x, dur, 100))
    got = np.asarray(length_regulator_pallas(x, dur, 100, interpret=True))
    assert got.shape == (1, 100, 4)
    np.testing.assert_allclose(got, want, atol=1e-5)
