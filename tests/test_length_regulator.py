"""Length regulator: exactness vs the reference semantics and both variants."""

import numpy as np
import pytest

import jax.numpy as jnp

from forwardtacotron_tpu.ops.length_regulator import (expanded_lengths,
                                                      length_regulator,
                                                      length_regulator_gather,
                                                      round_durations)


def _reference_expand(x, dur, max_len):
    """Literal repeat-interleave semantics (reference common_layers.py:17-24)."""
    b, n, c = x.shape
    out = np.zeros((b, max_len, c), x.dtype)
    for i in range(b):
        reps = np.floor(np.maximum(dur[i], 0) + 0.5).astype(int)
        expanded = np.repeat(x[i], reps, axis=0)[:max_len]
        out[i, :len(expanded)] = expanded
    return out


@pytest.mark.parametrize('fn', [length_regulator, length_regulator_gather])
def test_matches_repeat_interleave(fn):
    rs = np.random.RandomState(0)
    x = rs.randn(3, 7, 5).astype(np.float32)
    dur = rs.uniform(-1, 4, (3, 7)).astype(np.float32)
    max_len = int(expanded_lengths(jnp.asarray(dur)).max()) + 3
    got = np.asarray(fn(jnp.asarray(x), jnp.asarray(dur), max_len))
    want = _reference_expand(x, dur, max_len)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_round_durations_torch_semantics():
    dur = jnp.asarray([-2.0, -0.2, 0.0, 0.4, 0.5, 1.49, 1.5, 2.51])
    got = np.asarray(round_durations(dur))
    np.testing.assert_array_equal(got, [0, 0, 0, 0, 1, 1, 2, 3])


def test_truncation_at_max_len():
    x = jnp.ones((1, 4, 2))
    dur = jnp.asarray([[5.0, 5.0, 5.0, 5.0]])
    out = np.asarray(length_regulator(x, dur, max_len=8))
    assert out.shape == (1, 8, 2)
    np.testing.assert_allclose(out, 1.0)


def test_zero_padding_beyond_total():
    x = jnp.ones((1, 2, 3))
    dur = jnp.asarray([[2.0, 1.0]])
    out = np.asarray(length_regulator(x, dur, max_len=6))
    np.testing.assert_allclose(out[0, :3], 1.0)
    np.testing.assert_allclose(out[0, 3:], 0.0)
