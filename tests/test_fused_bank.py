"""Fused conv-bank option parity: CBHG(fuse_bank=True) must equal the
per-k reference-shaped path at inference to f32 rounding (the zero-embedded
K-tap kernel computes the same sums; the fused per-channel BN uses the same
rsqrt order as flax but accumulates in a different op arrangement, so exact
equality holds only for trivial stats). See models/layers.py CBHG.fuse_bank
for why the option is off by default on v5e."""

import jax
import jax.numpy as jnp
import numpy as np
import flax

from forwardtacotron_tpu.models.layers import CBHG


def _randomized_stats(v, rs):
    flat = flax.traverse_util.flatten_dict(v)
    for k in list(flat):
        if k[-1] == 'mean':
            flat[k] = jnp.asarray(rs.randn(*flat[k].shape).astype(np.float32))
        if k[-1] == 'var':
            flat[k] = jnp.asarray(
                rs.rand(*flat[k].shape).astype(np.float32) + 0.5)
    return flax.traverse_util.unflatten_dict(flat)


def test_fused_bank_matches_per_k():
    rs = np.random.RandomState(0)
    kw = dict(K=8, channels=64, proj_channels=[64, 64], num_highways=4)
    fused = CBHG(fuse_bank=True, **kw)
    per_k = CBHG(fuse_bank=False, **kw)
    x = jnp.asarray(rs.randn(3, 17, 64).astype(np.float32))
    v = fused.init({'params': jax.random.PRNGKey(0),
                    'dropout': jax.random.PRNGKey(1)}, x)
    v = _randomized_stats(v, rs)
    lens = jnp.asarray([17, 9, 13])
    for lengths in (None, lens):
        a = fused.apply(v, x, False, lengths)
        b = per_k.apply(v, x, False, lengths)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-5)


def test_fused_bank_matches_per_k_odd_K():
    rs = np.random.RandomState(1)
    kw = dict(K=5, channels=32, proj_channels=[32, 16], num_highways=2)
    fused = CBHG(fuse_bank=True, **kw)
    per_k = CBHG(fuse_bank=False, **kw)
    x = jnp.asarray(rs.randn(2, 11, 16).astype(np.float32))
    v = fused.init({'params': jax.random.PRNGKey(0),
                    'dropout': jax.random.PRNGKey(1)}, x)
    v = _randomized_stats(v, rs)
    a = fused.apply(v, x, False, None)
    b = per_k.apply(v, x, False, None)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=0, atol=1e-5)
