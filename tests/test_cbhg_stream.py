"""Parity of the off-by-default CBHG streamed bank->pool->proj1 inference
path (models/layers.py _bank_pool_proj1_streamed) vs the reference op order
— with and without exact-length masking."""

import jax
import jax.numpy as jnp
import numpy as np

from forwardtacotron_tpu.models.layers import CBHG


def _mk(stream):
    return CBHG(K=4, channels=32, proj_channels=[32, 16], num_highways=2,
                dropout=0.0, stream_pool_proj=stream)


def test_streamed_pool_proj_matches_reference_order():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(3, 23, 16).astype(np.float32))
    ref_mod, st_mod = _mk(False), _mk(True)
    v = ref_mod.init({'params': jax.random.PRNGKey(0)}, x, train=False)
    # perturb BN stats so the eval-normalize math is exercised
    v = jax.tree.map(lambda a: a, v)

    want = ref_mod.apply(v, x, train=False)
    got = st_mod.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=2e-5)

    lengths = jnp.array([23, 11, 5])
    want_l = ref_mod.apply(v, x, train=False, lengths=lengths)
    got_l = st_mod.apply(v, x, train=False, lengths=lengths)
    np.testing.assert_allclose(np.asarray(got_l), np.asarray(want_l),
                               rtol=0, atol=2e-5)

    # training mode must take the reference path (BN stats update)
    out, mut = st_mod.apply(v, x, train=True,
                            rngs={'dropout': jax.random.PRNGKey(1)},
                            mutable=['batch_stats'])
    assert 'batch_stats' in mut


def test_fused_pool_proj_matches_reference_order(monkeypatch):
    """The fused maxpool+proj1 Pallas kernel (ops/pallas/cbhg.py) matches
    the XLA op order, with and without exact-length masking. The kernel
    ships OFF by default (measured regression vs XLA at serving shapes —
    see its docstring); this test forces it on via fuse_pool_proj=True
    under FTT_PALLAS_INTERPRET."""
    monkeypatch.setenv('FTT_PALLAS_INTERPRET', '1')
    import forwardtacotron_tpu.models.layers as L

    def mk(fused):
        # fuse_front=False: the (default-on) bank+pool+proj1 mega-kernel
        # takes precedence over this path and would absorb the dispatch
        return CBHG(K=4, channels=32, proj_channels=[32, 16],
                    num_highways=2, dropout=0.0, fuse_pool_proj=fused,
                    fuse_front=False)

    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(3, 23, 16).astype(np.float32))
    ref_mod, f_mod = mk(False), mk(True)
    v = ref_mod.init({'params': jax.random.PRNGKey(0)}, x, train=False)

    calls = []
    orig = CBHG._pool_proj1_fused

    def spy(self, xc, tail):
        calls.append(1)
        return orig(self, xc, tail)
    monkeypatch.setattr(CBHG, '_pool_proj1_fused', spy)

    want = ref_mod.apply(v, x, train=False)
    assert calls == []
    got = f_mod.apply(v, x, train=False)
    assert calls, 'fused pool+proj kernel not dispatched'
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=2e-5)

    lengths = jnp.array([23, 11, 5])
    want_l = ref_mod.apply(v, x, train=False, lengths=lengths)
    got_l = f_mod.apply(v, x, train=False, lengths=lengths)
    np.testing.assert_allclose(np.asarray(got_l), np.asarray(want_l),
                               rtol=0, atol=2e-5)

    # training takes the reference path (BN stats update, dropout live)
    calls.clear()
    out, mut = f_mod.apply(v, x, train=True,
                           rngs={'dropout': jax.random.PRNGKey(1)},
                           mutable=['batch_stats'])
    assert calls == [] and 'batch_stats' in mut


def test_pool_mask_kernel_matches_xla(monkeypatch):
    """pool_mask_pallas (ships OFF — measured end-to-end regression, see
    its docstring) matches maxpool_time + tail mask exactly."""
    monkeypatch.setenv('FTT_PALLAS_INTERPRET', '1')
    import jax.numpy as jnp
    from forwardtacotron_tpu.models.layers import maxpool_time
    from forwardtacotron_tpu.ops.pallas.cbhg import pool_mask_pallas

    rs = np.random.RandomState(11)
    x = jnp.asarray(rs.randn(4, 16, 256).astype(np.float32))
    lens = np.asarray([16, 9, 1, 12])
    mask = (np.arange(16)[None, :] < lens[:, None]).astype(np.float32)

    ref = maxpool_time(x) * jnp.asarray(mask)[:, :, None]
    got = pool_mask_pallas(x, jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_fused_front_matches_reference_order(monkeypatch):
    """bank_pool_proj_pallas (the full bank->pool->proj1 front as one
    kernel, ships ON for inference) matches the XLA op order with
    perturbed BN statistics and exact-length masking, f32 and bf16."""
    monkeypatch.setenv('FTT_PALLAS_INTERPRET', '1')
    import jax.numpy as jnp

    def mk(fused):
        return CBHG(K=5, channels=64, proj_channels=[64, 48],
                    num_highways=2, dropout=0.0, fuse_front=fused)

    rs = np.random.RandomState(7)
    x = jnp.asarray(rs.randn(3, 29, 48).astype(np.float32))
    lens = jnp.asarray([29, 11, 20])
    v = mk(False).init(jax.random.PRNGKey(0), x)
    # perturb BN running stats so the folded-affine path is non-trivial
    v = jax.tree_util.tree_map(lambda a: a, v)
    import flax
    flat = flax.traverse_util.flatten_dict(v)
    for key in list(flat):
        if key[-1] == 'mean':
            flat[key] = flat[key] + 0.3 * rs.randn(*flat[key].shape) \
                .astype(np.float32)
        if key[-1] == 'var':
            flat[key] = flat[key] * np.abs(
                1.0 + 0.5 * rs.randn(*flat[key].shape)).astype(np.float32)
    v = flax.traverse_util.unflatten_dict(flat)

    a = mk(False).apply(v, x, train=False, lengths=lens)
    b = mk(True).apply(v, x, train=False, lengths=lens)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=2e-5, atol=2e-5)

    vb = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16)
                                if p.dtype == jnp.float32 else p, v)
    xb = x.astype(jnp.bfloat16)
    ab_ = np.asarray(mk(False).apply(vb, xb, train=False,
                                     lengths=lens)).astype(np.float32)
    bb_ = np.asarray(mk(True).apply(vb, xb, train=False,
                                    lengths=lens)).astype(np.float32)
    np.testing.assert_allclose(bb_, ab_, rtol=0.08, atol=0.08)
