"""Mesh/sharding helpers on the virtual 8-device CPU mesh."""

import numpy as np

import jax

from forwardtacotron_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                               pad_batch_to_devices,
                                               replicated, shard_batch)


def test_make_mesh_axes():
    mesh = make_mesh()
    assert mesh.shape == {'data': 8, 'model': 1}
    mesh2 = make_mesh(n_data=4)
    assert mesh2.shape == {'data': 4, 'model': 1}


def test_pad_batch_to_devices():
    mesh = make_mesh()
    batch = {'x': np.arange(12).reshape(6, 2),
             'mel_len': np.full(6, 9),
             'item_id': ['a'] * 6}
    padded = pad_batch_to_devices(batch, mesh)
    assert padded['x'].shape == (8, 2)
    # padded rows repeat row 0 but their lengths drop to 0 (mask no-ops)
    np.testing.assert_array_equal(padded['x'][6], padded['x'][0])
    np.testing.assert_array_equal(padded['mel_len'][6:], 0)
    assert len(padded['item_id']) == 8


def test_shard_batch_places_on_mesh():
    mesh = make_mesh()
    batch = {'x': np.zeros((8, 4), np.float32), 'item_id': ['i'] * 8}
    device_batch = shard_batch(batch, mesh)
    sharding = device_batch['x'].sharding
    assert sharding.is_equivalent_to(batch_sharding(mesh), 2)
    assert device_batch['item_id'] == ['i'] * 8


def test_grad_allreduce_over_mesh():
    """Loss computed on a sharded batch against replicated params yields
    replicated (all-reduced) gradients — the core DP invariant."""
    import jax.numpy as jnp
    mesh = make_mesh()
    w = jax.device_put(np.ones((4, 4), np.float32), replicated(mesh))
    x = np.random.RandomState(0).randn(8, 4).astype(np.float32)
    xd = jax.device_put(x, batch_sharding(mesh))

    @jax.jit
    def grad_fn(w, x):
        return jax.grad(lambda w: jnp.sum((x @ w) ** 2) / x.shape[0])(w)

    g = grad_fn(w, xd)
    expected = 2 * x.T @ (x @ np.ones((4, 4))) / 8
    np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-5)
