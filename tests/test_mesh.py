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


def test_sharded_serving_matches_single_device():
    """TTSInference with a mesh: batch sharded over 'data', params
    replicated; outputs match the unsharded path and odd batch sizes are
    padded/cropped transparently."""
    from pathlib import Path

    from forwardtacotron_tpu.models.registry import init_tts_model
    from forwardtacotron_tpu.models.synthesis import TTSInference
    from forwardtacotron_tpu.utils.files import read_config

    config = read_config(Path(__file__).parent / 'resources' / 'test_config.yaml')
    model = init_tts_model(config)
    rs = np.random.RandomState(0)
    n_tok = 8
    init_batch = {
        'x': np.ones((1, n_tok), np.int64),
        'dur': np.full((1, n_tok), 2.0, np.float32),
        'mel_len': np.array([2 * n_tok]),
        'pitch': np.zeros((1, n_tok), np.float32),
        'energy': np.zeros((1, n_tok), np.float32),
        'mel': np.zeros((1, 2 * n_tok, config['dsp']['num_mels']), np.float32),
    }
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           init_batch, train=False)

    x = rs.randint(1, 100, (5, n_tok))  # 5 % 8 != 0 -> exercises padding
    single = TTSInference(model, variables, multispeaker=False)
    sharded = TTSInference(model, variables, multispeaker=False,
                           mesh=make_mesh())

    out_s = single.generate(x)
    out_m = sharded.generate(x)
    assert out_m['mel_post'].shape[0] == 5
    np.testing.assert_array_equal(np.asarray(out_s['mel_len']),
                                  np.asarray(out_m['mel_len']))
    np.testing.assert_allclose(np.asarray(out_s['mel_post']),
                               np.asarray(out_m['mel_post']),
                               rtol=1e-4, atol=1e-4)

    fused_s = single.generate_fused(x, max_len=64)
    fused_m = sharded.generate_fused(x, max_len=64)
    assert fused_m['mel_post'].shape[0] == 5
    np.testing.assert_allclose(np.asarray(fused_s['mel_post']),
                               np.asarray(fused_m['mel_post']),
                               rtol=1e-4, atol=1e-4)
