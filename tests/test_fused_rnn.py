"""Fused multi-BiGRU scan: one lax.scan with block-diagonal recurrent
weights must reproduce the per-GRU bidirectional scans exactly, and the
flagship's single-dispatch ``generate_combined`` must match the two-phase
predict_series + generate path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from forwardtacotron_tpu.models.layers import (_bidir_scan, _gru_step,
                                               multi_bigru)


def _rand_gru_params(rs, in_dim, hidden):
    def u(*shape):
        return jnp.asarray(rs.uniform(-0.2, 0.2, shape).astype(np.float32))
    return (u(in_dim, 3 * hidden), u(hidden, 3 * hidden),
            u(3 * hidden), u(3 * hidden))


@pytest.mark.parametrize('lengths_mode', ['none', 'ragged'])
def test_multi_bigru_matches_separate_scans(lengths_mode):
    rs = np.random.RandomState(0)
    b, t = 3, 11
    specs = [(5, 4), (7, 8), (6, 4)]  # (in_dim, hidden)
    entries = []
    for in_dim, hidden in specs:
        x = jnp.asarray(rs.randn(b, t, in_dim).astype(np.float32))
        lens = None
        if lengths_mode == 'ragged':
            lens = jnp.asarray(rs.randint(2, t + 1, (b,)))
        fwd = _rand_gru_params(rs, in_dim, hidden)
        bwd = _rand_gru_params(rs, in_dim, hidden)
        entries.append((x, lens, (fwd, bwd), hidden))

    fused = multi_bigru(entries)
    for (x, lens, (fwd, bwd), hidden), out in zip(entries, fused):
        ref = _bidir_scan(x, lens, fwd, bwd, _gru_step, hidden, 1)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=0, atol=1e-6)


@pytest.mark.parametrize('cell', ['gru', 'lstm'])
@pytest.mark.parametrize('lengths_mode', ['none', 'ragged'])
def test_pallas_bidir_rnn_matches_scan(cell, lengths_mode):
    """Fused Pallas kernel (interpret mode on CPU) vs the XLA scan."""
    from forwardtacotron_tpu.models.layers import _lstm_step
    from forwardtacotron_tpu.ops.pallas.rnn import bidir_rnn_pallas

    rs = np.random.RandomState(2)
    b, t, in_dim, hidden = 24, 9, 32, 128  # b tests batch padding
    g = 4 if cell == 'lstm' else 3

    def mk():
        return tuple(jnp.asarray(
            rs.uniform(-0.3, 0.3, s).astype(np.float32))
            for s in ((in_dim, g * hidden), (hidden, g * hidden),
                      (g * hidden,), (g * hidden,)))

    x = jnp.asarray((rs.randn(b, t, in_dim) * 0.5).astype(np.float32))
    lens = None
    if lengths_mode == 'ragged':
        lens = jnp.asarray(rs.randint(2, t + 1, (b,)))
    fwd, bwd = mk(), mk()
    step = _lstm_step if cell == 'lstm' else _gru_step
    n_carry = 2 if cell == 'lstm' else 1
    ref = _bidir_scan(x, lens, fwd, bwd, step, hidden, n_carry)
    out = bidir_rnn_pallas(x, lens, fwd, bwd, hidden, cell, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-5)


def test_pallas_gru_from_xp_matches_scan():
    from forwardtacotron_tpu.models.layers import flip_sequences
    from forwardtacotron_tpu.ops.pallas.rnn import gru_from_xp_pallas

    rs = np.random.RandomState(3)
    b, t, in_dim, hidden = 16, 7, 32, 128
    fwd = tuple(jnp.asarray(rs.uniform(-0.3, 0.3, s).astype(np.float32))
                for s in ((in_dim, 3 * hidden), (hidden, 3 * hidden),
                          (3 * hidden,), (3 * hidden,)))
    bwd = tuple(jnp.asarray(rs.uniform(-0.3, 0.3, s).astype(np.float32))
                for s in ((in_dim, 3 * hidden), (hidden, 3 * hidden),
                          (3 * hidden,), (3 * hidden,)))
    x = jnp.asarray((rs.randn(b, t, in_dim) * 0.5).astype(np.float32))
    xp_f = x @ fwd[0] + fwd[2]
    xp_b = flip_sequences(x, None) @ bwd[0] + bwd[2]
    wh = jnp.stack([fwd[1], bwd[1]])
    bh = jnp.stack([fwd[3], bwd[3]])
    hs, b_true = gru_from_xp_pallas(xp_f, xp_b, wh, bh, hidden,
                                    interpret=True)
    hs = jnp.transpose(hs, (2, 0, 1, 3))[:b_true]
    out = jnp.concatenate([hs[:, :, 0], flip_sequences(hs[:, :, 1], None)],
                          axis=-1)
    ref = _bidir_scan(x, None, fwd, bwd, _gru_step, hidden, 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-5)


def test_generate_combined_matches_two_phase():
    from forwardtacotron_tpu.models.registry import init_tts_model
    from forwardtacotron_tpu.models.synthesis import TTSInference
    from forwardtacotron_tpu.utils.files import read_config

    config = read_config('tests/resources/test_config.yaml')
    model = init_tts_model(config)
    rs = np.random.RandomState(1)
    b, n = 2, 13
    batch = {'x': rs.randint(1, 100, (b, n)).astype(np.int64),
             'dur': np.full((b, n), 3.0, np.float32),
             'mel_len': np.full((b,), 3 * n, np.int64),
             'pitch': rs.randn(b, n).astype(np.float32),
             'energy': rs.rand(b, n).astype(np.float32),
             'mel': np.zeros((b, 3 * n, config['dsp']['num_mels']),
                             np.float32)}
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           batch, train=False)
    inf = TTSInference(model, variables, multispeaker=False)
    two_phase = inf.generate(batch['x'])
    max_len = two_phase['mel_post'].shape[1]
    fused = inf.generate_fused(batch['x'], max_len=max_len)
    for key in ('dur', 'pitch', 'energy', 'mel', 'mel_post'):
        np.testing.assert_allclose(np.asarray(two_phase[key]),
                                   np.asarray(fused[key]),
                                   rtol=0, atol=1e-5, err_msg=key)
    np.testing.assert_array_equal(np.asarray(two_phase['mel_len']),
                                  np.asarray(fused['mel_len']))


def test_generate_routed_matches_two_phase():
    """Per-length-group routed decode must reproduce the global-bucket
    two-phase decode for every request on its valid frames (the exact-length
    masking makes decode output independent of the static padding length)."""
    from forwardtacotron_tpu.models.registry import init_tts_model
    from forwardtacotron_tpu.models.synthesis import TTSInference
    from forwardtacotron_tpu.utils.files import read_config

    config = read_config('tests/resources/test_config.yaml')
    model = init_tts_model(config)
    rs = np.random.RandomState(3)
    b, n = 4, 13
    # heterogeneous durations so requests land in different frame buckets
    x = rs.randint(1, 100, (b, n)).astype(np.int64)
    batch = {'x': x,
             'dur': np.full((b, n), 3.0, np.float32),
             'mel_len': np.full((b,), 3 * n, np.int64),
             'pitch': rs.randn(b, n).astype(np.float32),
             'energy': rs.rand(b, n).astype(np.float32),
             'mel': np.zeros((b, 3 * n, config['dsp']['num_mels']),
                             np.float32)}
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           batch, train=False)
    inf = TTSInference(model, variables, multispeaker=False)

    # random-init durations are near-uniform; scale them per request so the
    # batch genuinely spans several frame buckets (both paths see the same
    # predictions, so the comparison stays apples-to-apples)
    orig_predict = inf._predict
    scale = jnp.asarray([[0.5], [1.0], [2.0], [3.5]])

    def scaled_predict(v, xq, alpha):
        out = dict(orig_predict(v, xq, alpha))
        out['dur'] = out['dur'] * scale[:xq.shape[0]]
        return out

    inf._predict = scaled_predict

    two_phase = inf.generate(x)
    routed = inf.generate_routed(x, frame_bucket=16)

    np.testing.assert_array_equal(np.asarray(two_phase['mel_len']),
                                  np.asarray(routed['mel_len']))
    lens = np.asarray(two_phase['mel_len'])
    assert len({int(np.ceil(max(v, 1) / 16)) for v in lens}) > 1, \
        'test needs requests in different buckets to be meaningful'
    for key in ('dur', 'pitch', 'energy'):
        np.testing.assert_allclose(np.asarray(two_phase[key]),
                                   np.asarray(routed[key]),
                                   rtol=0, atol=1e-5, err_msg=key)
    for key in ('mel', 'mel_post'):
        a, r = np.asarray(two_phase[key]), np.asarray(routed[key])
        for i in range(b):
            li = int(lens[i])
            np.testing.assert_allclose(a[i, :li], r[i, :li],
                                       rtol=0, atol=1e-5,
                                       err_msg=f'{key}[{i}]')


@pytest.mark.parametrize('cell', ['gru', 'lstm'])
def test_sharded_pallas_bidir_matches_single_device(cell):
    """shard_map'd inference kernel over the 8-device mesh (interpret mode)
    must equal the single-device kernel — this is the path that keeps
    data-parallel serving on the fused kernels (models/synthesis.py mesh=)."""
    from forwardtacotron_tpu.ops.pallas.rnn import (bidir_rnn_pallas,
                                                    bidir_rnn_pallas_sharded)
    from forwardtacotron_tpu.parallel.mesh import make_mesh

    rs = np.random.RandomState(11)
    b, t, in_dim, hidden = 16, 7, 32, 128
    g = 4 if cell == 'lstm' else 3

    def mk():
        return tuple(jnp.asarray(
            rs.uniform(-0.3, 0.3, s).astype(np.float32))
            for s in ((in_dim, g * hidden), (hidden, g * hidden),
                      (g * hidden,), (g * hidden,)))

    x = jnp.asarray((rs.randn(b, t, in_dim) * 0.5).astype(np.float32))
    lens = jnp.asarray(rs.randint(2, t + 1, (b,)))
    fwd, bwd = mk(), mk()

    ref = bidir_rnn_pallas(x, lens, fwd, bwd, hidden, cell, interpret=True)
    mesh = make_mesh(n_data=8)
    out = bidir_rnn_pallas_sharded(x, lens, fwd, bwd, hidden, cell,
                                   interpret=True, mesh=mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-5)
    # and the no-lengths variant
    ref2 = bidir_rnn_pallas(x, None, fwd, bwd, hidden, cell, interpret=True)
    out2 = bidir_rnn_pallas_sharded(x, None, fwd, bwd, hidden, cell,
                                    interpret=True, mesh=mesh)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               rtol=0, atol=2e-5)


def test_sharded_gru_from_xp_matches_single_device():
    from forwardtacotron_tpu.models.layers import flip_sequences
    from forwardtacotron_tpu.ops.pallas.rnn import (gru_from_xp_pallas,
                                                    gru_from_xp_pallas_sharded)
    from forwardtacotron_tpu.parallel.mesh import make_mesh

    rs = np.random.RandomState(12)
    b, t, in_dim, hidden = 16, 5, 32, 128
    fwd = tuple(jnp.asarray(rs.uniform(-0.3, 0.3, s).astype(np.float32))
                for s in ((in_dim, 3 * hidden), (hidden, 3 * hidden),
                          (3 * hidden,), (3 * hidden,)))
    bwd = tuple(jnp.asarray(rs.uniform(-0.3, 0.3, s).astype(np.float32))
                for s in ((in_dim, 3 * hidden), (hidden, 3 * hidden),
                          (3 * hidden,), (3 * hidden,)))
    x = jnp.asarray((rs.randn(b, t, in_dim) * 0.5).astype(np.float32))
    xp_f = x @ fwd[0] + fwd[2]
    xp_b = flip_sequences(x, None) @ bwd[0] + bwd[2]
    wh = jnp.stack([fwd[1], bwd[1]])
    bh = jnp.stack([fwd[3], bwd[3]])

    hs_ref, b_true = gru_from_xp_pallas(xp_f, xp_b, wh, bh, hidden,
                                        interpret=True)
    hs_ref = hs_ref[:, :, :b_true]
    mesh = make_mesh(n_data=8)
    hs = gru_from_xp_pallas_sharded(xp_f, xp_b, wh, bh, hidden,
                                    interpret=True, mesh=mesh)
    np.testing.assert_allclose(np.asarray(hs), np.asarray(hs_ref),
                               rtol=0, atol=2e-5)




def test_routed_compile_cache_bounded_under_varying_mix():
    """A live traffic mix produces arbitrary per-bucket group sizes; group
    padding to powers of two (models/synthesis.py bucket_group_size) must
    keep the number of compiled decode executables at
    O(log2(B) x #frame-buckets) instead of one per distinct group size."""
    from forwardtacotron_tpu.models.registry import init_tts_model
    from forwardtacotron_tpu.models.synthesis import TTSInference
    from forwardtacotron_tpu.utils.files import read_config

    config = read_config('tests/resources/test_config.yaml')
    model = init_tts_model(config)
    rs = np.random.RandomState(7)
    b, n = 8, 9
    batch = {'x': rs.randint(1, 100, (b, n)).astype(np.int64),
             'dur': np.full((b, n), 3.0, np.float32),
             'mel_len': np.full((b,), 3 * n, np.int64),
             'pitch': rs.randn(b, n).astype(np.float32),
             'energy': rs.rand(b, n).astype(np.float32),
             'mel': np.zeros((b, 3 * n, config['dsp']['num_mels']),
                             np.float32)}
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           batch, train=False)
    inf = TTSInference(model, variables, multispeaker=False)

    orig_predict = inf._predict

    scales = {}

    def scaled_predict(v, xq, alpha):
        out = dict(orig_predict(v, xq, alpha))
        out['dur'] = out['dur'] * scales['cur'][:xq.shape[0]]
        return out

    inf._predict = scaled_predict

    # 10 calls with different random per-request duration scales: group
    # sizes per bucket vary call to call
    for trial in range(10):
        scales['cur'] = jnp.asarray(
            rs.uniform(0.5, 4.0, (b, 1)).astype(np.float32))
        inf.generate_routed(batch['x'], frame_bucket=16)

    n_frame_buckets = len(inf._decode_cache)
    n_executables = sum(fn._cache_size()
                        for fn in inf._decode_cache.values())
    # group sizes padded to powers of two <= 8 -> at most 4 sizes/bucket
    assert n_executables <= 4 * n_frame_buckets, (
        f'{n_executables} executables across {n_frame_buckets} buckets - '
        'compile cache is not bounded')


def test_tts_inference_rejects_unknown_dtype():
    from forwardtacotron_tpu.models.registry import init_tts_model
    from forwardtacotron_tpu.models.synthesis import TTSInference
    from forwardtacotron_tpu.utils.files import read_config

    config = read_config('tests/resources/test_config.yaml')
    model = init_tts_model(config)
    with pytest.raises(ValueError, match='int8'):
        TTSInference(model, {}, multispeaker=False, dtype='int8')
