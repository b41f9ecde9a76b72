"""Analytic FLOP accounting (utils/flops.py) cross-checked against XLA's own
cost analysis of the compiled generate graph — the analytic model must agree
with the compiler's count for the pure-XLA path at GEMM-dominated dims
(elementwise/transcendental work, which the analytic model ignores, must stay
in the disagreement budget)."""

import jax
import numpy as np
import pytest

from forwardtacotron_tpu.models.registry import init_tts_model
from forwardtacotron_tpu.utils.files import read_config
from forwardtacotron_tpu.utils.flops import (CHIP_SPECS, chip_spec,
                                             forward_tacotron_generate_flops,
                                             forward_tacotron_stage_flops,
                                             roofline_report)

MID_MODEL = dict(
    embed_dims=64, series_embed_dims=32,
    durpred_conv_dims=64, durpred_rnn_dims=32, durpred_dropout=0.5,
    pitch_conv_dims=64, pitch_rnn_dims=32, pitch_dropout=0.5,
    pitch_strength=1.0,
    energy_conv_dims=64, energy_rnn_dims=32, energy_dropout=0.5,
    energy_strength=1.0,
    prenet_dims=64, prenet_k=8, prenet_dropout=0.5, prenet_num_highways=4,
    rnn_dims=128, postnet_dims=64, postnet_k=4, postnet_num_highways=4,
    postnet_dropout=0.0)


def _xla_flops(compiled) -> float:
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    if not analysis or 'flops' not in analysis:
        pytest.skip('XLA cost analysis not available on this backend')
    return float(analysis['flops'])


def test_generate_flops_match_xla_cost_analysis(monkeypatch):
    # XLA's cost analysis counts a while-loop body ONCE, not once per trip
    # (measured: scan RNN reported at body+input-GEMM flops only), so fully
    # unroll the recurrences for this comparison — same op count, no loop.
    from forwardtacotron_tpu.models import layers
    monkeypatch.setattr(layers, 'SCAN_UNROLL', 4096)

    config = read_config('tests/resources/test_config.yaml')
    config['forward_tacotron'] = {'model': dict(MID_MODEL),
                                  'training':
                                  config['forward_tacotron']['training']}
    model = init_tts_model(config)
    rs = np.random.RandomState(0)
    b, n, t = 4, 32, 128
    n_mels = config['dsp']['num_mels']
    batch = {'x': rs.randint(1, 100, (b, n)).astype(np.int64),
             'dur': np.full((b, n), 3.0, np.float32),
             'mel_len': np.full((b,), 3 * n, np.int64),
             'pitch': rs.randn(b, n).astype(np.float32),
             'energy': rs.rand(b, n).astype(np.float32),
             'mel': np.zeros((b, 3 * n, n_mels), np.float32)}
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           batch, train=False)

    dur = np.full((b, n), float(t) / n, np.float32)
    args = (variables, batch['x'], dur, batch['pitch'], batch['energy'])

    # decode-only graph vs analytic decode stages
    decode = jax.jit(lambda v, x, d, p, e: model.apply(
        v, x, d, p, e, t, method=type(model).generate))
    xla = _xla_flops(decode.lower(*args).compile())
    stages = forward_tacotron_stage_flops(MID_MODEL, b, n, t,
                                          n_mels=n_mels)
    analytic = sum(v for k, v in stages.items()
                   if k != 'series_predictors')
    assert 0.75 <= analytic / xla <= 1.25, \
        f'decode analytic={analytic:.3e} xla={xla:.3e}'

    # series-prediction graph vs the series_predictors stage
    predict = jax.jit(lambda v, x: model.apply(
        v, x, 1.0, method=type(model).predict_series))
    xla_p = _xla_flops(predict.lower(variables, batch['x']).compile())
    analytic_p = stages['series_predictors']
    assert 0.7 <= analytic_p / xla_p <= 1.3, \
        f'series analytic={analytic_p:.3e} xla={xla_p:.3e}'

    # full generate convenience sum = decode + series
    total = forward_tacotron_generate_flops(config, b, n, t)
    np.testing.assert_allclose(total, sum(stages.values()), rtol=1e-12)


def test_roofline_report_bounds():
    spec = CHIP_SPECS['v5e']
    # 100 TFLOPs of work in 1 s, 100 GB moved -> compute-boundish numbers
    report = roofline_report(100e12, 100e9, 1.0, spec=spec, dtype='bf16')
    assert report['mfu'] == pytest.approx(100e12 / 197e12)
    assert report['hbm_util'] == pytest.approx(100e9 / 819e9)
    assert report['bound'] == 'compute'
    report2 = roofline_report(1e12, 100e9, 1.0, spec=spec)
    assert report2['bound'] == 'hbm'
    # int8 peak is 2x bf16 on v5e
    r8 = roofline_report(100e12, 100e9, 1.0, spec=spec, dtype='int8')
    assert r8['mfu'] == pytest.approx(100e12 / 394e12)


def test_chip_spec_detection_fallbacks():
    spec = chip_spec()  # CPU backend in tests
    assert spec.name in CHIP_SPECS
