"""Fused serving trunk (LR + bi-LSTM + mel projection in two Pallas
kernels, ops/pallas/rnn.py lstm_lr_mel_pallas) parity vs the XLA op chain
— op-level in f32/bf16 interpret mode, and model-level through
ForwardTacotron.generate with the dispatch forced on (FTT_PALLAS_INTERPRET).

The trunk replaces reference forward_tacotron.py:145-154 (LengthRegulator ->
pack_padded bi-LSTM -> Linear) on the serving path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from forwardtacotron_tpu.models.layers import (_bidir_scan, _lstm_step,
                                               flip_sequences)
from forwardtacotron_tpu.ops.length_regulator import (expanded_lengths,
                                                      length_regulator)
from forwardtacotron_tpu.ops.pallas.length_regulator import \
    length_regulator_bidir_pallas
from forwardtacotron_tpu.ops.pallas.rnn import lstm_lr_mel_pallas


def _rand_params(rs, in_dim, hidden, scale=0.3):
    def u(*shape):
        return jnp.asarray(rs.uniform(-scale, scale, shape).astype(np.float32))
    return (u(in_dim, 4 * hidden), u(hidden, 4 * hidden),
            u(4 * hidden), u(4 * hidden))


def _xla_trunk(x_tok, dur, fwd, bwd, hidden, w_mel, b_mel, max_len):
    """The model's unfused branch: LR -> bidir scan -> Dense."""
    frames = length_regulator(x_tok, dur, max_len)
    lengths = expanded_lengths(dur)
    h = _bidir_scan(frames, lengths, fwd, bwd, _lstm_step, hidden, 2)
    return h @ w_mel + b_mel


@pytest.mark.parametrize('dtype,atol,t', [
    (jnp.float32, 2e-5, 128),
    (jnp.float32, 2e-5, 160),   # not a multiple of the LR time tile
    (jnp.bfloat16, 5e-2, 128)])
def test_lstm_lr_mel_matches_xla_trunk(dtype, atol, t):
    rs = np.random.RandomState(0)
    b, n, c, hidden, m = 3, 7, 128, 128, 80
    x = jnp.asarray(rs.randn(b, n, c).astype(np.float32) * 0.5).astype(dtype)
    # varying lengths incl. one item whose frames underfill the budget a lot
    dur = jnp.asarray(np.stack([
        rs.uniform(0.5, 3.0, n), rs.uniform(8.0, 18.0, n),
        rs.uniform(0.0, 1.2, n)]).astype(np.float32))
    fwd = _rand_params(rs, c, hidden)
    bwd = _rand_params(rs, c, hidden)
    w_mel = jnp.asarray(rs.randn(2 * hidden, m).astype(np.float32) * 0.1)
    b_mel = jnp.asarray(rs.randn(m).astype(np.float32) * 0.1)
    if dtype == jnp.bfloat16:
        fwd = jax.tree.map(lambda a: a.astype(dtype), fwd)
        bwd = jax.tree.map(lambda a: a.astype(dtype), bwd)
        w_mel, b_mel = w_mel.astype(dtype), b_mel.astype(dtype)

    want = _xla_trunk(x, dur, fwd, bwd, hidden, w_mel, b_mel, t)
    got = lstm_lr_mel_pallas(x, dur, fwd, bwd, hidden, w_mel, b_mel, t,
                             interpret=True)
    assert got.shape == (b, t, m)
    # compare on valid frames (beyond each item's length both paths emit
    # garbage-but-deterministic states that the model masks out)
    lengths = np.asarray(expanded_lengths(dur))
    for k in range(b):
        lv = min(int(lengths[k]), t)
        np.testing.assert_allclose(
            np.asarray(got[k, :lv], np.float32),
            np.asarray(want[k, :lv], np.float32), rtol=0, atol=atol)


def test_lr_bidir_layout_matches_stack_flip():
    """The bidirectional LR kernel's [T, 2, B, C] output must equal
    stack([LR, flip(LR)]) in the RNN kernels' time-major layout, including
    the over-budget clip semantics of take_along_axis."""
    from forwardtacotron_tpu.ops.length_regulator import duration_spans
    rs = np.random.RandomState(1)
    b, n, c, t = 4, 5, 128, 128
    x = jnp.asarray(rs.randn(b, n, c).astype(np.float32))
    dur = jnp.asarray(np.stack([
        rs.uniform(0.5, 4.0, n),
        rs.uniform(0.0, 1.0, n),
        np.full(n, 40.0),                  # 200 frames > t: over budget
        np.zeros(n)]).astype(np.float32))  # empty item
    starts, ends = duration_spans(dur)

    got = length_regulator_bidir_pallas(x, starts, ends, t, interpret=True)
    frames = length_regulator(x, dur, t)
    lengths = expanded_lengths(dur)
    want_f = jnp.transpose(frames, (1, 0, 2))
    want_b = jnp.transpose(flip_sequences(frames, lengths), (1, 0, 2))
    np.testing.assert_allclose(np.asarray(got[:, 0]), np.asarray(want_f),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got[:, 1]), np.asarray(want_b),
                               rtol=0, atol=1e-6)


def test_model_generate_dispatches_fused_trunk(monkeypatch):
    """ForwardTacotron.generate with Pallas serving mode forced on (CPU
    interpret) matches the XLA path end-to-end, and the fused trunk is
    actually taken."""
    from forwardtacotron_tpu.models.forward_tacotron import ForwardTacotron
    from forwardtacotron_tpu.ops.pallas import rnn as pallas_rnn

    monkeypatch.setenv('FTT_PALLAS_INTERPRET', '1')
    model = ForwardTacotron(
        embed_dims=64, series_embed_dims=16, durpred_conv_dims=32,
        durpred_rnn_dims=16, pitch_conv_dims=32, pitch_rnn_dims=16,
        energy_conv_dims=32, energy_rnn_dims=16, rnn_dims=128,
        prenet_dims=64, prenet_k=4, postnet_dims=32, postnet_k=4,
        n_mels=20)
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randint(1, 40, (2, 9)))
    variables = model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        {'x': x, 'dur': jnp.ones((2, 9)), 'mel_len': jnp.array([18, 18]),
         'pitch': jnp.zeros((2, 9)), 'energy': jnp.zeros((2, 9)),
         'mel': jnp.zeros((2, 18, 20))}, train=False)
    bf16_vars = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, 'dtype') and a.dtype == jnp.float32 else a, variables)

    dur = jnp.asarray(rs.uniform(0.8, 3.0, (2, 9)).astype(np.float32))
    # bf16 so the trunk input stays bf16 (serving passes bf16 series)
    pitch = jnp.zeros((2, 9), jnp.bfloat16)
    energy = jnp.zeros((2, 9), jnp.bfloat16)

    calls = []
    orig = pallas_rnn.lstm_lr_mel_sharded

    def spy(*args, **kw):
        calls.append(1)
        return orig(*args, **kw)

    monkeypatch.setattr(pallas_rnn, 'lstm_lr_mel_sharded', spy)

    ref = model.apply(bf16_vars, x, dur, pitch, energy, 128,
                      method=ForwardTacotron.generate)
    assert calls == []  # pallas mode off: XLA path

    with pallas_rnn.pallas_rnns('on'):
        got = model.apply(bf16_vars, x, dur, pitch, energy, 128,
                          method=ForwardTacotron.generate)
    assert calls, 'fused trunk was not dispatched'

    lengths = np.asarray(expanded_lengths(dur))
    for k in range(2):
        lv = int(lengths[k])
        np.testing.assert_allclose(
            np.asarray(got['mel'][k, :lv], np.float32),
            np.asarray(ref['mel'][k, :lv], np.float32), rtol=0, atol=8e-2)
        np.testing.assert_allclose(
            np.asarray(got['mel_post'][k, :lv], np.float32),
            np.asarray(ref['mel_post'][k, :lv], np.float32),
            rtol=0, atol=8e-2)


def test_multispeaker_generate_dispatches_fused_trunk(monkeypatch):
    """MultiForwardTacotron's decode shares the fused trunk (LSTM in_dim =
    2*prenet_dims + speaker_emb_dims)."""
    from forwardtacotron_tpu.models.multi_forward_tacotron import \
        MultiForwardTacotron
    from forwardtacotron_tpu.ops.pallas import rnn as pallas_rnn

    monkeypatch.setenv('FTT_PALLAS_INTERPRET', '1')
    model = MultiForwardTacotron(
        embed_dims=64, series_embed_dims=16, durpred_conv_dims=32,
        durpred_rnn_dims=16, pitch_conv_dims=32, pitch_rnn_dims=16,
        pitch_cond_conv_dims=32, pitch_cond_rnn_dims=16,
        energy_conv_dims=32, energy_rnn_dims=16, rnn_dims=128,
        prenet_dims=64, prenet_k=4, postnet_dims=32, postnet_k=4,
        n_mels=20, speaker_emb_dims=128)
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randint(1, 40, (2, 9)))
    semb = jnp.asarray(rs.randn(2, 128).astype(np.float32))
    variables = model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        {'x': x, 'dur': jnp.ones((2, 9)), 'mel_len': jnp.array([18, 18]),
         'pitch': jnp.zeros((2, 9)), 'energy': jnp.zeros((2, 9)),
         'pitch_cond': jnp.ones((2, 9), jnp.int32),
         'speaker_emb': semb, 'mel': jnp.zeros((2, 18, 20))}, train=False)
    bf16_vars = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, 'dtype') and a.dtype == jnp.float32 else a, variables)
    semb16 = semb.astype(jnp.bfloat16)
    dur = jnp.asarray(rs.uniform(0.8, 3.0, (2, 9)).astype(np.float32))
    pitch = jnp.zeros((2, 9), jnp.bfloat16)
    energy = jnp.zeros((2, 9), jnp.bfloat16)
    pc = jnp.ones((2, 9), jnp.int32)

    calls = []
    orig = pallas_rnn.lstm_lr_mel_sharded

    def spy(*args, **kw):
        calls.append(1)
        return orig(*args, **kw)
    monkeypatch.setattr(pallas_rnn, 'lstm_lr_mel_sharded', spy)

    ref = model.apply(bf16_vars, x, semb16, dur, pitch, energy, pc, 128,
                      method=MultiForwardTacotron.generate)
    assert calls == []
    with pallas_rnn.pallas_rnns('on'):
        got = model.apply(bf16_vars, x, semb16, dur, pitch, energy, pc, 128,
                          method=MultiForwardTacotron.generate)
    assert calls, 'fused trunk was not dispatched (multispeaker)'
    lengths = np.asarray(expanded_lengths(dur))
    for k in range(2):
        lv = int(lengths[k])
        np.testing.assert_allclose(
            np.asarray(got['mel'][k, :lv], np.float32),
            np.asarray(ref['mel'][k, :lv], np.float32), rtol=0, atol=8e-2)
