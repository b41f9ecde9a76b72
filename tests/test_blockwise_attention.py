"""Blockwise (flash-style, exact online-softmax) attention for long-form
FastPitch synthesis: parity vs the full-softmax path, automatic dispatch
above the threshold, and a >=4k-frame generate that never materializes the
[T, T] score matrix (SURVEY §2.7 SP/CP; reference fast_pitch.py:156 is the
only quadratic-in-frames op of the model family)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from forwardtacotron_tpu.models.layers import (MultiHeadAttention,
                                               blockwise_attention)


def _full_reference(q, k, v, mask):
    d = q.shape[-1]
    logits = jnp.einsum('bhqd,bhkd->bhqk', q, k) / np.sqrt(d)
    if mask is not None:
        logits = jnp.where(mask[:, None, None, :], -jnp.inf, logits)
    w = jax.nn.softmax(logits, axis=-1)
    w = jnp.where(jnp.isnan(w), 0.0, w)
    return jnp.einsum('bhqk,bhkd->bhqd', w, v)


@pytest.mark.parametrize('t,block', [(300, 64), (1024, 512), (130, 128)])
def test_blockwise_matches_full(t, block):
    rs = np.random.RandomState(0)
    b, h, d = 3, 2, 32
    q = jnp.asarray(rs.randn(b, h, t, d).astype(np.float32))
    k = jnp.asarray(rs.randn(b, h, t, d).astype(np.float32))
    v = jnp.asarray(rs.randn(b, h, t, d).astype(np.float32))
    # ragged key padding; item 2 fully padded (full path -> zeros)
    mask = np.zeros((b, t), bool)
    mask[0, t // 2:] = True
    mask[2, :] = True
    mask = jnp.asarray(mask)

    want = _full_reference(q, k, v, mask)
    got = blockwise_attention(q, k, v, mask, block_q=block, block_k=block)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=2e-5)
    assert np.all(np.asarray(got[2]) == 0.0)

    # no mask at all
    got2 = blockwise_attention(q, k, v, None, block_q=block, block_k=block)
    want2 = _full_reference(q, k, v, None)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               rtol=0, atol=2e-5)


def test_mha_dispatches_blockwise_above_threshold(monkeypatch):
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 96, 64).astype(np.float32))
    mask = jnp.asarray(np.arange(96)[None, :] >= np.array([[90], [60]]))
    mha = MultiHeadAttention(d_model=64, n_heads=4)
    variables = mha.init(jax.random.PRNGKey(0), x)

    full = mha.apply(variables, x, mask)          # threshold 2048: full path
    monkeypatch.setenv('FTT_ATTN_BLOCK_T', '64')  # force blockwise
    calls = []
    import forwardtacotron_tpu.models.layers as L
    orig = L.blockwise_attention

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)
    monkeypatch.setattr(L, 'blockwise_attention', spy)
    blk = mha.apply(variables, x, mask)
    assert calls, 'blockwise path not dispatched'
    np.testing.assert_allclose(np.asarray(blk), np.asarray(full),
                               rtol=0, atol=2e-5)
    # training mode keeps the full path regardless of length (dropout needs
    # the weights tensor)
    calls.clear()
    mha.apply(variables, x, mask, train=True,
              rngs={'dropout': jax.random.PRNGKey(1)})
    assert calls == []


@pytest.mark.slow
def test_fastpitch_long_article_4k_frames(monkeypatch):
    """A >=4k-frame FastPitch generate through the blockwise postnet
    attention: runs at O(T) attention memory and matches the full path."""
    from forwardtacotron_tpu.models.fast_pitch import FastPitch

    model = FastPitch(
        durpred_d_model=32, durpred_layers=1, durpred_d_fft=32,
        pitch_d_model=32, pitch_layers=1, pitch_d_fft=32,
        energy_d_model=32, energy_layers=1, energy_d_fft=32,
        d_model=64, prenet_layers=1, prenet_fft=64,
        postnet_layers=1, postnet_fft=64, n_mels=20)
    rs = np.random.RandomState(2)
    n_tok = 256
    x = jnp.asarray(rs.randint(1, 40, (1, n_tok)))
    variables = model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        {'x': x, 'dur': jnp.ones((1, n_tok)), 'mel_len': jnp.array([16]),
         'pitch': jnp.zeros((1, n_tok)), 'energy': jnp.zeros((1, n_tok)),
         'mel': jnp.zeros((1, 16, 20))}, train=False)

    dur = jnp.full((1, n_tok), 17.0)   # 4352 frames
    pitch = jnp.zeros((1, n_tok))
    energy = jnp.zeros((1, n_tok))
    t = 4352

    monkeypatch.setenv('FTT_ATTN_BLOCK_T', '100000')   # force FULL path
    full = model.apply(variables, x, dur, pitch, energy, t,
                       method=FastPitch.generate)
    monkeypatch.setenv('FTT_ATTN_BLOCK_T', '1024')     # blockwise
    blk = model.apply(variables, x, dur, pitch, energy, t,
                      method=FastPitch.generate)
    np.testing.assert_allclose(np.asarray(blk['mel']),
                               np.asarray(full['mel']), rtol=0, atol=3e-4)
