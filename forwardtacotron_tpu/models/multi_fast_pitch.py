"""MultiFastPitch: speaker-conditioned transformer forward TTS.

Re-design of reference models/multi_fast_pitch.py:93-330: the same
transformer skeleton as FastPitch with speaker embeddings concatenated before
every transformer (so transformer widths are d_model + speaker_emb_dims) and
a categorical pitch-condition pathway like MultiForwardTacotron. The
reference quirk of 'mel' == 'mel_post' is preserved.
"""

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from forwardtacotron_tpu.models.layers import (ForwardTransformer,
                                               make_len_mask,
                                               make_token_pad_mask)
from forwardtacotron_tpu.ops.length_regulator import (expanded_lengths,
                                                      length_regulator_auto)
from forwardtacotron_tpu.text.symbols import phonemes

PAD_VALUE = -11.5129


def _tile_speaker(semb: jnp.ndarray, n: int) -> jnp.ndarray:
    return jnp.broadcast_to(semb[:, None, :], (semb.shape[0], n, semb.shape[1]))


class SeriesPredictor(nn.Module):
    """Speaker-conditioned transformer predictor
    (reference multi_fast_pitch.py:15-50)."""
    num_chars: int
    d_model: int
    n_heads: int
    d_fft: int
    layers: int
    conv1_kernel: int
    conv2_kernel: int
    speaker_emb_dims: int
    dropout: float = 0.1
    out_dim: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, semb: jnp.ndarray,
                 pad_mask: Optional[jnp.ndarray] = None,
                 alpha: float = 1.0, train: bool = False) -> jnp.ndarray:
        h = nn.Embed(self.num_chars, self.d_model, name='embedding')(x)
        h = jnp.concatenate([h, _tile_speaker(semb, h.shape[1])], axis=-1)
        h = ForwardTransformer(d_model=self.d_model + self.speaker_emb_dims,
                               d_fft=self.d_fft, layers=self.layers,
                               heads=self.n_heads,
                               conv1_kernel=self.conv1_kernel,
                               conv2_kernel=self.conv2_kernel,
                               dropout=self.dropout,
                               name='transformer')(h, pad_mask, train)
        h = nn.Dense(self.out_dim, name='lin')(h)
        return h / alpha


class ConditionalSeriesPredictor(nn.Module):
    """Adds categorical pitch-condition embedding
    (reference multi_fast_pitch.py:53-91)."""
    num_chars: int
    d_model: int
    n_heads: int
    d_fft: int
    layers: int
    conv1_kernel: int
    conv2_kernel: int
    speaker_emb_dims: int
    cond_emb_size: int = 4
    cond_emb_dims: int = 8
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_cond: jnp.ndarray,
                 semb: jnp.ndarray,
                 pad_mask: Optional[jnp.ndarray] = None,
                 alpha: float = 1.0, train: bool = False) -> jnp.ndarray:
        h = nn.Embed(self.num_chars, self.d_model, name='embedding')(x)
        c = nn.Embed(self.cond_emb_size, self.cond_emb_dims,
                     name='conditional_embedding')(x_cond)
        h = jnp.concatenate([h, c, _tile_speaker(semb, h.shape[1])], axis=-1)
        width = self.d_model + self.speaker_emb_dims + self.cond_emb_dims
        h = ForwardTransformer(d_model=width, d_fft=self.d_fft,
                               layers=self.layers, heads=self.n_heads,
                               conv1_kernel=self.conv1_kernel,
                               conv2_kernel=self.conv2_kernel,
                               dropout=self.dropout,
                               name='transformer')(h, pad_mask, train)
        h = nn.Dense(1, name='lin')(h)
        return h / alpha


class MultiFastPitch(nn.Module):
    num_chars: int = len(phonemes)
    durpred_dropout: float = 0.5
    durpred_d_model: int = 128
    durpred_n_heads: int = 2
    durpred_layers: int = 4
    durpred_d_fft: int = 128
    pitch_dropout: float = 0.5
    pitch_d_model: int = 128
    pitch_n_heads: int = 2
    pitch_layers: int = 4
    pitch_d_fft: int = 128
    energy_dropout: float = 0.5
    energy_d_model: int = 128
    energy_n_heads: int = 2
    energy_layers: int = 4
    energy_d_fft: int = 128
    pitch_cond_d_model: int = 128
    pitch_cond_n_heads: int = 2
    pitch_cond_layers: int = 4
    pitch_cond_d_fft: int = 128
    pitch_cond_dropout: float = 0.1
    pitch_cond_output_dims: int = 3
    pitch_strength: float = 1.0
    energy_strength: float = 1.0
    d_model: int = 256
    conv1_kernel: int = 9
    conv2_kernel: int = 1
    prenet_layers: int = 4
    prenet_heads: int = 2
    prenet_fft: int = 1024
    prenet_dropout: float = 0.1
    postnet_layers: int = 4
    postnet_heads: int = 2
    postnet_fft: int = 1024
    postnet_dropout: float = 0.1
    n_mels: int = 80
    speaker_emb_dims: int = 256
    padding_value: float = PAD_VALUE

    def setup(self):
        common = dict(conv1_kernel=self.conv1_kernel,
                      conv2_kernel=self.conv2_kernel,
                      speaker_emb_dims=self.speaker_emb_dims)
        self.dur_pred = ConditionalSeriesPredictor(
            self.num_chars, d_model=self.durpred_d_model,
            n_heads=self.durpred_n_heads, d_fft=self.durpred_d_fft,
            layers=self.durpred_layers, dropout=self.durpred_dropout, **common)
        self.pitch_pred = ConditionalSeriesPredictor(
            self.num_chars, d_model=self.pitch_d_model,
            n_heads=self.pitch_n_heads, d_fft=self.pitch_d_fft,
            layers=self.pitch_layers, dropout=self.pitch_dropout, **common)
        self.pitch_cond_pred = SeriesPredictor(
            self.num_chars, d_model=self.pitch_cond_d_model,
            n_heads=self.pitch_cond_n_heads, d_fft=self.pitch_cond_d_fft,
            layers=self.pitch_cond_layers, dropout=self.pitch_cond_dropout,
            out_dim=self.pitch_cond_output_dims, **common)
        self.energy_pred = SeriesPredictor(
            self.num_chars, d_model=self.energy_d_model,
            n_heads=self.energy_n_heads, d_fft=self.energy_d_fft,
            layers=self.energy_layers, dropout=self.energy_dropout, **common)
        self.embedding = nn.Embed(self.num_chars, self.d_model)
        width = self.d_model + self.speaker_emb_dims
        self.prenet = ForwardTransformer(
            d_model=width, d_fft=self.prenet_fft, layers=self.prenet_layers,
            heads=self.prenet_heads, conv1_kernel=self.conv1_kernel,
            conv2_kernel=self.conv2_kernel, dropout=self.prenet_dropout)
        self.postnet = ForwardTransformer(
            d_model=width, d_fft=self.postnet_fft, layers=self.postnet_layers,
            heads=self.postnet_heads, conv1_kernel=self.conv1_kernel,
            conv2_kernel=self.conv2_kernel, dropout=self.postnet_dropout)
        self.lin = nn.Dense(self.n_mels)
        self.pitch_proj = nn.Conv(width, kernel_size=(3,), padding=[(1, 1)])
        self.energy_proj = nn.Conv(width, kernel_size=(3,), padding=[(1, 1)])

    def __call__(self, batch: Dict[str, jnp.ndarray],
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        """Teacher-forced forward (reference multi_fast_pitch.py:194-246)."""
        x = batch['x']
        dur = batch['dur']
        semb = batch['speaker_emb']
        mel_lens = batch['mel_len']
        pitch_cond = batch['pitch_cond']
        max_len = batch['mel'].shape[1]

        pad_mask = make_token_pad_mask(x)
        dur_hat = self.dur_pred(x, pitch_cond, semb, pad_mask,
                                train=train)[..., 0]
        pitch_hat = self.pitch_pred(x, pitch_cond, semb, pad_mask,
                                    train=train)[..., 0]
        pitch_cond_hat = self.pitch_cond_pred(x, semb, pad_mask, train=train)
        energy_hat = self.energy_pred(x, semb, pad_mask, train=train)[..., 0]

        # exact-length postnet emulation + reference _pad constant, as in
        # FastPitch (multi_fast_pitch.py:229-246)
        batch_max = jnp.max(mel_lens)
        beyond = jnp.arange(max_len)[None, :] >= batch_max
        mel = self._decode(x=x, semb=semb, dur=dur, pitch=batch['pitch'],
                           energy=batch['energy'], max_len=max_len,
                           token_pad_mask=pad_mask,
                           mel_pad_mask=make_len_mask(mel_lens, max_len),
                           conv_zero_mask=beyond, train=train)
        mel = jnp.where(beyond[:, :, None], self.padding_value, mel)
        return {'mel': mel, 'mel_post': mel, 'dur': dur_hat,
                'pitch': pitch_hat, 'energy': energy_hat,
                'pitch_cond': pitch_cond_hat}

    def predict_series(self, x: jnp.ndarray, semb: jnp.ndarray,
                       alpha: float = 1.0) -> Dict[str, jnp.ndarray]:
        logits = self.pitch_cond_pred(x, semb, alpha=alpha)
        pitch_cond_hat = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        dur_hat = self.dur_pred(x, pitch_cond_hat, semb, alpha=alpha)[..., 0]
        total = jnp.sum(jnp.trunc(dur_hat).astype(jnp.int32))
        dur_hat = jnp.where(total <= 0, jnp.full_like(dur_hat, 2.0), dur_hat)
        pitch_hat = self.pitch_pred(x, pitch_cond_hat, semb)[..., 0]
        energy_hat = self.energy_pred(x, semb)[..., 0]
        return {'dur': dur_hat, 'pitch': pitch_hat, 'energy': energy_hat,
                'pitch_cond': pitch_cond_hat}

    def generate(self, x: jnp.ndarray, semb: jnp.ndarray,
                 dur_hat: jnp.ndarray, pitch_hat: jnp.ndarray,
                 energy_hat: jnp.ndarray, pitch_cond_hat: jnp.ndarray,
                 max_len: int) -> Dict[str, jnp.ndarray]:
        lengths = expanded_lengths(dur_hat)
        tail2d = make_len_mask(lengths, max_len)
        mel = self._decode(x=x, semb=semb, dur=dur_hat, pitch=pitch_hat,
                           energy=energy_hat, max_len=max_len,
                           token_pad_mask=make_token_pad_mask(x),
                           mel_pad_mask=tail2d, conv_zero_mask=tail2d,
                           train=False)
        mel = jnp.where(tail2d[:, :, None], 0.0, mel)
        return {'mel': mel, 'mel_post': mel, 'dur': dur_hat,
                'pitch': pitch_hat, 'energy': energy_hat,
                'pitch_cond': pitch_cond_hat}

    def _decode(self, x, semb, dur, pitch, energy, max_len,
                token_pad_mask, mel_pad_mask, conv_zero_mask, train):
        h = self.embedding(x)
        h = jnp.concatenate([h, _tile_speaker(semb, h.shape[1])], axis=-1)
        h = self.prenet(h, token_pad_mask, train)

        h = h + self.pitch_proj(pitch[:, :, None]) * self.pitch_strength
        h = h + self.energy_proj(energy[:, :, None]) * self.energy_strength

        h = length_regulator_auto(h, dur, max_len=max_len)
        h = self.postnet(h, mel_pad_mask, train,
                         conv_zero_mask=conv_zero_mask)
        return self.lin(h)

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> 'MultiFastPitch':
        model_config = dict(config['multi_fast_pitch']['model'])
        model_config['num_chars'] = len(phonemes)
        model_config['n_mels'] = config['dsp']['num_mels']
        return cls(**model_config)
