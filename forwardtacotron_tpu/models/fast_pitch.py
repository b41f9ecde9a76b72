"""FastPitch: transformer variant of the forward acoustic model.

Re-design of reference models/fast_pitch.py:44-235 — SeriesPredictors and
prenet/postnet are ForwardTransformers (FFT blocks) instead of conv/RNN
stacks. Notable reference quirks preserved: the postnet output feeds both
'mel' and 'mel_post' (no residual postnet, :161-165), and the post-LR
transformer in generate runs without a padding mask (:215).
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


class SeriesPredictor(nn.Module):
    """embed -> ForwardTransformer -> linear (reference fast_pitch.py:14-41)."""
    num_chars: int
    d_model: int
    n_heads: int
    d_fft: int
    layers: int
    conv1_kernel: int
    conv2_kernel: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 pad_mask: Optional[jnp.ndarray] = None,
                 alpha: float = 1.0, train: bool = False) -> jnp.ndarray:
        h = nn.Embed(self.num_chars, self.d_model, name='embedding')(x)
        h = ForwardTransformer(d_model=self.d_model, d_fft=self.d_fft,
                               layers=self.layers, heads=self.n_heads,
                               conv1_kernel=self.conv1_kernel,
                               conv2_kernel=self.conv2_kernel,
                               dropout=self.dropout,
                               name='transformer')(h, pad_mask, train)
        h = nn.Dense(1, name='lin')(h)
        return h / alpha


class FastPitch(nn.Module):
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
    padding_value: float = PAD_VALUE

    def setup(self):
        self.embedding = nn.Embed(self.num_chars, self.d_model)
        self.dur_pred = SeriesPredictor(
            self.num_chars, d_model=self.durpred_d_model,
            n_heads=self.durpred_n_heads, d_fft=self.durpred_d_fft,
            layers=self.durpred_layers, conv1_kernel=self.conv1_kernel,
            conv2_kernel=self.conv2_kernel, dropout=self.durpred_dropout)
        self.pitch_pred = SeriesPredictor(
            self.num_chars, d_model=self.pitch_d_model,
            n_heads=self.pitch_n_heads, d_fft=self.pitch_d_fft,
            layers=self.pitch_layers, conv1_kernel=self.conv1_kernel,
            conv2_kernel=self.conv2_kernel, dropout=self.pitch_dropout)
        self.energy_pred = SeriesPredictor(
            self.num_chars, d_model=self.energy_d_model,
            n_heads=self.energy_n_heads, d_fft=self.energy_d_fft,
            layers=self.energy_layers, conv1_kernel=self.conv1_kernel,
            conv2_kernel=self.conv2_kernel, dropout=self.energy_dropout)
        self.prenet = ForwardTransformer(
            d_model=self.d_model, d_fft=self.prenet_fft,
            layers=self.prenet_layers, heads=self.prenet_heads,
            conv1_kernel=self.conv1_kernel, conv2_kernel=self.conv2_kernel,
            dropout=self.prenet_dropout)
        self.postnet = ForwardTransformer(
            d_model=self.d_model, d_fft=self.postnet_fft,
            layers=self.postnet_layers, heads=self.postnet_heads,
            conv1_kernel=self.conv1_kernel, conv2_kernel=self.conv2_kernel,
            dropout=self.postnet_dropout)
        self.lin = nn.Dense(self.n_mels)
        self.pitch_proj = nn.Conv(self.d_model, kernel_size=(3,),
                                  padding=[(1, 1)])
        self.energy_proj = nn.Conv(self.d_model, kernel_size=(3,),
                                   padding=[(1, 1)])

    def __call__(self, batch: Dict[str, jnp.ndarray],
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        """Teacher-forced forward (reference fast_pitch.py:123-165)."""
        x = batch['x']
        dur = batch['dur']
        mel_lens = batch['mel_len']
        max_len = batch['mel'].shape[1]

        pad_mask = make_token_pad_mask(x)
        dur_hat = self.dur_pred(x, pad_mask, train=train)[..., 0]
        pitch_hat = self.pitch_pred(x, pad_mask, train=train)[..., 0]
        energy_hat = self.energy_pred(x, pad_mask, train=train)[..., 0]

        # the reference postnet sees exactly L = max expanded frames; zero the
        # static-shape padding beyond L for its convs and emit the reference's
        # _pad constant there (fast_pitch.py:150-165)
        batch_max = jnp.max(mel_lens)
        beyond = jnp.arange(max_len)[None, :] >= batch_max
        mel = self._decode(x=x, dur=dur, pitch=batch['pitch'],
                           energy=batch['energy'], max_len=max_len,
                           token_pad_mask=pad_mask,
                           mel_pad_mask=make_len_mask(mel_lens, max_len),
                           conv_zero_mask=beyond, train=train)
        mel = jnp.where(beyond[:, :, None], self.padding_value, mel)
        # reference emits the same tensor for both keys (:161-165)
        return {'mel': mel, 'mel_post': mel, 'dur': dur_hat,
                'pitch': pitch_hat, 'energy': energy_hat}

    def predict_series(self, x: jnp.ndarray, alpha: float = 1.0
                       ) -> Dict[str, jnp.ndarray]:
        # reference generate (:174-181) passes no pad mask to the predictors
        dur_hat = self.dur_pred(x, alpha=alpha)[..., 0]
        total = jnp.sum(jnp.trunc(dur_hat).astype(jnp.int32))
        dur_hat = jnp.where(total <= 0, jnp.full_like(dur_hat, 2.0), dur_hat)
        pitch_hat = self.pitch_pred(x)[..., 0]
        energy_hat = self.energy_pred(x)[..., 0]
        return {'dur': dur_hat, 'pitch': pitch_hat, 'energy': energy_hat}

    def generate(self, x: jnp.ndarray,
                 dur_hat: jnp.ndarray,
                 pitch_hat: jnp.ndarray,
                 energy_hat: jnp.ndarray,
                 max_len: int) -> Dict[str, jnp.ndarray]:
        """Decode phase (reference _generate_mel, fast_pitch.py:194-221)."""
        lengths = expanded_lengths(dur_hat)
        tail2d = make_len_mask(lengths, max_len)
        mel = self._decode(x=x, dur=dur_hat, pitch=pitch_hat,
                           energy=energy_hat, max_len=max_len,
                           token_pad_mask=make_token_pad_mask(x),
                           # reference generate runs the postnet unmasked on
                           # an exact-length sequence (:215); masking the
                           # bucket-padding tail reproduces that with a
                           # static shape
                           mel_pad_mask=tail2d,
                           conv_zero_mask=tail2d,
                           train=False)
        mel = jnp.where(tail2d[:, :, None], 0.0, mel)
        return {'mel': mel, 'mel_post': mel, 'dur': dur_hat,
                'pitch': pitch_hat, 'energy': energy_hat}

    def _decode(self, x, dur, pitch, energy, max_len,
                token_pad_mask, mel_pad_mask, conv_zero_mask, train):
        h = self.embedding(x)
        h = self.prenet(h, token_pad_mask, train)

        h = h + self.pitch_proj(pitch[:, :, None]) * self.pitch_strength
        h = h + self.energy_proj(energy[:, :, None]) * self.energy_strength

        h = length_regulator_auto(h, dur, max_len=max_len)
        h = self.postnet(h, mel_pad_mask, train,
                         conv_zero_mask=conv_zero_mask)
        return self.lin(h)

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> 'FastPitch':
        model_config = dict(config['fast_pitch']['model'])
        model_config['num_chars'] = len(phonemes)
        model_config['n_mels'] = config['dsp']['num_mels']
        return cls(**model_config)
