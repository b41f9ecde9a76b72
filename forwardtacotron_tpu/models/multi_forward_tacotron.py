"""MultiForwardTacotron: speaker-conditioned forward TTS with a categorical
pitch-condition head.

Re-design of reference models/multi_forward_tacotron.py:96-324: speaker
embeddings concatenate onto the series-predictor conv inputs and onto the
prenet output before the decoder LSTM; duration/pitch predictors additionally
condition on a 3-class pitch-condition sequence (0=pad, 1=zero-pitch,
2=voiced) predicted by its own SeriesPredictor head (:141-146). Same TPU
decode trunk as ForwardTacotron.
"""

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from forwardtacotron_tpu.models.layers import (CBHG, BatchNormConv, BiGRU,
                                               BiLSTM, frame_trunk,
                                               make_len_mask)
from forwardtacotron_tpu.ops.length_regulator import (expanded_lengths,
                                                      length_regulator_auto)
from forwardtacotron_tpu.text.symbols import phonemes

PAD_VALUE = -11.5129


def _tile_speaker(semb: jnp.ndarray, n: int) -> jnp.ndarray:
    return jnp.broadcast_to(semb[:, None, :], (semb.shape[0], n, semb.shape[1]))


class SeriesPredictor(nn.Module):
    """Speaker-conditioned predictor with configurable output width
    (reference multi_forward_tacotron.py:14-50)."""
    num_chars: int
    emb_dim: int = 64
    conv_dims: int = 256
    rnn_dims: int = 64
    dropout: float = 0.5
    out_dim: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, semb: jnp.ndarray,
                 alpha: float = 1.0, train: bool = False) -> jnp.ndarray:
        h = nn.Embed(self.num_chars, self.emb_dim, name='embedding')(x)
        h = jnp.concatenate([h, _tile_speaker(semb, h.shape[1])], axis=-1)
        for i in range(3):
            h = BatchNormConv(self.conv_dims, 5, name=f'convs_{i}')(h, train)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = BiGRU(self.rnn_dims, name='rnn')(h)
        h = nn.Dense(self.out_dim, name='lin')(h)
        return h / alpha


class ConditionalSeriesPredictor(nn.Module):
    """Adds a categorical pitch-condition embedding to the conv input
    (reference multi_forward_tacotron.py:53-93)."""
    num_chars: int
    emb_dim: int = 64
    cond_emb_size: int = 4
    cond_emb_dims: int = 8
    conv_dims: int = 256
    rnn_dims: int = 64
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_cond: jnp.ndarray,
                 semb: jnp.ndarray, alpha: float = 1.0,
                 train: bool = False) -> jnp.ndarray:
        h = nn.Embed(self.num_chars, self.emb_dim, name='embedding')(x)
        c = nn.Embed(self.cond_emb_size, self.cond_emb_dims,
                     name='pitch_cond_embedding')(x_cond)
        h = jnp.concatenate([h, c, _tile_speaker(semb, h.shape[1])], axis=-1)
        for i in range(3):
            h = BatchNormConv(self.conv_dims, 5, name=f'convs_{i}')(h, train)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = BiGRU(self.rnn_dims, name='rnn')(h)
        h = nn.Dense(1, name='lin')(h)
        return h / alpha


class MultiForwardTacotron(nn.Module):
    embed_dims: int = 256
    series_embed_dims: int = 64
    num_chars: int = len(phonemes)
    durpred_conv_dims: int = 256
    durpred_rnn_dims: int = 64
    durpred_dropout: float = 0.5
    pitch_conv_dims: int = 256
    pitch_rnn_dims: int = 128
    pitch_dropout: float = 0.5
    pitch_strength: float = 1.0
    pitch_cond_conv_dims: int = 256
    pitch_cond_rnn_dims: int = 64
    pitch_cond_dropout: float = 0.5
    energy_conv_dims: int = 256
    energy_rnn_dims: int = 64
    energy_dropout: float = 0.5
    energy_strength: float = 1.0
    rnn_dims: int = 512
    prenet_dims: int = 256
    prenet_k: int = 16
    postnet_num_highways: int = 4
    prenet_dropout: float = 0.5
    postnet_dims: int = 256
    postnet_k: int = 8
    prenet_num_highways: int = 4
    postnet_dropout: float = 0.0
    n_mels: int = 80
    speaker_emb_dims: int = 256
    pitch_cond_emb_dims: int = 8
    pitch_cond_categorical_dims: int = 3
    padding_value: float = PAD_VALUE

    def setup(self):
        self.embedding = nn.Embed(self.num_chars, self.embed_dims)
        self.dur_pred = ConditionalSeriesPredictor(
            self.num_chars, emb_dim=self.series_embed_dims,
            conv_dims=self.durpred_conv_dims, rnn_dims=self.durpred_rnn_dims,
            cond_emb_dims=self.pitch_cond_emb_dims,
            dropout=self.durpred_dropout)
        self.pitch_cond_pred = SeriesPredictor(
            self.num_chars, emb_dim=self.series_embed_dims,
            conv_dims=self.pitch_cond_conv_dims,
            rnn_dims=self.pitch_cond_rnn_dims,
            dropout=self.pitch_cond_dropout,
            out_dim=self.pitch_cond_categorical_dims)
        self.pitch_pred = ConditionalSeriesPredictor(
            self.num_chars, emb_dim=self.series_embed_dims,
            conv_dims=self.pitch_conv_dims, rnn_dims=self.pitch_rnn_dims,
            cond_emb_dims=self.pitch_cond_emb_dims,
            dropout=self.pitch_dropout)
        self.energy_pred = SeriesPredictor(
            self.num_chars, emb_dim=self.series_embed_dims,
            conv_dims=self.energy_conv_dims, rnn_dims=self.energy_rnn_dims,
            dropout=self.energy_dropout)
        self.prenet = CBHG(K=self.prenet_k,
                           channels=self.prenet_dims,
                           proj_channels=[self.prenet_dims, self.embed_dims],
                           num_highways=self.prenet_num_highways,
                           dropout=self.prenet_dropout)
        self.lstm = BiLSTM(self.rnn_dims)
        self.lin = nn.Dense(self.n_mels)
        self.postnet = CBHG(K=self.postnet_k,
                            channels=self.postnet_dims,
                            proj_channels=[self.postnet_dims, self.n_mels],
                            num_highways=self.postnet_num_highways,
                            dropout=self.postnet_dropout)
        self.post_proj = nn.Dense(self.n_mels, use_bias=False)
        proj_dims = 2 * self.prenet_dims + self.speaker_emb_dims
        self.pitch_proj = nn.Conv(proj_dims, kernel_size=(3,),
                                  padding=[(1, 1)])
        self.energy_proj = nn.Conv(proj_dims, kernel_size=(3,),
                                   padding=[(1, 1)])

    def __call__(self, batch: Dict[str, jnp.ndarray],
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        """Teacher-forced forward (reference multi_forward_tacotron.py:186-241)."""
        x = batch['x']
        dur = batch['dur']
        semb = batch['speaker_emb']
        mel_lens = batch['mel_len']
        pitch_cond = batch['pitch_cond']
        max_len = batch['mel'].shape[1]

        pitch_cond_hat = self.pitch_cond_pred(x, semb, train=train)
        dur_hat = self.dur_pred(x, pitch_cond, semb, train=train)[..., 0]
        pitch_hat = self.pitch_pred(x, pitch_cond, semb, train=train)[..., 0]
        energy_hat = self.energy_pred(x, semb, train=train)[..., 0]

        mel, mel_post = self._decode(
            x=x, semb=semb, dur=dur, pitch=batch['pitch'],
            energy=batch['energy'], max_len=max_len, mel_lens=mel_lens,
            train=train)

        return {'mel': mel, 'mel_post': mel_post, 'dur': dur_hat,
                'pitch': pitch_hat, 'energy': energy_hat,
                'pitch_cond': pitch_cond_hat}

    def predict_series(self, x: jnp.ndarray, semb: jnp.ndarray,
                       alpha: float = 1.0) -> Dict[str, jnp.ndarray]:
        logits = self.pitch_cond_pred(x, semb)
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
        mel, mel_post = self._decode(x=x, semb=semb, dur=dur_hat,
                                     pitch=pitch_hat, energy=energy_hat,
                                     max_len=max_len, mel_lens=None,
                                     train=False)
        return {'mel': mel, 'mel_post': mel_post, 'dur': dur_hat,
                'pitch': pitch_hat, 'energy': energy_hat,
                'pitch_cond': pitch_cond_hat}

    def _decode(self, x, semb, dur, pitch, energy, max_len,
                mel_lens: Optional[jnp.ndarray], train: bool):
        h = self.embedding(x)
        h = self.prenet(h, train=train)
        h = jnp.concatenate([h, _tile_speaker(semb, h.shape[1])], axis=-1)

        h = h + self.pitch_proj(pitch[:, :, None]) * self.pitch_strength
        h = h + self.energy_proj(energy[:, :, None]) * self.energy_strength

        if mel_lens is not None:
            h = length_regulator_auto(h, dur, max_len=max_len)
            h = self.lstm(h, lengths=mel_lens)
            pad_mask = make_len_mask(mel_lens, max_len)
            h = jnp.where(pad_mask[:, :, None], self.padding_value, h)
            raw = self.lin(h)
            batch_max = jnp.max(mel_lens)
            beyond = (jnp.arange(max_len) >= batch_max)[None, :, None]
            post_in = jnp.where(beyond, 0.0, raw)
            post_lens = jnp.full((x.shape[0],), batch_max)
            post = self.postnet(post_in, train=train, lengths=post_lens)
            mel = jnp.where(beyond, self.padding_value, raw)
            mel_post = jnp.where(beyond, self.padding_value,
                                 self.post_proj(post))
        else:
            lengths = expanded_lengths(dur)
            raw = frame_trunk(self, h, dur, lengths, max_len,
                              self.lstm, self.lin, self.rnn_dims)
            tail = make_len_mask(lengths, max_len)[:, :, None]
            mel = jnp.where(tail, 0.0, raw)
            post = self.postnet(mel, train=train, lengths=lengths)
            mel_post = jnp.where(tail, 0.0, self.post_proj(post))
        return mel, mel_post

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> 'MultiForwardTacotron':
        model_config = dict(config['multi_forward_tacotron']['model'])
        model_config['num_chars'] = len(phonemes)
        model_config['n_mels'] = config['dsp']['num_mels']
        return cls(**model_config)
