"""ForwardTacotron: the flagship single-speaker feed-forward acoustic model.

Re-designed from reference models/forward_tacotron.py:42-254 for TPU:
batch-first [B, T, C], CBHG prenet/postnet on the MXU, the length regulator
as a selection-matrix matmul with a static ``max_len``, the main bi-LSTM as a
length-aware `lax.scan` (reproducing pack_padded_sequence semantics of
reference :147-152 — the backward pass starts at the true last frame and
padded positions emit the padding value), and a jit-friendly two-phase
generate path (series predictors -> host reads total frames -> bucketed
static-length decode).

Output dict mirrors the reference contract: {'mel', 'mel_post', 'dur',
'pitch', 'energy'}; mel tensors are [B, T, n_mels] channels-last.
"""

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from forwardtacotron_tpu.models.layers import (CBHG, BatchNormConv, BiGRU,
                                               BiLSTM, frame_trunk,
                                               make_len_mask, multi_bigru)
from forwardtacotron_tpu.ops.length_regulator import (expanded_lengths,
                                                      length_regulator_auto)
from forwardtacotron_tpu.text.symbols import phonemes

PAD_VALUE = -11.5129


class SeriesPredictor(nn.Module):
    """Duration/pitch/energy predictor: embed -> 3x(conv+BN+dropout) -> biGRU
    -> linear (reference forward_tacotron.py:14-39).

    Split into ``features`` (conv stack) and ``head`` (output linear) so the
    serving path can fuse the three predictors' GRUs — plus the prenet's —
    into one scan (see :func:`multi_bigru`)."""
    num_chars: int
    emb_dim: int = 64
    conv_dims: int = 256
    rnn_dims: int = 64
    dropout: float = 0.5

    def setup(self):
        self.embedding = nn.Embed(self.num_chars, self.emb_dim)
        self.convs = [BatchNormConv(self.conv_dims, 5) for _ in range(3)]
        self.rnn = BiGRU(self.rnn_dims, in_dim=self.conv_dims)
        self.lin = nn.Dense(1)
        self.drop = nn.Dropout(self.dropout)

    def features(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = self.embedding(x)
        for conv in self.convs:
            x = self.drop(conv(x, train), deterministic=not train)
        return x

    def head(self, rnn_out: jnp.ndarray, alpha: float = 1.0) -> jnp.ndarray:
        return self.lin(rnn_out) / alpha

    def __call__(self, x: jnp.ndarray, alpha: float = 1.0,
                 train: bool = False) -> jnp.ndarray:
        return self.head(self.rnn(self.features(x, train)), alpha)


class ForwardTacotron(nn.Module):
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
    padding_value: float = PAD_VALUE

    def setup(self):
        self.embedding = nn.Embed(self.num_chars, self.embed_dims)
        self.dur_pred = SeriesPredictor(self.num_chars,
                                        emb_dim=self.series_embed_dims,
                                        conv_dims=self.durpred_conv_dims,
                                        rnn_dims=self.durpred_rnn_dims,
                                        dropout=self.durpred_dropout)
        self.pitch_pred = SeriesPredictor(self.num_chars,
                                          emb_dim=self.series_embed_dims,
                                          conv_dims=self.pitch_conv_dims,
                                          rnn_dims=self.pitch_rnn_dims,
                                          dropout=self.pitch_dropout)
        self.energy_pred = SeriesPredictor(self.num_chars,
                                           emb_dim=self.series_embed_dims,
                                           conv_dims=self.energy_conv_dims,
                                           rnn_dims=self.energy_rnn_dims,
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
        self.pitch_proj = nn.Conv(2 * self.prenet_dims, kernel_size=(3,),
                                  padding=[(1, 1)])
        self.energy_proj = nn.Conv(2 * self.prenet_dims, kernel_size=(3,),
                                   padding=[(1, 1)])

    def __call__(self, batch: Dict[str, jnp.ndarray],
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        """Teacher-forced training forward (reference forward_tacotron.py:118-165).

        batch: x [B,N] int tokens, dur [B,N], mel_len [B], pitch [B,N],
        energy [B,N], mel [B,T,n_mels] (only its length is used).
        """
        x = batch['x']
        dur = batch['dur']
        mel_lens = batch['mel_len']
        max_len = batch['mel'].shape[1]

        dur_hat = self.dur_pred(x, train=train)[..., 0]
        pitch_hat = self.pitch_pred(x, train=train)[..., 0]
        energy_hat = self.energy_pred(x, train=train)[..., 0]

        mel, mel_post = self._decode(
            x=x, dur=dur, pitch=batch['pitch'], energy=batch['energy'],
            max_len=max_len, mel_lens=mel_lens, train=train)

        return {'mel': mel, 'mel_post': mel_post, 'dur': dur_hat,
                'pitch': pitch_hat, 'energy': energy_hat}

    def predict_series(self, x: jnp.ndarray, alpha: float = 1.0
                       ) -> Dict[str, jnp.ndarray]:
        """Phase 1 of generation: predict durations/pitch/energy from tokens."""
        dur_hat = self.dur_pred(x, alpha=alpha)[..., 0]
        # all-zero-duration guard (reference :176-177): if the truncated sum
        # is <= 0 fill with 2 frames per token, inside the traced graph
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
        """Phase 2 of generation: decode mels from tokens + predicted series
        (reference _generate_mel, forward_tacotron.py:205-234)."""
        mel, mel_post = self._decode(x=x, dur=dur_hat, pitch=pitch_hat,
                                     energy=energy_hat, max_len=max_len,
                                     mel_lens=None, train=False)
        return {'mel': mel, 'mel_post': mel_post, 'dur': dur_hat,
                'pitch': pitch_hat, 'energy': energy_hat}

    def generate_combined(self, x: jnp.ndarray, max_len: int,
                          alpha: float = 1.0) -> Dict[str, jnp.ndarray]:
        """Single-dispatch serving path: series prediction + decode in one
        traced graph, with the four independent token-level recurrences
        (dur/pitch/energy predictor GRUs + prenet GRU) fused into ONE scan
        via block-diagonal recurrent weights (:func:`multi_bigru`).
        Numerically identical to ``predict_series`` + ``generate``."""
        dur_feat = self.dur_pred.features(x)
        pitch_feat = self.pitch_pred.features(x)
        energy_feat = self.energy_pred.features(x)
        pre_feat = self.prenet.pre_rnn(self.embedding(x))

        dur_rnn, pitch_rnn, energy_rnn, pre_out = multi_bigru([
            (dur_feat, None, self.dur_pred.rnn.dir_params(),
             self.durpred_rnn_dims),
            (pitch_feat, None, self.pitch_pred.rnn.dir_params(),
             self.pitch_rnn_dims),
            (energy_feat, None, self.energy_pred.rnn.dir_params(),
             self.energy_rnn_dims),
            (pre_feat, None, self.prenet.rnn.dir_params(),
             self.prenet_dims),
        ])

        dur_hat = self.dur_pred.head(dur_rnn, alpha)[..., 0]
        total = jnp.sum(jnp.trunc(dur_hat).astype(jnp.int32))
        dur_hat = jnp.where(total <= 0, jnp.full_like(dur_hat, 2.0), dur_hat)
        pitch_hat = self.pitch_pred.head(pitch_rnn)[..., 0]
        energy_hat = self.energy_pred.head(energy_rnn)[..., 0]

        mel, mel_post = self._decode_post_prenet(
            pre_out, dur=dur_hat, pitch=pitch_hat, energy=energy_hat,
            max_len=max_len, mel_lens=None, train=False)
        return {'mel': mel, 'mel_post': mel_post, 'dur': dur_hat,
                'pitch': pitch_hat, 'energy': energy_hat}

    def _decode(self, x: jnp.ndarray, dur: jnp.ndarray,
                pitch: jnp.ndarray, energy: jnp.ndarray,
                max_len: int, mel_lens: Optional[jnp.ndarray],
                train: bool):
        """Shared decoder trunk.

        Training mode (``mel_lens`` given) reproduces pack_padded_sequence
        semantics: the LSTM's backward pass starts at the true last frame and
        padded frames carry ``padding_value`` into the output projection
        (reference :147-152). Generate mode (``mel_lens`` None) runs on a
        bucket-padded static length: per-item expanded lengths steer the
        LSTM/postnet-GRU flips and the tail is zeroed so convolution
        boundaries match the reference's exact-length implicit zero padding.
        """
        h = self.embedding(x)
        h = self.prenet(h, train=train)
        return self._decode_post_prenet(h, dur=dur, pitch=pitch,
                                        energy=energy, max_len=max_len,
                                        mel_lens=mel_lens, train=train)

    def _decode_post_prenet(self, h: jnp.ndarray, dur: jnp.ndarray,
                            pitch: jnp.ndarray, energy: jnp.ndarray,
                            max_len: int, mel_lens: Optional[jnp.ndarray],
                            train: bool):
        pitch_proj = self.pitch_proj(pitch[:, :, None])
        h = h + pitch_proj * self.pitch_strength
        energy_proj = self.energy_proj(energy[:, :, None])
        h = h + energy_proj * self.energy_strength

        if mel_lens is not None:
            h = length_regulator_auto(h, dur, max_len=max_len)
            h = self.lstm(h, lengths=mel_lens)
            pad_mask = make_len_mask(mel_lens, max_len)
            h = jnp.where(pad_mask[:, :, None], self.padding_value, h)
            raw = self.lin(h)
            # The reference postnet sees exactly L = max(mel_lens) frames
            # (pad_packed output length); frames beyond L exist here only as
            # static-shape padding, so zero them (= torch's implicit conv
            # boundary) and stop the postnet's backward GRU at L.
            batch_max = jnp.max(mel_lens)
            beyond = (jnp.arange(max_len) >= batch_max)[None, :, None]
            post_in = jnp.where(beyond, 0.0, raw)
            post_lens = jnp.full((h.shape[0],), batch_max)
            post = self.postnet(post_in, train=train, lengths=post_lens)
            mel = jnp.where(beyond, self.padding_value, raw)
            mel_post = jnp.where(beyond, self.padding_value,
                                 self.post_proj(post))
        else:
            lengths = expanded_lengths(dur)
            raw = self._frame_trunk(h, dur, lengths, max_len)
            tail = make_len_mask(lengths, max_len)[:, :, None]
            mel = jnp.where(tail, 0.0, raw)
            post = self.postnet(mel, train=train, lengths=lengths)
            mel_post = jnp.where(tail, 0.0, self.post_proj(post))
        return mel, mel_post

    def _frame_trunk(self, h: jnp.ndarray, dur: jnp.ndarray,
                     lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
        return frame_trunk(self, h, dur, lengths, max_len,
                           self.lstm, self.lin, self.rnn_dims)

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> 'ForwardTacotron':
        model_config = dict(config['forward_tacotron']['model'])
        model_config['num_chars'] = len(phonemes)
        model_config['n_mels'] = config['dsp']['num_mels']
        return cls(**model_config)


def ForwardTacotronInference(model, variables):
    """Back-compat alias; see models/synthesis.py for the orchestrator."""
    from forwardtacotron_tpu.models.synthesis import TTSInference
    return TTSInference(model, variables, multispeaker=False)
