"""Tacotron teacher: autoregressive attention model used only to extract
phoneme durations (never shipped for inference).

Re-design of reference models/tacotron.py:12-374 for XLA: the Python-level
decoder loop (:261) becomes a `lax.scan` whose carry holds the attention
RNN, two residual LSTM cells, the LSA attention state (cumulative +
previous scores), and the context vector. The reduction factor r is a
static argument (schedule sessions re-jit per r, matching the reference's
per-session dataloaders), and `generate` runs a fixed-bound scan with a
finished flag instead of a data-dependent break (:331).

Quirk preserved: the decoder PreNet's dropout can be forced on in eval —
duration extraction runs the teacher with dropout active
(train_tacotron.py:120) — via the ``prenet_dropout_on`` flag.
"""

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from forwardtacotron_tpu.models.layers import CBHG
from forwardtacotron_tpu.text.symbols import phonemes

MAX_R = 20  # static width of the mel projection (reference tacotron.py:105)

# Decoder scan unroll factor (FTT_TACO_UNROLL): the decoder step is dozens
# of SMALL ops at batch ~32, so per-iteration while-loop overhead rivals the
# math in forward AND (via remat replay) backward. Swept on v5e at bf16 r=1
# bs=32 T=840: unroll 1 -> 6.07 steps/s, 8 -> 9.86, 12 -> 10.46 (compile
# 74 s), 16 -> 10.20 (compile 146 s) — 12 is the sweet spot (+72% over the
# r3 baseline; f32 r=1 5.63 -> 9.3).
import os
DECODER_SCAN_UNROLL = int(os.environ.get('FTT_TACO_UNROLL', '12'))


def _uinit(scale):
    init = nn.initializers.uniform(scale=2 * scale)

    def f(key, shape, dtype=jnp.float32):
        return init(key, shape, dtype) - scale
    return f


class GRUCellP(nn.Module):
    """Single-step GRU cell, PyTorch gate order (r, z, n)."""
    hidden: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
        scale = 1.0 / math.sqrt(self.hidden)
        wi = self.param('wi', _uinit(scale), (x.shape[-1], 3 * self.hidden))
        wh = self.param('wh', _uinit(scale), (self.hidden, 3 * self.hidden))
        bi = self.param('bi', _uinit(scale), (3 * self.hidden,))
        bh = self.param('bh', _uinit(scale), (3 * self.hidden,))
        xp = x @ wi + bi
        hp = h @ wh + bh
        xr, xz, xn = jnp.split(xp, 3, axis=-1)
        hr, hz, hn = jnp.split(hp, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        return (1.0 - z) * n + z * h


class LSTMCellP(nn.Module):
    """Single-step LSTM cell, PyTorch gate order (i, f, g, o)."""
    hidden: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        scale = 1.0 / math.sqrt(self.hidden)
        wi = self.param('wi', _uinit(scale), (x.shape[-1], 4 * self.hidden))
        wh = self.param('wh', _uinit(scale), (self.hidden, 4 * self.hidden))
        bi = self.param('bi', _uinit(scale), (4 * self.hidden,))
        bh = self.param('bh', _uinit(scale), (4 * self.hidden,))
        gates = x @ wi + bi + h @ wh + bh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        return h_new, c_new


class PreNet(nn.Module):
    """2x (Linear -> ReLU -> dropout); dropout follows ``dropout_on``, which
    duration extraction forces true in eval (reference tacotron.py:29-43)."""
    fc1_dims: int = 256
    fc2_dims: int = 128
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, dropout_on: bool = False) -> jnp.ndarray:
        x = jax.nn.relu(nn.Dense(self.fc1_dims, name='fc1')(x))
        x = nn.Dropout(self.dropout, deterministic=not dropout_on)(x)
        x = jax.nn.relu(nn.Dense(self.fc2_dims, name='fc2')(x))
        x = nn.Dropout(self.dropout, deterministic=not dropout_on)(x)
        return x


class Encoder(nn.Module):
    embed_dims: int
    num_chars: int
    cbhg_channels: int
    K: int
    num_highways: int
    dropout: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 x_lens: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        h = nn.Embed(self.num_chars, self.embed_dims, name='embedding')(x)
        h = PreNet(name='pre_net')(h, dropout_on=train)
        h = CBHG(K=self.K, channels=self.cbhg_channels,
                 proj_channels=[self.cbhg_channels, self.cbhg_channels],
                 num_highways=self.num_highways, name='cbhg')(h, train,
                                                              lengths=x_lens)
        return h


class LSA(nn.Module):
    """Location-sensitive attention: energies from query + encoder proj +
    a conv over (cumulative, previous) score maps (reference tacotron.py:65-99).

    Stateless here: (cumulative, attention) live in the decoder scan carry.
    """
    attn_dim: int
    kernel_size: int = 31
    filters: int = 32

    @nn.compact
    def __call__(self, encoder_seq_proj: jnp.ndarray, query: jnp.ndarray,
                 cumulative: jnp.ndarray, attention: jnp.ndarray,
                 token_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        # location features: [B, N, 2] -> conv over N -> [B, N, filters]
        location = jnp.stack([cumulative, attention], axis=-1)
        pad = (self.kernel_size - 1) // 2
        loc = nn.Conv(self.filters, kernel_size=(self.kernel_size,),
                      padding=[(pad, pad)], use_bias=False,
                      name='conv')(location)
        processed_loc = nn.Dense(self.attn_dim, name='L')(loc)
        processed_query = nn.Dense(self.attn_dim, name='W')(query)[:, None, :]
        u = nn.Dense(1, use_bias=False, name='v')(
            jnp.tanh(processed_query + encoder_seq_proj + processed_loc))[..., 0]
        if token_mask is not None:  # padded token columns get no mass
            u = jnp.where(token_mask, -1e9, u)
        return jax.nn.softmax(u, axis=1)


class Decoder(nn.Module):
    n_mels: int
    decoder_dims: int
    lstm_dims: int

    def setup(self):
        self.prenet = PreNet()
        self.attn_net = LSA(self.decoder_dims)
        self.attn_rnn = GRUCellP(self.decoder_dims)
        self.rnn_input = nn.Dense(self.lstm_dims)
        self.res_rnn1 = LSTMCellP(self.lstm_dims)
        self.res_rnn2 = LSTMCellP(self.lstm_dims)
        self.mel_proj = nn.Dense(self.n_mels * MAX_R, use_bias=False)

    def __call__(self, carry: Dict[str, jnp.ndarray],
                 prenet_out: jnp.ndarray,
                 encoder_seq: jnp.ndarray,
                 encoder_seq_proj: jnp.ndarray,
                 r: int,
                 train: bool = False,
                 zoneout_keys: Optional[jnp.ndarray] = None,
                 token_mask: Optional[jnp.ndarray] = None,
                 project_mel: bool = True
                 ) -> Tuple[Dict[str, jnp.ndarray],
                            Tuple[jnp.ndarray, jnp.ndarray]]:
        """One decode step. ``prenet_out`` is the already-PreNet-projected
        teacher/previous frame: the PreNet has no recurrent input, so the
        teacher-forced path hoists it out of the sequential scan into one
        batched GEMM over all steps (reference runs it per Python-loop step,
        tacotron.py:261). ``project_mel=False`` likewise skips the mel
        projection so the caller can run it as a single [S*B, D] GEMM after
        the scan (free-running generate keeps it in-step: the projected
        frame feeds back and gates the stop flag)."""
        attn_rnn_in = jnp.concatenate([carry['context'], prenet_out], axis=-1)
        attn_hidden = self.attn_rnn(attn_rnn_in, carry['attn_hidden'])

        scores = self.attn_net(encoder_seq_proj, attn_hidden,
                               carry['cumulative'], carry['attention'],
                               token_mask)
        cumulative = carry['cumulative'] + scores
        context = jnp.einsum('bn,bnc->bc', scores, encoder_seq)

        x = jnp.concatenate([context, attn_hidden], axis=-1)
        x = self.rnn_input(x)

        h1, c1 = self.res_rnn1(x, carry['h1'], carry['c1'])
        if train and zoneout_keys is not None:
            h1 = _zoneout(zoneout_keys[0], carry['h1'], h1)
        x = x + h1
        h2, c2 = self.res_rnn2(x, carry['h2'], carry['c2'])
        if train and zoneout_keys is not None:
            h2 = _zoneout(zoneout_keys[1], carry['h2'], h2)
        x = x + h2

        if project_mel:
            out = self.mel_proj(x).reshape(-1, self.n_mels, MAX_R)[:, :, :r]
        else:
            out = x
        new_carry = {'attn_hidden': attn_hidden, 'h1': h1, 'c1': c1,
                     'h2': h2, 'c2': c2, 'context': context,
                     'cumulative': cumulative, 'attention': scores}
        return new_carry, (out, scores)


def _zoneout(key, prev, current, p: float = 0.1):
    mask = jax.random.bernoulli(key, p, prev.shape)
    return jnp.where(mask, prev, current)


class Tacotron(nn.Module):
    embed_dims: int = 256
    num_chars: int = len(phonemes)
    encoder_dims: int = 128
    decoder_dims: int = 256
    n_mels: int = 80
    postnet_dims: int = 128
    encoder_k: int = 16
    lstm_dims: int = 512
    postnet_k: int = 8
    num_highways: int = 4
    dropout: float = 0.5
    stop_threshold: float = -11.0
    speaker_emb_dim: int = 256

    def setup(self):
        self.encoder = Encoder(self.embed_dims, self.num_chars,
                               self.encoder_dims, self.encoder_k,
                               self.num_highways, self.dropout)
        self.encoder_proj_query = nn.Dense(self.decoder_dims, use_bias=False)
        self.encoder_proj = nn.Dense(self.decoder_dims, use_bias=False)
        self.decoder = Decoder(self.n_mels, self.decoder_dims, self.lstm_dims)
        # reference hardcodes proj_channels=[256, 80] (tacotron.py:202);
        # [256, n_mels] is identical at n_mels=80 and stays valid for other
        # mel sizes (the residual add requires proj_channels[-1] == n_mels)
        self.postnet = CBHG(K=self.postnet_k, channels=self.postnet_dims,
                            proj_channels=[256, self.n_mels],
                            num_highways=self.num_highways)
        self.post_proj = nn.Dense(self.n_mels, use_bias=False)

    def _encode(self, x, speaker_emb, train, x_lens=None):
        encoder_seq = self.encoder(x, train, x_lens)
        if self.speaker_emb_dim > 0:
            tiled = jnp.broadcast_to(
                speaker_emb[:, None, :],
                (x.shape[0], encoder_seq.shape[1], speaker_emb.shape[-1]))
            encoder_seq = jnp.concatenate([encoder_seq, tiled], axis=-1)
        return (self.encoder_proj_query(encoder_seq),
                self.encoder_proj(encoder_seq))

    def _init_carry(self, batch_size: int, n_tokens: int):
        z = jnp.zeros
        return {'attn_hidden': z((batch_size, self.decoder_dims)),
                'h1': z((batch_size, self.lstm_dims)),
                'c1': z((batch_size, self.lstm_dims)),
                'h2': z((batch_size, self.lstm_dims)),
                'c2': z((batch_size, self.lstm_dims)),
                'context': z((batch_size, self.decoder_dims)),
                'cumulative': z((batch_size, n_tokens)),
                'attention': z((batch_size, n_tokens))}

    def __call__(self, batch: Dict[str, jnp.ndarray], r: int,
                 train: bool = False,
                 prenet_dropout_on: Optional[bool] = None,
                 x_lens: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Teacher-forced forward (reference tacotron.py:219-281).

        batch['mel'] is [B, T, n_mels] with T divisible by r. Returns
        (mel [B, T, n_mels], linear [B, T, n_mels], attention [B, S, N])
        where S = T // r decode steps.
        """
        x = batch['x']
        mel = batch['mel']
        b, t, _ = mel.shape
        n = x.shape[1]
        if prenet_dropout_on is None:
            prenet_dropout_on = train

        proj_query, proj = self._encode(x, batch.get('speaker_emb'), train,
                                        x_lens)
        token_mask = None if x_lens is None else (
            jnp.arange(n)[None, :] >= x_lens[:, None])
        carry0 = self._init_carry(b, n)

        steps = t // r
        # teacher forcing input: last mel frame of the previous step
        go_frame = jnp.zeros((b, self.n_mels), mel.dtype)
        prev_idx = jnp.arange(steps) * r - 1
        prenet_ins = jnp.where(
            (prev_idx < 0)[:, None, None], go_frame[None, :, :],
            jnp.swapaxes(mel[:, jnp.maximum(prev_idx, 0), :], 0, 1))

        if train:
            rng = self.make_rng('dropout')
            zo_keys = jax.vmap(
                lambda k: jax.random.split(k, 2))(jax.random.split(rng, steps))
        else:
            zo_keys = jnp.zeros((steps, 2, 2), jnp.uint32)

        # PreNet over every teacher frame at once: one [S*B, n_mels] GEMM
        # chain instead of S tiny launches inside the sequential scan (the
        # dropout masks stay i.i.d. per step; the reference draws them
        # per-loop-iteration, same distribution)
        prenet_outs = self.decoder.prenet(prenet_ins,
                                          dropout_on=prenet_dropout_on)

        def body(decoder, carry, xs):
            prenet_out, zkeys = xs
            return decoder(carry, prenet_out, proj_query, proj, r, train,
                           zkeys if train else None, token_mask,
                           project_mel=False)

        # Rematerialize the decoder step under training: the chip-measured
        # train step is backward-bound (93 ms step vs 16 ms forward at r=1,
        # scripts/bench_taco_profile.py) because the scan backward streams
        # every step's saved residuals — including the [B, N, attn_dim] LSA
        # intermediates — back from HBM. Recomputing the step in the
        # backward pass trades one extra forward's FLOPs (cheap, the MXU is
        # idle waiting on HBM here) for that traffic. prevent_cse is safe
        # off inside scan (jax.checkpoint docs).
        body_fn = nn.remat(body, prevent_cse=False) if train else body
        # unroll: the decoder step is dozens of SMALL ops (3 RNN cells, the
        # LSA conv/softmax, several Denses) at batch ~32 — per-iteration
        # while-loop overhead rivals the math, in forward AND (via remat
        # replay) backward. Unrolling trades compile time for that overhead.
        scan = nn.scan(body_fn, variable_broadcast='params',
                       split_rngs={'params': False, 'dropout': True},
                       in_axes=0, out_axes=0, unroll=DECODER_SCAN_UNROLL)
        _, (dec_steps, attn) = scan(self.decoder, carry0,
                                    (prenet_outs, zo_keys))

        # deferred mel projection: one [S*B, lstm_dims] GEMM, then
        # [S, B, n_mels, r] -> [B, T, n_mels]
        mel_steps = self.decoder.mel_proj(dec_steps).reshape(
            steps, b, self.n_mels, MAX_R)[..., :r]
        mel_out = jnp.transpose(mel_steps, (1, 0, 3, 2)).reshape(
            b, steps * r, self.n_mels)
        attn = jnp.swapaxes(attn, 0, 1)  # [B, S, N]

        post = self.postnet(mel_out, train)
        linear = self.post_proj(post)
        return mel_out, linear, attn

    def generate(self, x: jnp.ndarray,
                 speaker_emb: Optional[jnp.ndarray] = None,
                 steps: int = 2000, r: int = 1,
                 chunk: int = 32
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Free-running generation with a silence stop flag
        (reference tacotron.py:283-349). Returns (mel [B, T, n_mels],
        linear, attention [B, S, N], n_valid_steps [B]).

        Early exit: the decode is a ``lax.while_loop`` over ``chunk``-step
        scan blocks that stops once every batch item has flagged silence
        (the reference's data-dependent ``break``); shapes stay static —
        outputs are written into a full-length buffer, and frames past the
        chunk boundary where ALL items have finished are zeros. Per-item
        validity is given by ``n_valid``: frames between an item's
        ``n_valid`` and that boundary contain free-running junk (exactly as
        in the reference, which also keeps decoding items that went silent
        early while others continue). A batch that finishes at step k costs
        ceil(k/chunk)*chunk steps instead of ``steps``."""
        b, n = x.shape
        proj_query, proj = self._encode(x, speaker_emb, False)
        n_steps = -(-(steps // r) // chunk) * chunk  # pad up to chunk grid
        n_chunks = n_steps // chunk
        # buffers/carry in the compute dtype so bf16-cast variables decode
        # without a dtype mismatch at the dynamic_update_slice
        cdtype = proj_query.dtype
        carry0 = dict(self._init_carry(b, n),
                      prev_frame=jnp.zeros((b, self.n_mels), cdtype),
                      finished=jnp.zeros((b,), bool),
                      n_valid=jnp.zeros((b,), jnp.int32))

        def step(decoder, carry, t):
            inner = {k: carry[k] for k in
                     ('attn_hidden', 'h1', 'c1', 'h2', 'c2', 'context',
                      'cumulative', 'attention')}
            prenet_out = decoder.prenet(carry['prev_frame'],
                                        dropout_on=False)
            inner, (mels, scores) = decoder(inner, prenet_out,
                                            proj_query, proj, r,
                                            False, None, None)
            # pin the compute dtype: parts of the decoder promote to f32
            # (f32 constants/softmax), which would break the while_loop
            # carry and buffer dtypes under bf16-cast variables
            mels = mels.astype(cdtype)
            scores = scores.astype(cdtype)
            silent = jnp.all(mels < self.stop_threshold, axis=(1, 2))
            newly_finished = silent & (t * r > 10)
            finished = carry['finished'] | newly_finished
            # count this step's frames (reference breaks AFTER appending)
            n_valid = jnp.where(carry['finished'], carry['n_valid'],
                                carry['n_valid'] + 1)
            new_carry = dict(inner, prev_frame=mels[:, :, -1],
                             finished=finished, n_valid=n_valid)
            return new_carry, (mels, scores)

        chunk_scan = nn.scan(step, variable_broadcast='params',
                             split_rngs={'params': False, 'dropout': False},
                             in_axes=0, out_axes=0,
                             unroll=min(DECODER_SCAN_UNROLL, chunk))

        def cond_fn(mdl, state):
            carry, _, _, i = state
            return (i < n_chunks) & ~jnp.all(carry['finished'])

        def body_fn(decoder, state):
            carry, mel_buf, attn_buf, i = state
            ts = i * chunk + jnp.arange(chunk)
            carry, (mels, scores) = chunk_scan(decoder, carry, ts)
            # [chunk, B, n_mels, r] / [chunk, B, N] -> buffer slots
            mel_buf = jax.lax.dynamic_update_slice(
                mel_buf, mels, (i * chunk, 0, 0, 0))
            attn_buf = jax.lax.dynamic_update_slice(
                attn_buf, scores, (i * chunk, 0, 0))
            return carry, mel_buf, attn_buf, i + 1

        mel_buf0 = jnp.zeros((n_steps, b, self.n_mels, r), cdtype)
        attn_buf0 = jnp.zeros((n_steps, b, n), cdtype)
        final, mel_steps, attn, _ = nn.while_loop(
            cond_fn, body_fn, self.decoder,
            (carry0, mel_buf0, attn_buf0, jnp.zeros((), jnp.int32)),
            broadcast_variables='params')
        # crop the chunk-padded buffer back to the requested step budget
        s_req = steps // r
        mel_out = jnp.transpose(mel_steps, (1, 0, 3, 2)).reshape(
            b, n_steps * r, self.n_mels)[:, :s_req * r]
        attn = jnp.swapaxes(attn, 0, 1)[:, :s_req]
        post = self.postnet(mel_out, False)
        linear = self.post_proj(post)
        return mel_out, linear, attn, jnp.minimum(final['n_valid'], s_req)

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> 'Tacotron':
        model_config = dict(config['tacotron']['model'])
        model_config['num_chars'] = len(phonemes)
        model_config['n_mels'] = config['dsp']['num_mels']
        return cls(**model_config)
