"""Core neural blocks, designed TPU-first with flax.linen.

Covers the shared blocks of reference models/common_layers.py — HighwayNetwork
(:27-40), BatchNormConv with its ReLU-before-BN order (:43-57), CBHG (:60-124),
PositionalEncoding (:127-145), FFTBlock (:148-185), ForwardTransformer
(:188-223) — plus PyTorch-gate-compatible GRU/LSTM cells.

Design choices that differ from the reference implementation (not behavior):
  * batch-first channels-last [B, T, C] everywhere; convs lower to XLA
    `conv_general_dilated` on the MXU instead of [B, C, T] torch Conv1d.
  * RNNs precompute the input projection for the whole sequence as one big
    matmul, then `lax.scan` only carries the recurrent matmul — the input
    GEMM runs on the MXU at full batch size instead of per-step.
  * Parameters keep PyTorch gate order (GRU: r,z,n; LSTM: i,f,g,o) so
    reference checkpoints convert by transpose alone.
"""

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# ----------------------------------------------------------------- primitives


def conv1d(features: int, kernel: int, use_bias: bool = True,
           name: str = 'conv') -> nn.Conv:
    """1-D conv over [B, T, C] with torch-style ``padding=kernel//2``.

    For even kernels torch produces T+1 outputs; callers truncate to T
    (CBHG bank semantics, reference common_layers.py:99).
    """
    pad = kernel // 2
    return nn.Conv(features=features, kernel_size=(kernel,),
                   padding=[(pad, pad)], use_bias=use_bias, name=name)


class BatchNormConv(nn.Module):
    """Conv (no bias) -> optional ReLU -> BatchNorm.

    The ReLU runs BEFORE the norm — a quirk of the reference
    (models/common_layers.py:54-57) that checkpoints depend on.
    """
    features: int
    kernel: int
    relu: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        t = x.shape[1]
        x = conv1d(self.features, self.kernel, use_bias=False)(x)
        x = x[:, :t, :]  # even kernels emit one extra frame
        if self.relu:
            x = jax.nn.relu(x)
        # dtype=x.dtype: statistics still accumulate in f32 inside flax, but
        # the normalized output keeps the compute dtype — without this the
        # f32 running stats promote every BN output back to f32 and silently
        # defeat bf16 mixed-precision training (no-op for f32 inputs)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name='bnorm', dtype=x.dtype)(x)
        return x


class HighwayNetwork(nn.Module):
    """y = g * relu(W1 x) + (1 - g) * x, g = sigmoid(W2 x).

    (A combined [C, 2C] single-GEMM formulation of the two projections was
    measured on v5e at postnet serving shapes and REJECTED: 23.2 ms vs
    20.4 ms for the 4-highway stack — XLA already schedules the two GEMMs
    well and the concat/slice relayout costs more than the saved read.)"""
    size: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x1 = nn.Dense(self.size, name='W1')(x)
        x2 = nn.Dense(self.size, name='W2')(x)
        g = jax.nn.sigmoid(x2)
        return g * jax.nn.relu(x1) + (1.0 - g) * x


# ----------------------------------------------------------------------- RNNs

# Unrolling the recurrent scan amortizes XLA's while-loop overhead on TPU;
# identical numerics (same op order), ~code-size/compile-time tradeoff.
SCAN_UNROLL = 8


def flip_sequences(x: jnp.ndarray, lengths: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Reverse along time; with ``lengths`` only the valid prefix is reversed
    (so a backward RNN starts at the true last frame, matching
    pack_padded_sequence semantics of reference forward_tacotron.py:147-152)."""
    if lengths is None:
        return jnp.flip(x, axis=1)
    t = x.shape[1]
    pos = jnp.arange(t)[None, :]
    idx = jnp.where(pos < lengths[:, None], lengths[:, None] - 1 - pos, pos)
    # clamp: lengths may exceed T under a fixed serving frame budget
    # (generate_fused crops over-budget durations); take_along_axis's
    # default out-of-bounds mode is 'fill' (NaN), which would poison the
    # whole item instead of cropping it
    idx = jnp.minimum(idx, t - 1)
    return jnp.take_along_axis(x, idx[:, :, None], axis=1)


class _RNNDirParams(nn.Module):
    """Parameter holder for one RNN direction (wi/wh/bi/bh, torch layout)."""
    hidden: int
    n_gates: int

    @nn.compact
    def __call__(self, in_dim: int):
        h, g = self.hidden, self.n_gates
        scale = 1.0 / math.sqrt(h)
        init = nn.initializers.uniform(scale=2 * scale)

        def uinit(key, shape, dtype=jnp.float32):
            return init(key, shape, dtype) - scale

        return (self.param('wi', uinit, (in_dim, g * h)),
                self.param('wh', uinit, (h, g * h)),
                self.param('bi', uinit, (g * h,)),
                self.param('bh', uinit, (g * h,)))


def _bidir_scan(x, lengths, fwd_params, bwd_params, step_fn, hidden,
                n_carry):
    """Run both directions in ONE scan: the backward pass rides along as a
    second 'direction' batch axis, halving the sequential depth (the usual
    two-scan formulation serializes 2T cell steps; this does T). Identical
    per-direction numerics — each direction keeps its own weights via a
    batched [2, H, G] contraction.

    On TPU, inference paths that opt in (ops.pallas.rnn.pallas_rnns) and
    meet the tiling constraints dispatch to the fused Pallas kernel, which
    keeps weights VMEM-resident and computes the input projection in-kernel
    instead of materializing [T, B, 2, G] in HBM."""
    from forwardtacotron_tpu.ops.pallas import rnn as pallas_rnn
    if pallas_rnn.eligible(x.dtype, x.shape[-1], hidden):
        cell = 'lstm' if n_carry == 2 else 'gru'
        if pallas_rnn.pallas_rnns_trainable():
            from forwardtacotron_tpu.ops.pallas import rnn_train
            return rnn_train.bidir_rnn_trainable_sharded(
                x, lengths, fwd_params, bwd_params, hidden, cell)
        # the _sharded variant shard_maps over the data axis when the
        # serving jit is partitioned over a mesh (and is a plain call when
        # not), so multi-device serving keeps the fused kernels
        return pallas_rnn.bidir_rnn_pallas_sharded(
            x, lengths, fwd_params, bwd_params, hidden, cell)

    wi_f, wh_f, bi_f, bh_f = fwd_params
    wi_b, wh_b, bi_b, bh_b = bwd_params
    b = x.shape[0]

    xproj_f = x @ wi_f + bi_f
    xproj_b = flip_sequences(x, lengths) @ wi_b + bi_b
    xp = jnp.stack([xproj_f, xproj_b], axis=2)          # [B, T, 2, G]
    xp = jnp.swapaxes(xp, 0, 1)                          # [T, B, 2, G]
    # force materialization: without the barrier XLA can fuse the producer
    # chain (input GEMM and everything upstream) into the scan body and
    # recompute it every step, turning a <1 ms scan into tens of ms
    xp = jax.lax.optimization_barrier(xp)

    wh = jnp.stack([wh_f, wh_b])                         # [2, H, G]
    bh = jnp.stack([bh_f, bh_b])                         # [2, G]

    def step(carry, xp_t):
        return step_fn(carry, xp_t, wh, bh)

    zeros = jnp.zeros((b, 2, hidden), x.dtype)
    carry0 = tuple(zeros for _ in range(n_carry))
    _, hs = jax.lax.scan(step, carry0, xp, unroll=SCAN_UNROLL)
    hs = jnp.swapaxes(hs, 0, 1)                          # [B, T, 2, H]
    fwd_out = hs[:, :, 0]
    bwd_out = flip_sequences(hs[:, :, 1], lengths)
    return jnp.concatenate([fwd_out, bwd_out], axis=-1)


def _gru_step(carry, xp_t, wh, bh):
    (h,) = carry
    hproj = jnp.einsum('bdh,dhg->bdg', h, wh) + bh[None]
    xr, xz, xn = jnp.split(xp_t, 3, axis=-1)
    hr, hz, hn = jnp.split(hproj, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    hnew = (1.0 - z) * n + z * h
    return (hnew,), hnew


def _lstm_step(carry, xp_t, wh, bh):
    h, c = carry
    gates = xp_t + jnp.einsum('bdh,dhg->bdg', h, wh) + bh[None]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return (h_new, c_new), h_new


class BiGRU(nn.Module):
    """Bidirectional GRU. ``in_dim`` is optional; when set, ``dir_params()``
    exposes the raw gate weights so several independent BiGRUs can be fused
    into one scan by :func:`multi_bigru` (the single-dispatch serving path)."""
    hidden: int
    in_dim: Optional[int] = None

    def setup(self):
        self.fwd = _RNNDirParams(self.hidden, 3)
        self.bwd = _RNNDirParams(self.hidden, 3)

    def __call__(self, x: jnp.ndarray,
                 lengths: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        in_dim = x.shape[-1]
        return _bidir_scan(x, lengths, self.fwd(in_dim), self.bwd(in_dim),
                           _gru_step, self.hidden, 1)

    def dir_params(self):
        """(fwd, bwd) gate weights, each (wi, wh, bi, bh). Requires ``in_dim``
        (param shapes must be known without an input)."""
        if self.in_dim is None:
            raise ValueError('BiGRU.dir_params() requires in_dim to be set')
        return self.fwd(self.in_dim), self.bwd(self.in_dim)


def multi_bigru(entries) -> list:
    """Run several independent bidirectional GRUs as ONE `lax.scan`.

    ``entries``: list of ``(x [B,T,in_i], lengths_i or None,
    (fwd_params, bwd_params), hidden_i)``. Returns a list of
    ``[B, T, 2*hidden_i]`` outputs, numerically identical to calling each
    BiGRU separately.

    TPU rationale: XLA executes separate scans serially, so k token-level
    GRUs cost k*T sequential cell steps. Concatenating hidden states and
    making the recurrent weight block-diagonal (zeros off-block contribute
    exact 0.0 to each gate) turns that into T steps of one larger GEMM —
    fewer, bigger MXU dispatches and 1/k the sequential depth."""
    hiddens = [e[3] for e in entries]
    H = sum(hiddens)
    offs = np.concatenate([[0], np.cumsum(hiddens)])
    b = entries[0][0].shape[0]
    dtype = entries[0][0].dtype

    # per-GRU full-sequence input projections (parallel, MXU-friendly)
    xps = []
    for x, lens, (fwd, bwd), h in entries:
        wi_f, _, bi_f, _ = fwd
        wi_b, _, bi_b, _ = bwd
        xps.append((x @ wi_f + bi_f,
                    flip_sequences(x, lens) @ wi_b + bi_b))

    def regroup(d):  # concat per gate across GRUs -> [B, T, 3H]
        return jnp.concatenate(
            [jnp.concatenate([xps[i][d][..., g * h:(g + 1) * h]
                              for i, h in enumerate(hiddens)], axis=-1)
             for g in range(3)], axis=-1)

    # block-diagonal recurrent weights, one [2, H, 3H] batched contraction
    wh_comb = jnp.zeros((2, H, 3 * H), dtype)
    bh_comb = jnp.zeros((2, 3 * H), dtype)
    for i, (x, lens, dirs, h) in enumerate(entries):
        lo, hi = int(offs[i]), int(offs[i + 1])
        for d in range(2):
            _, wh, _, bh = dirs[d]
            for g in range(3):
                wh_comb = wh_comb.at[d, lo:hi,
                                     g * H + lo:g * H + hi].set(
                    wh[:, g * h:(g + 1) * h])
                bh_comb = bh_comb.at[d, g * H + lo:g * H + hi].set(
                    bh[g * h:(g + 1) * h])

    from forwardtacotron_tpu.ops.pallas import rnn as pallas_rnn
    if pallas_rnn.eligible(dtype, 16, H):
        hs = pallas_rnn.gru_from_xp_pallas_sharded(
            regroup(0), regroup(1), wh_comb, bh_comb, H)
        hs = jnp.transpose(hs, (2, 0, 1, 3))             # [B, T, 2, H]
    else:
        xp = jnp.stack([regroup(0), regroup(1)], axis=2)  # [B, T, 2, 3H]
        xp = jnp.swapaxes(xp, 0, 1)
        xp = jax.lax.optimization_barrier(xp)

        def step(carry, xp_t):
            return _gru_step(carry, xp_t, wh_comb, bh_comb)

        zeros = jnp.zeros((b, 2, H), dtype)
        _, hs = jax.lax.scan(step, (zeros,), xp, unroll=SCAN_UNROLL)
        hs = jnp.swapaxes(hs, 0, 1)                      # [B, T, 2, H]

    outs = []
    for i, (x, lens, dirs, h) in enumerate(entries):
        lo, hi = int(offs[i]), int(offs[i + 1])
        fwd_out = hs[:, :, 0, lo:hi]
        bwd_out = flip_sequences(hs[:, :, 1, lo:hi], lens)
        outs.append(jnp.concatenate([fwd_out, bwd_out], axis=-1))
    return outs


class BiLSTM(nn.Module):
    hidden: int

    def setup(self):
        self.fwd = _RNNDirParams(self.hidden, 4)
        self.bwd = _RNNDirParams(self.hidden, 4)

    def __call__(self, x: jnp.ndarray,
                 lengths: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        in_dim = x.shape[-1]
        return _bidir_scan(x, lengths, self.fwd(in_dim), self.bwd(in_dim),
                           _lstm_step, self.hidden, 2)

    def dir_params(self, in_dim: int):
        """(fwd, bwd) gate weights, each (wi, wh, bi, bh) — the fused
        serving trunk (ops/pallas/rnn.py lstm_lr_mel_pallas) consumes the
        raw weights instead of calling this module."""
        return self.fwd(in_dim), self.bwd(in_dim)


def frame_trunk(module: nn.Module, h: jnp.ndarray, dur: jnp.ndarray,
                lengths: jnp.ndarray, max_len: int,
                lstm: BiLSTM, lin: nn.Dense, rnn_dims: int) -> jnp.ndarray:
    """Serving frame-rate trunk shared by the forward models: LR -> bi-LSTM
    -> mel Dense (reference forward_tacotron.py:145-154).

    On TPU in bf16 serving mode this dispatches to the fused Pallas trunk
    (ops/pallas/rnn.py lstm_lr_mel_pallas): the [B, T, in_dim] expanded
    activations and the [B, T, 2*rnn_dims] LSTM states never round-trip
    HBM. Elsewhere (training, f32, CPU) it is the plain op chain."""
    from forwardtacotron_tpu.ops.length_regulator import \
        length_regulator_auto
    from forwardtacotron_tpu.ops.pallas import rnn as pallas_rnn
    in_dim = h.shape[-1]
    if (not module.is_initializing()
            and not pallas_rnn.pallas_rnns_trainable()
            and pallas_rnn.eligible(h.dtype, in_dim, rnn_dims)
            and in_dim % 128 == 0):
        fwd, bwd = lstm.dir_params(in_dim)
        lin_p = lin.variables['params']
        return pallas_rnn.lstm_lr_mel_sharded(
            h, dur, fwd, bwd, rnn_dims, lin_p['kernel'], lin_p['bias'],
            max_len)
    h = length_regulator_auto(h, dur, max_len=max_len)
    h = lstm(h, lengths=lengths)
    return lin(h)


# ----------------------------------------------------------------------- CBHG


def maxpool_time(x: jnp.ndarray) -> jnp.ndarray:
    """MaxPool1d(kernel=2, stride=1, padding=1) over time, truncated to T
    (reference common_layers.py:78,105)."""
    t = x.shape[1]
    pooled = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 2, 1), window_strides=(1, 1, 1),
        padding=((0, 0), (1, 1), (0, 0)))
    return pooled[:, :t, :]


class CBHG(nn.Module):
    """Conv bank (k=1..K) -> maxpool -> 2 projections -> residual -> highway
    stack -> bidirectional GRU (reference common_layers.py:60-124).

    Setup-style so the serving path can run ``pre_rnn`` (everything before the
    GRU) and fuse the GRU itself into a combined scan via
    :func:`multi_bigru` + ``self.rnn.dir_params()``."""
    K: int
    channels: int
    proj_channels: Sequence[int]
    num_highways: int
    dropout: float = 0.5
    # Optional inference path: run the K bank convs as ONE K-tap convolution
    # (each smaller kernel zero-embedded) + one fused per-channel BN.
    # Numerically equal to the per-k path (zero taps contribute exact 0.0)
    # but measured SLOWER on v5e at serving shapes — the bank is MXU-compute
    # bound and the zero taps are real MACs (K^2/sum(k) ~ 1.8x FLOPs):
    # postnet K=8 bank 29.7 ms fused vs 23.7 ms per-k, prenet K=16 61.2 vs
    # 41.3 ms (scripts/bench_bank_ab.py, batch 4096). Off by default; kept
    # for shapes where dispatch overhead dominates (tiny batches).
    fuse_bank: bool = False
    # inference: stream bank -> maxpool -> proj1 per branch so the
    # [B, T, K*C] concat never hits HBM (see _bank_pool_proj1_streamed);
    # exact to f32-accumulation rounding. Measured on v5e at postnet serving
    # shapes (batch 4096 x 256 frames, bf16): 102.3 ms streamed vs 89.4 ms
    # concat — XLA's one big-K im2col matmul beats 8 small partial convs, so
    # this ships OFF; kept for small-batch regimes where the [B, T, K*C]
    # materialization dominates instead.
    stream_pool_proj: bool = False
    # inference: maxpool + tail-zero + proj1-conv as ONE Pallas kernel on
    # the VMEM-resident bank concat (ops/pallas/cbhg.py) — the concat read
    # once instead of pool-read/write + conv-im2col-read. MEASURED on v5e
    # at serving shapes (batch 4096, bf16): postnet 93.8 vs 88.8 ms, prenet
    # 78.3 vs 68.8 — the 2 MB VMEM blocks cap per-program GEMM size below
    # what XLA's global schedule achieves, so this ships OFF like the other
    # CBHG fusion attempts (bank, streamed, highway). Exact to f32 rounding,
    # parity-tested.
    fuse_pool_proj: bool = False
    # inference: run the whole highway stack as ONE Pallas kernel
    # (ops/pallas/highway.py) — the activation tile stays VMEM-resident
    # through all 2*num_highways chained [C, C] GEMMs, so the per-layer HBM
    # round-trips of the XLA schedule disappear (r4 decomposition: 20.6 ms
    # for the 4-stack vs its 5.6 ms compute floor at postnet serving
    # shapes). Measured on v5e at those shapes: 9.8 ms fused vs 22.6 ms
    # XLA (2.3x, kernel docstring has the variant ladder) — the first CBHG
    # Pallas fusion that WINS, so it ships ON for inference.
    fuse_highways: bool = True
    # inference: maxpool + tail mask as one Pallas kernel (pool_mask_pallas)
    # — isolated 18.7 vs 25.7 ms XLA at postnet shapes, but MEASURED
    # END-TO-END on v5e it LOSES: serving 24.5k vs 29.7k audio-s/s/chip
    # with it on — in situ XLA fuses the pool+mask into the surrounding
    # concat/proj chain, and the kernel's sublane-shift relayout plus the
    # extra dispatch boundary cost more than the isolated win. Ships OFF,
    # kept with parity tests like the other rejected CBHG fusions.
    fuse_pool: bool = False
    # inference: the ENTIRE bank -> ReLU/BN -> maxpool -> tail mask ->
    # proj1 -> ReLU/BN front as ONE Pallas kernel
    # (ops/pallas/cbhg.py bank_pool_proj_pallas) — unlike every earlier
    # attempt, the [B, T, K*C] bank concat never exists anywhere (HBM or
    # VMEM): branches stream one at a time through scratch, each feeding
    # partial proj1 GEMMs. Measured on a QUIET v5e (whole-CBHG, bf16,
    # median-of-4): postnet 167 vs 176 ms, prenet 130.4 vs 132.3 —
    # isolated wins, end-to-end serving delta recorded in STATUS.
    fuse_front: bool = True

    def setup(self):
        # attribute/list names are chosen so the parameter tree is identical
        # to the reference layout (conv1d_bank_{k-1}, conv_project1/2,
        # pre_highway, highways_{i}, rnn)
        self.conv1d_bank = [BatchNormConv(self.channels, k)
                            for k in range(1, self.K + 1)]
        self.conv_project1 = BatchNormConv(self.proj_channels[0], 3)
        self.conv_project2 = BatchNormConv(self.proj_channels[1], 3,
                                           relu=False)
        self.pre_highway = nn.Dense(self.channels, use_bias=False)
        self.highways = [HighwayNetwork(self.channels)
                         for _ in range(self.num_highways)]
        self.rnn = BiGRU(self.channels, in_dim=self.channels)
        self.drop = nn.Dropout(self.dropout)

    def _bank_fused(self, x: jnp.ndarray) -> jnp.ndarray:
        """The K bank convs (reference common_layers.py:72-79) as ONE conv.

        Separate k=1..K convs each re-read the input from HBM and dispatch
        their own (small) MXU contraction — at serving shapes the bank is
        the dominant CBHG cost. Zero-embedding each k-tap kernel at offset
        K//2 - k//2 inside a K-tap kernel makes one conv compute all K
        outputs exactly (every bank conv sees the same zero boundary, and
        zero taps contribute exact 0.0), cutting input reads K-fold and
        leaving one large MXU dispatch. The K BatchNorms reduce to a single
        fused per-channel normalize over the concatenated running stats
        (inference only — training keeps per-module stats updates).
        """
        kernels = [m.variables['params']['conv']['kernel']
                   for m in self.conv1d_bank]
        dt = x.dtype
        K, t = self.K, x.shape[1]
        parts = []
        for k, w in zip(range(1, K + 1), kernels):
            off = K // 2 - k // 2
            parts.append(jnp.pad(w, ((off, K - k - off), (0, 0), (0, 0))))
        w_full = jnp.concatenate(parts, axis=-1).astype(dt)  # [K, Cin, K*C]
        y = jax.lax.conv_general_dilated(
            x, w_full, window_strides=(1,), padding=[(K // 2, K // 2)],
            dimension_numbers=('NWC', 'WIO', 'NWC'))[:, :t, :]
        y = jax.nn.relu(y)

        def cat(col, name):
            return jnp.concatenate(
                [m.variables[col]['bnorm'][name]
                 for m in self.conv1d_bank]).astype(dt)

        # flax BatchNorm eval-normalize order at dtype=x.dtype
        mean, var = cat('batch_stats', 'mean'), cat('batch_stats', 'var')
        scale, bias = cat('params', 'scale'), cat('params', 'bias')
        return (y - mean) * (jax.lax.rsqrt(var + 1e-5) * scale) + bias

    def _bank_pool_proj1_streamed(self, x: jnp.ndarray, t: int,
                                  tail: Optional[jnp.ndarray]) -> jnp.ndarray:
        """Inference-only: bank -> maxpool -> first projection conv without
        ever materializing the [B, T, K*C] bank concatenation in HBM.

        The first projection is a k=3 conv over the concatenated channels,
        which is exactly the sum over bank branches of a k=3 conv with the
        matching input-channel slice of its kernel; maxpool is per-channel
        so it commutes with the concat. Streaming each branch through
        conv_k -> ReLU -> BN -> pool -> partial-proj keeps every
        intermediate at [B, T, C] (XLA fuses the chain), cutting the
        concat+pool+im2col HBM round-trips of the [B, T, K*C] tensor
        (4.3 GB at postnet serving shapes). f32 partial accumulation; the
        ReLU + BN of conv_project1 are applied once on the sum."""
        w1 = self.conv_project1.variables['params']['conv']['kernel']
        v1 = self.conv_project1.variables
        dt = x.dtype
        c = self.channels
        acc = None
        for i, conv in enumerate(self.conv1d_bank):
            y = conv(x, False)[:, :t, :]
            y = maxpool_time(y)
            if tail is not None:
                y = jnp.where(tail, 0.0, y)
            wk = w1[:, i * c:(i + 1) * c, :].astype(dt)
            part = jax.lax.conv_general_dilated(
                y, wk, window_strides=(1,), padding=[(1, 1)],
                dimension_numbers=('NWC', 'WIO', 'NWC'),
                preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
        y = jax.nn.relu(acc)
        mean = v1['batch_stats']['bnorm']['mean'].astype(jnp.float32)
        var = v1['batch_stats']['bnorm']['var'].astype(jnp.float32)
        scale = v1['params']['bnorm']['scale'].astype(jnp.float32)
        bias = v1['params']['bnorm']['bias'].astype(jnp.float32)
        y = (y - mean) * (jax.lax.rsqrt(var + 1e-5) * scale) + bias
        return y.astype(dt)

    def _pool_proj_fusable(self, t: int, dtype) -> bool:
        """Inference + TPU + whole-T-block-sized sequences: the fused
        maxpool+proj1 Pallas kernel (ops/pallas/cbhg.py) applies."""
        if not self.fuse_pool_proj or self.is_initializing():
            return False
        from forwardtacotron_tpu.ops.pallas.cbhg import MAX_T
        from forwardtacotron_tpu.ops.pallas.rnn import interpret_forced
        kc = self.K * self.channels
        if t > MAX_T or kc % 128 != 0:
            return False
        # must match pool_proj1_pallas's 2 MB per-block VMEM budget: even at
        # batch-tile 1 a bigger block would exceed the kernel's scoped limit
        # once the in-kernel f32 pool temporary is counted
        if t * kc * jnp.dtype(dtype).itemsize > 2 * 2 ** 20:
            return False
        import jax
        return jax.default_backend() == 'tpu' or interpret_forced()

    def _pool_proj1_fused(self, xc: jnp.ndarray,
                          tail: Optional[jnp.ndarray]) -> jnp.ndarray:
        """maxpool -> tail-zero -> proj1 conv as ONE Pallas kernel on the
        VMEM-resident bank concat (the dropouts around them are identity at
        inference), then proj1's ReLU + BatchNorm eval affine."""
        from forwardtacotron_tpu.ops.pallas.cbhg import pool_proj1_pallas
        b, t, _ = xc.shape
        if tail is None:
            mask = jnp.ones((b, t), xc.dtype)
        else:
            mask = 1.0 - tail[:, :, 0].astype(xc.dtype)
        w = self.conv_project1.variables['params']['conv']['kernel']
        y = pool_proj1_pallas(xc, mask, w)
        y = jax.nn.relu(y.astype(jnp.float32))
        v1 = self.conv_project1.variables
        mean = v1['batch_stats']['bnorm']['mean'].astype(jnp.float32)
        var = v1['batch_stats']['bnorm']['var'].astype(jnp.float32)
        scale = v1['params']['bnorm']['scale'].astype(jnp.float32)
        bias = v1['params']['bnorm']['bias'].astype(jnp.float32)
        y = (y - mean) * (jax.lax.rsqrt(var + 1e-5) * scale) + bias
        return y.astype(xc.dtype)

    def pre_rnn(self, x: jnp.ndarray, train: bool = False,
                lengths: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Everything before the bidirectional GRU; see ``__call__`` for the
        ``lengths`` semantics."""
        tail = None
        if lengths is not None:
            tail = (jnp.arange(x.shape[1])[None, :]
                    >= lengths[:, None])[:, :, None]
            x = jnp.where(tail, 0.0, x)
        residual = x
        t = x.shape[1]

        if not train and self._front_fusable(t, x.shape[-1]):
            if tail is None:
                mask = jnp.ones(x.shape[:2], jnp.float32)
            else:
                mask = 1.0 - tail[:, :, 0].astype(jnp.float32)
            x = self._front_fused(x, mask)
        elif self.stream_pool_proj and not train \
                and not self.is_initializing():
            x = self._bank_pool_proj1_streamed(x, t, tail)
        elif not train and self._pool_proj_fusable(t, x.dtype):
            bank = [conv(x, train)[:, :t, :] for conv in self.conv1d_bank]
            x = jnp.concatenate(bank, axis=-1)
            x = self._pool_proj1_fused(x, tail)
        else:
            if self.fuse_bank and not train and not self.is_initializing():
                x = self._bank_fused(x)
            else:
                bank = [conv(x, train)[:, :t, :]
                        for conv in self.conv1d_bank]
                x = jnp.concatenate(bank, axis=-1)

            if not train and self._pool_kernel_usable():
                from forwardtacotron_tpu.ops.pallas.cbhg import \
                    pool_mask_pallas
                if tail is None:
                    mask = jnp.ones(x.shape[:2], jnp.float32)
                else:
                    mask = 1.0 - tail[:, :, 0].astype(jnp.float32)
                x = pool_mask_pallas(x, mask)
            else:
                x = maxpool_time(x)
                if tail is not None:
                    x = jnp.where(tail, 0.0, x)
            x = self.drop(x, deterministic=not train)

            x = self.conv_project1(x, train)
        if tail is not None:
            x = jnp.where(tail, 0.0, x)
        x = self.drop(x, deterministic=not train)
        x = self.conv_project2(x, train)

        if not train and self._highways_fusable(x.dtype):
            # residual add + pre_highway + all highway layers in ONE
            # dispatch: the [B, T, C] projected activation never
            # round-trips HBM between pre_highway and the stack
            x = self._pre_highways_fused(x, residual)
        else:
            x = x + residual
            x = self.pre_highway(x)
            for hw in self.highways:
                x = hw(x)
        return x

    def _pool_kernel_usable(self) -> bool:
        if not self.fuse_pool or self.is_initializing():
            return False
        import jax
        from forwardtacotron_tpu.ops.pallas.rnn import interpret_forced
        return jax.default_backend() == 'tpu' or interpret_forced()

    def _front_fusable(self, t: int, c_in: int) -> bool:
        if not self.fuse_front or self.is_initializing():
            return False
        from forwardtacotron_tpu.ops.pallas.cbhg import BANK_HALO, MAX_T
        if t > MAX_T or self.K // 2 > BANK_HALO:
            return False
        # weights stay VMEM-resident per dispatch, so only fronts whose
        # whole weight set fits ONE dispatch fuse by default (the K=8
        # C_in=80 postnet, 4.6 MB). Oversized fronts (K=16 C_in=256
        # prenet, ~24 MB — scoped-VMEM OOM as one dispatch) CAN run as
        # budget-sized branch groups with f32 partial sums
        # (bank_pool_proj_pallas group-split mode, exact, parity-tested)
        # and win in isolation (127.4 vs 131.5 ms whole-CBHG) — but
        # END-TO-END serving measured 31.3k vs 32.1k audio-s/s with the
        # grouped prenet on: the f32 partials' HBM round-trips at the
        # token-rate shape cost more than the fusion saves. Multi-group
        # fronts therefore stay on the XLA path.
        from forwardtacotron_tpu.ops.pallas.cbhg import _front_groups
        if len(_front_groups(tuple(range(1, self.K + 1)), c_in,
                             self.channels, self.proj_channels[0])) > 1:
            return False
        import jax
        from forwardtacotron_tpu.ops.pallas.rnn import interpret_forced
        return jax.default_backend() == 'tpu' or interpret_forced()

    @staticmethod
    def _folded_bn(module):
        """(scale', bias') of an eval BatchNorm: y*scale' + bias'."""
        v = module.variables
        mean = v['batch_stats']['bnorm']['mean'].astype(jnp.float32)
        var = v['batch_stats']['bnorm']['var'].astype(jnp.float32)
        scale = v['params']['bnorm']['scale'].astype(jnp.float32)
        bias = v['params']['bnorm']['bias'].astype(jnp.float32)
        s = jax.lax.rsqrt(var + 1e-5) * scale
        return s, bias - mean * s

    def _front_fused(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        """bank -> ReLU/BN -> pool -> mask -> proj1 -> ReLU/BN, one
        dispatch; the [B, T, K*C] concat never exists (see kernel)."""
        from forwardtacotron_tpu.ops.pallas.cbhg import bank_pool_proj_pallas
        bank_w = tuple(m.variables['params']['conv']['kernel']
                       for m in self.conv1d_bank)
        folded = [self._folded_bn(m) for m in self.conv1d_bank]
        bn_scale = jnp.stack([f[0] for f in folded])
        bn_bias = jnp.stack([f[1] for f in folded])
        proj_w = self.conv_project1.variables['params']['conv']['kernel']
        p_s, p_b = self._folded_bn(self.conv_project1)
        return bank_pool_proj_pallas(
            x, mask, bank_w, bn_scale, bn_bias, proj_w, p_s, p_b,
            ks=tuple(range(1, self.K + 1)))

    def _highways_fusable(self, dtype) -> bool:
        if not self.fuse_highways or self.is_initializing() \
                or not self.highways:
            return False
        if self.channels % 128 != 0:
            return False
        import jax
        from forwardtacotron_tpu.ops.pallas.rnn import interpret_forced
        return jax.default_backend() == 'tpu' or interpret_forced()

    def _highway_params(self):
        w1 = jnp.stack([hw.variables['params']['W1']['kernel']
                        for hw in self.highways])
        b1 = jnp.stack([hw.variables['params']['W1']['bias']
                        for hw in self.highways])
        w2 = jnp.stack([hw.variables['params']['W2']['kernel']
                        for hw in self.highways])
        b2 = jnp.stack([hw.variables['params']['W2']['bias']
                        for hw in self.highways])
        return w1, b1, w2, b2

    def _highways_fused(self, x: jnp.ndarray) -> jnp.ndarray:
        """All highway layers in one Pallas dispatch (pointwise in time, so
        the [B, T, C] activation flattens to rows with no mask logic)."""
        from forwardtacotron_tpu.ops.pallas.highway import highway_stack_pallas
        w1, b1, w2, b2 = self._highway_params()
        b, t, c = x.shape
        y = highway_stack_pallas(x.reshape(b * t, c), w1, b1, w2, b2)
        return y.reshape(b, t, c)

    def _pre_highways_fused(self, a: jnp.ndarray,
                            residual: jnp.ndarray) -> jnp.ndarray:
        """Residual add + pre_highway Dense + highway stack as one kernel
        (all pointwise in time)."""
        from forwardtacotron_tpu.ops.pallas.highway import \
            pre_highway_stack_pallas
        pre_w = self.pre_highway.variables['params']['kernel']
        w1, b1, w2, b2 = self._highway_params()
        b, t, c_in = a.shape
        y = pre_highway_stack_pallas(a.reshape(b * t, c_in),
                                     residual.reshape(b * t, c_in),
                                     pre_w, w1, b1, w2, b2)
        return y.reshape(b, t, self.channels)

    def __call__(self, x: jnp.ndarray, train: bool = False,
                 lengths: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """``lengths`` emulates the reference's exact-length semantics on a
        padded static shape: every convolution input is zeroed beyond the
        item's length (reproducing torch's implicit zero boundary — with
        trained BatchNorm stats a conv output at a padded frame is NOT zero,
        so look-ahead taps must never read one) and the bidirectional GRU
        starts its backward pass at the true last frame. With None the
        reference's padded-batch training behavior is reproduced verbatim."""
        return self.rnn(self.pre_rnn(x, train, lengths), lengths)


# ---------------------------------------------------------------- transformer


def sinusoidal_table(max_len: int, d_model: int) -> np.ndarray:
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float32)
                      * (-math.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


class PositionalEncoding(nn.Module):
    """Sinusoidal PE with a learned scalar scale (reference common_layers.py:127-145).

    The reference precomputes a max_len=5000 buffer and hard-fails beyond
    it; the table here is built at trace time for exactly the sequence
    length seen (same values — sinusoids are deterministic in position),
    so long-form synthesis (16k+ frames) works with identical numerics in
    the shared range. ``max_len`` is kept for parameter-tree parity only.
    """
    d_model: int
    dropout: float = 0.1
    max_len: int = 5000

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        scale = self.param('scale', nn.initializers.ones, (1,))
        pe = jnp.asarray(sinusoidal_table(x.shape[1], self.d_model))
        x = x + scale * pe[None, :, :]
        return nn.Dropout(self.dropout, deterministic=not train)(x)


def attn_blockwise_threshold() -> int:
    """Sequence length at which deterministic self-attention switches to the
    blockwise (flash-style) schedule. FastPitch's post-LR attention is the
    only O(T^2)-in-frames op in the model family (reference
    fast_pitch.py:156); above this many frames the [B, H, T, T] logits
    tensor would dominate memory (16k frames = 1 GiB per head-batch), so
    long-article synthesis uses the O(T) schedule instead. Override with
    FTT_ATTN_BLOCK_T (tests set it low to force the path)."""
    import os
    return int(os.environ.get('FTT_ATTN_BLOCK_T', 2048))


def blockwise_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                        key_pad_mask: Optional[jnp.ndarray],
                        block_q: int = 512,
                        block_k: int = 512) -> jnp.ndarray:
    """Exact softmax attention with O(T) memory: online-softmax (running
    max / denominator) over key blocks, scanned over query blocks — the
    [T, T] score matrix never materializes. Same math as the full path
    (including masked-row -> zeros semantics), so outputs agree to fp
    rounding; no approximation or windowing.

    q, k, v: [B, H, T, D]; key_pad_mask: [B, T] bool, True = padding.
    """
    b, h, t, d = q.shape
    neg = jnp.float32(-1e30)
    scale = 1.0 / math.sqrt(d)
    nq = -(-t // block_q)
    nk = -(-t // block_k)
    in_dtype = q.dtype

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, nq * block_q - t), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, nk * block_k - t), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, nk * block_k - t), (0, 0)))
    if key_pad_mask is None:
        key_pad_mask = jnp.zeros((b, t), bool)
    mp = jnp.pad(key_pad_mask, ((0, 0), (0, nk * block_k - t)),
                 constant_values=True)

    q_blocks = jnp.moveaxis(
        qp.reshape(b, h, nq, block_q, d), 2, 0)           # [nq, B, H, bq, D]
    k_blocks = jnp.moveaxis(
        kp.reshape(b, h, nk, block_k, d), 2, 0)           # [nk, B, H, bk, D]
    v_blocks = jnp.moveaxis(
        vp.reshape(b, h, nk, block_k, d), 2, 0)
    m_blocks = jnp.moveaxis(
        mp.reshape(b, nk, block_k), 1, 0)                 # [nk, B, bk]

    def per_q(_, q_blk):
        def step(carry, inp):
            k_b, v_b, pad_b = inp
            m, l, acc = carry
            s = jnp.einsum('bhqd,bhkd->bhqk', q_blk, k_b,
                           preferred_element_type=jnp.float32) * scale
            s = jnp.where(pad_b[:, None, None, :], neg, s)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1))
            p = jnp.exp(s - m_new[..., None])
            corr = jnp.exp(m - m_new)
            l = l * corr + jnp.sum(p, axis=-1)
            acc = acc * corr[..., None] + jnp.einsum(
                'bhqk,bhkd->bhqd', p.astype(v_b.dtype), v_b,
                preferred_element_type=jnp.float32)
            return (m_new, l, acc), None

        m0 = jnp.full((b, h, block_q), neg, jnp.float32)
        l0 = jnp.zeros((b, h, block_q), jnp.float32)
        acc0 = jnp.zeros((b, h, block_q, d), jnp.float32)
        (m, l, acc), _ = jax.lax.scan(step, (m0, l0, acc0),
                                      (k_blocks, v_blocks, m_blocks))
        out = acc / jnp.maximum(l, 1e-30)[..., None]
        return None, out.astype(in_dtype)

    _, out = jax.lax.scan(per_q, None, q_blocks)          # [nq, B, H, bq, D]
    out = jnp.moveaxis(out, 0, 2).reshape(b, h, nq * block_q, d)[:, :, :t]
    # items whose keys are ALL padding: the full path yields zeros
    # (softmax NaN -> 0); here the masked logits all equal `neg`, so
    # normalize that case to zeros explicitly
    all_masked = jnp.all(key_pad_mask, axis=-1)
    return jnp.where(all_masked[:, None, None, None], 0.0, out)


class MultiHeadAttention(nn.Module):
    """Self-attention with torch ``MultiheadAttention`` parameterization
    (joint in-projection split into q/k/v) and key-padding masking.

    Deterministic (inference) calls at sequence lengths >=
    :func:`attn_blockwise_threshold` take the blockwise schedule — exact
    softmax, O(T) memory — so FastPitch long-article synthesis never
    materializes the [T, T] score matrix (SURVEY §2.7 SP/CP)."""
    d_model: int
    n_heads: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 key_pad_mask: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        b, t, d = x.shape
        h = self.n_heads
        head_dim = d // h

        q = nn.Dense(d, name='q_proj')(x)
        k = nn.Dense(d, name='k_proj')(x)
        v = nn.Dense(d, name='v_proj')(x)

        def split_heads(a):
            return a.reshape(b, t, h, head_dim).transpose(0, 2, 1, 3)

        q, k, v = map(split_heads, (q, k, v))
        if not train and t >= attn_blockwise_threshold():
            # attention-weight dropout is identity when deterministic, so
            # the blockwise path (which has no weights tensor to drop) is
            # exactly equivalent
            out = blockwise_attention(q, k, v, key_pad_mask)
        else:
            logits = jnp.einsum('bhqd,bhkd->bhqk', q, k) / math.sqrt(head_dim)
            if key_pad_mask is not None:  # [B, T] True = padding
                logits = jnp.where(key_pad_mask[:, None, None, :],
                                   -jnp.inf, logits)
            weights = jax.nn.softmax(logits, axis=-1)
            weights = jnp.where(jnp.isnan(weights), 0.0, weights)
            weights = nn.Dropout(self.dropout, deterministic=not train)(weights)
            out = jnp.einsum('bhqk,bhkd->bhqd', weights, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
        return nn.Dense(d, name='out_proj')(out)


class FFTBlock(nn.Module):
    """Post-norm transformer block with conv feed-forward
    (reference common_layers.py:148-185)."""
    d_model: int
    n_heads: int
    d_fft: int
    conv1_kernel: int
    conv2_kernel: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 key_pad_mask: Optional[jnp.ndarray] = None,
                 train: bool = False,
                 conv_zero_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """``conv_zero_mask`` [B, T] zeroes frames before the conv stack so a
        bucket-padded static sequence produces the same conv outputs as the
        reference's exact-length run (convolutions are not masked by the
        attention padding mask; only explicit zeros reproduce torch's
        implicit boundary padding)."""
        attn = MultiHeadAttention(self.d_model, self.n_heads, self.dropout,
                                  name='self_attn')(x, key_pad_mask, train)
        x = x + nn.Dropout(self.dropout, deterministic=not train)(attn)
        x = nn.LayerNorm(name='norm1')(x)

        t = x.shape[1]
        y = x if conv_zero_mask is None else jnp.where(
            conv_zero_mask[:, :, None], 0.0, x)
        y = conv1d(self.d_fft, self.conv1_kernel, name='conv1')(y)[:, :t, :]
        y = jax.nn.relu(y)
        if conv_zero_mask is not None:
            y = jnp.where(conv_zero_mask[:, :, None], 0.0, y)
        y = conv1d(self.d_model, self.conv2_kernel, name='conv2')(y)[:, :t, :]
        x = x + nn.Dropout(self.dropout, deterministic=not train)(y)
        return nn.LayerNorm(name='norm2')(x)


class ForwardTransformer(nn.Module):
    """PE + N FFTBlocks + final LayerNorm (reference common_layers.py:188-223)."""
    d_model: int
    d_fft: int
    layers: int
    heads: int
    conv1_kernel: int
    conv2_kernel: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 key_pad_mask: Optional[jnp.ndarray] = None,
                 train: bool = False,
                 conv_zero_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        x = PositionalEncoding(self.d_model, self.dropout,
                               name='pos_encoder')(x, train)
        for i in range(self.layers):
            x = FFTBlock(self.d_model, self.heads, self.d_fft,
                         self.conv1_kernel, self.conv2_kernel, self.dropout,
                         name=f'layers_{i}')(x, key_pad_mask, train,
                                             conv_zero_mask)
        return nn.LayerNorm(name='norm')(x)


def make_token_pad_mask(x: jnp.ndarray) -> jnp.ndarray:
    """[B, N] int tokens -> [B, N] bool, True at padding (token id 0)."""
    return x == 0


def make_len_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[B] lengths -> [B, max_len] bool, True at positions >= length."""
    return jnp.arange(max_len)[None, :] >= lengths[:, None]
