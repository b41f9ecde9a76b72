"""Fused Pallas TPU kernels for bidirectional recurrent layers (inference).

The XLA `lax.scan` formulation (models/layers.py:_bidir_scan) precomputes the
input projection for the whole sequence — a [T, B, 2, G] tensor that must be
written to and re-read from HBM (4.3 GB for the flagship's frame-rate LSTM at
batch 2048) — and pays while-loop overhead per step. These kernels instead:

  * keep the gate weights (wi/wh/biases) resident in VMEM for the whole
    sequence — they are read from HBM once, not once per step;
  * compute the input projection inside the kernel, so the only HBM traffic
    is reading x once and writing the hidden states once (8x less than the
    materialized-xproj formulation);
  * run time as the innermost (sequential) grid dimension with the hidden
    state carried in VMEM scratch, so Pallas double-buffers the per-step
    input slices against the MXU work automatically;
  * process both directions as a leading batch axis of every GEMM (the input
    is pre-stacked [T, 2, B, I] with the backward direction's sequence
    already flipped), exactly like the XLA path.

Inference-only: there is no VJP (the training path keeps the differentiable
`lax.scan`). Gates accumulate in f32 on the MXU and the nonlinearities run in
f32; the carried state is stored in the input dtype (bf16 end-to-end serving
matches the XLA bf16 path to ~1e-2).

Layout notes: blocks are [1, 2, BB, I] so the last two dims (BB, I) tile
cleanly (sublane multiple of 16 for bf16, lane multiple of 128); H and the
gate width G=3H/4H must be multiples of 128, which holds for the frame-rate
LSTM (H=512), the prenet/postnet GRUs (H=256), and the fused token-level
multi-GRU (H=384). The tiny per-predictor GRUs (H=64) stay on XLA.
"""

from contextlib import contextmanager
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# trace-time switch: Pallas RNN kernels are opt-in. 'on' selects the
# inference kernels (no VJP; models/synthesis.py enables it around its
# jitted serving graphs); 'train' selects the custom-VJP
# cores from ops/pallas/rnn_train.py so the kernels also apply under
# jax.grad (the mixed-precision trainer enables it around its loss
# function). When the surrounding jit is GSPMD-partitioned over a
# data-parallel mesh, the trainer also passes (mesh, data_axis):
# handwritten kernels have no partitioning rules, so the trainable cores
# wrap themselves in a jax.shard_map over that axis (batch split per
# device, weights replicated, weight-gradient psum inserted by shard_map's
# transpose).
_STATE = {'mode': 'off', 'mesh': None, 'data_axis': 'data'}


@contextmanager
def pallas_rnns(mode: str = 'on', mesh=None, data_axis: str = 'data'):
    prev = dict(_STATE)
    _STATE.update(mode=mode, mesh=mesh, data_axis=data_axis)
    try:
        yield
    finally:
        _STATE.update(prev)


def sharding_ctx():
    """(mesh, data_axis) the trainable cores should shard_map over, or
    (None, axis) for single-device dispatch."""
    mesh = _STATE['mesh']
    if mesh is not None and mesh.shape[_STATE['data_axis']] == 1:
        mesh = None
    return mesh, _STATE['data_axis']


def pallas_rnns_enabled() -> bool:
    return _STATE['mode'] in ('on', 'train')


def pallas_rnns_trainable() -> bool:
    return _STATE['mode'] == 'train'


def interpret_forced() -> bool:
    """FTT_PALLAS_INTERPRET=1 runs every Pallas kernel in interpret mode and
    makes them eligible off-TPU — lets CPU tests exercise the exact serving
    dispatch path (model-level fused-kernel integration) instead of only the
    kernels in isolation."""
    import os
    return os.environ.get('FTT_PALLAS_INTERPRET', '0') == '1'


def eligible(dtype, in_dim: int, hidden: int) -> bool:
    """True when the fused kernel supports this shape/dtype and the caller
    opted in. bf16-only: f32 LSTM weights would not fit VMEM."""
    return (pallas_rnns_enabled()
            and dtype == jnp.bfloat16
            and hidden % 128 == 0
            and in_dim % 16 == 0
            and (jax.default_backend() == 'tpu' or interpret_forced()))


def _pick_bb(b: int, cap: int = 256) -> int:
    """Batch tile: largest multiple of 16 dividing the padded batch."""
    for bb in (cap, 128, 64, 32, 16):
        if b % bb == 0:
            return bb
    return 16


def _pad_batch(x, bb):
    b = x.shape[0]
    pad = (-b) % bb
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x, b


# ------------------------------------------------------------------- kernels


def _lstm_kernel(x_ref, wi_ref, wh_ref, b_ref, out_ref, h_scr, c_scr):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[...] = jnp.zeros(h_scr.shape, h_scr.dtype)
        c_scr[...] = jnp.zeros(c_scr.shape, c_scr.dtype)

    x_t = x_ref[0]                                   # [2, BB, I]
    h = h_scr[...]                                   # [2, BB, H]
    dims = (((2,), (1,)), ((0,), (0,)))
    gx = jax.lax.dot_general(x_t, wi_ref[...], dims,
                             preferred_element_type=jnp.float32)
    gh = jax.lax.dot_general(h, wh_ref[...], dims,
                             preferred_element_type=jnp.float32)
    gates = gx + gh + b_ref[...][:, None, :].astype(jnp.float32)

    hd = h_scr.shape[-1]
    i = jax.nn.sigmoid(gates[..., :hd])
    f = jax.nn.sigmoid(gates[..., hd:2 * hd])
    g = jnp.tanh(gates[..., 2 * hd:3 * hd])
    o = jax.nn.sigmoid(gates[..., 3 * hd:])
    c = f * c_scr[...].astype(jnp.float32) + i * g
    h_new = o * jnp.tanh(c)

    h_scr[...] = h_new.astype(h_scr.dtype)
    c_scr[...] = c.astype(c_scr.dtype)
    out_ref[0] = h_new.astype(out_ref.dtype)


def _lstm_mel_kernel(x_ref, wi_ref, wh_ref, b_ref, wm_ref, out_ref,
                     h_scr, c_scr):
    """LSTM step fused with the mel output projection: instead of writing
    the [2, BB, H] hidden states to HBM (the serving trunk only consumes
    them through the mel Dense, reference forward_tacotron.py:154), each
    step writes h_t @ Wmel per direction — [2, BB, MELP] with MELP=128 vs
    H=512, a 4x cut in output traffic, and the standalone mel_linear
    dispatch (plus its [B, T, 2H] re-read) disappears entirely."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[...] = jnp.zeros(h_scr.shape, h_scr.dtype)
        c_scr[...] = jnp.zeros(c_scr.shape, c_scr.dtype)

    x_t = x_ref[0]                                   # [2, BB, I]
    h = h_scr[...]                                   # [2, BB, H]
    dims = (((2,), (1,)), ((0,), (0,)))
    gx = jax.lax.dot_general(x_t, wi_ref[...], dims,
                             preferred_element_type=jnp.float32)
    gh = jax.lax.dot_general(h, wh_ref[...], dims,
                             preferred_element_type=jnp.float32)
    gates = gx + gh + b_ref[...][:, None, :].astype(jnp.float32)

    hd = h_scr.shape[-1]
    i = jax.nn.sigmoid(gates[..., :hd])
    f = jax.nn.sigmoid(gates[..., hd:2 * hd])
    g = jnp.tanh(gates[..., 2 * hd:3 * hd])
    o = jax.nn.sigmoid(gates[..., 3 * hd:])
    c = f * c_scr[...].astype(jnp.float32) + i * g
    h_new = o * jnp.tanh(c)

    h_scr[...] = h_new.astype(h_scr.dtype)
    c_scr[...] = c.astype(c_scr.dtype)
    out_ref[0] = jax.lax.dot_general(
        h_new.astype(wm_ref.dtype), wm_ref[...], dims,
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _gru_kernel(x_ref, wi_ref, wh_ref, bi_ref, bh_ref, out_ref, h_scr):
    # bi_ref/bh_ref arrive pre-tiled to [2, BB, G]: slicing the gates of a
    # (dot + sublane-broadcast bias) crashes Mosaic, a materialized add does
    # not (the LSTM kernel never slices a broadcast sum, so it keeps [2, G])
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[...] = jnp.zeros(h_scr.shape, h_scr.dtype)

    x_t = x_ref[0]
    h = h_scr[...]
    dims = (((2,), (1,)), ((0,), (0,)))
    gx = (jax.lax.dot_general(x_t, wi_ref[...], dims,
                              preferred_element_type=jnp.float32)
          + bi_ref[...].astype(jnp.float32))
    gh = (jax.lax.dot_general(h, wh_ref[...], dims,
                              preferred_element_type=jnp.float32)
          + bh_ref[...].astype(jnp.float32))

    hd = h_scr.shape[-1]
    r = jax.nn.sigmoid(gx[..., :hd] + gh[..., :hd])
    z = jax.nn.sigmoid(gx[..., hd:2 * hd] + gh[..., hd:2 * hd])
    n = jnp.tanh(gx[..., 2 * hd:] + r * gh[..., 2 * hd:])
    h_new = (1.0 - z) * n + z * h.astype(jnp.float32)

    h_scr[...] = h_new.astype(h_scr.dtype)
    out_ref[0] = h_new.astype(out_ref.dtype)


def _gru_xp_kernel(xp_ref, wh_ref, bh_ref, out_ref, h_scr):
    """GRU step from a precomputed input projection (gx = x@wi + bi), used by
    the fused token-level multi-GRU where each sub-GRU has its own input."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[...] = jnp.zeros(h_scr.shape, h_scr.dtype)

    gx = xp_ref[0].astype(jnp.float32)
    h = h_scr[...]
    dims = (((2,), (1,)), ((0,), (0,)))
    gh = (jax.lax.dot_general(h, wh_ref[...], dims,
                              preferred_element_type=jnp.float32)
          + bh_ref[...].astype(jnp.float32))

    hd = h_scr.shape[-1]
    r = jax.nn.sigmoid(gx[..., :hd] + gh[..., :hd])
    z = jax.nn.sigmoid(gx[..., hd:2 * hd] + gh[..., hd:2 * hd])
    n = jnp.tanh(gx[..., 2 * hd:] + r * gh[..., 2 * hd:])
    h_new = (1.0 - z) * n + z * h.astype(jnp.float32)

    h_scr[...] = h_new.astype(h_scr.dtype)
    out_ref[0] = h_new.astype(out_ref.dtype)


# ------------------------------------------------------------------ wrappers


def _stack_time_major(x2):
    """[2, B, T, I] -> [T, 2, B, I] (kernel layout: (BB, I) are the tiled
    minor dims)."""
    return jnp.transpose(x2, (2, 0, 1, 3))


def _run(kernel, inputs, t, b, bb, hidden, dtype, n_state, interpret,
         scratch=None, out_dim=None):
    grid = (b // bb, t)
    x_like = inputs[0]
    if out_dim is None:
        out_dim = hidden
    in_specs = [pl.BlockSpec((1, 2, bb, x_like.shape[-1]),
                             lambda i, j: (j, 0, i, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)
                 for _ in inputs[1:]]
    if scratch is None:
        scratch = [pltpu.VMEM((2, bb, hidden), dtype)
                   for _ in range(n_state)]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 2, bb, out_dim),
                               lambda i, j: (j, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, 2, b, out_dim), dtype),
        scratch_shapes=scratch,
        interpret=interpret or interpret_forced(),
    )(*inputs)


def _unstack(hs, lengths, flip_fn):
    """[T, 2, B, H] -> [B, T, 2H] with the backward half flipped back."""
    fwd = jnp.transpose(hs[:, 0], (1, 0, 2))
    bwd = flip_fn(jnp.transpose(hs[:, 1], (1, 0, 2)), lengths)
    return jnp.concatenate([fwd, bwd], axis=-1)


def bidir_rnn_pallas(x: jnp.ndarray,
                     lengths: Optional[jnp.ndarray],
                     fwd_params: Tuple, bwd_params: Tuple,
                     hidden: int, cell: str,
                     interpret: bool = False) -> jnp.ndarray:
    """Drop-in replacement for models.layers._bidir_scan (inference only).

    x: [B, T, I]; params: (wi [I,G], wh [H,G], bi [G], bh [G]) per direction,
    torch gate order. Returns [B, T, 2*hidden].

    """
    from forwardtacotron_tpu.models.layers import flip_sequences

    dtype = x.dtype
    bb = _pick_bb(x.shape[0])
    x, b_true = _pad_batch(x, bb)
    b, t, _ = x.shape

    lens_p = lengths
    if lengths is not None and x.shape[0] != lengths.shape[0]:
        lens_p = jnp.pad(lengths, (0, x.shape[0] - lengths.shape[0]),
                         constant_values=1)
    x2 = _stack_time_major(
        jnp.stack([x, flip_sequences(x, lens_p)], axis=0))
    x2 = jax.lax.optimization_barrier(x2)

    wi = jnp.stack([fwd_params[0], bwd_params[0]]).astype(dtype)
    wh = jnp.stack([fwd_params[1], bwd_params[1]]).astype(dtype)
    bi = jnp.stack([fwd_params[2], bwd_params[2]]).astype(dtype)
    bh = jnp.stack([fwd_params[3], bwd_params[3]]).astype(dtype)

    if cell == 'lstm':
        hs = _run(_lstm_kernel, (x2, wi, wh, bi + bh), t, b, bb, hidden,
                  dtype, 2, interpret)
    else:
        bi_t = jnp.broadcast_to(bi[:, None, :], (2, bb) + bi.shape[1:])
        bh_t = jnp.broadcast_to(bh[:, None, :], (2, bb) + bh.shape[1:])
        hs = _run(_gru_kernel, (x2, wi, wh, bi_t, bh_t), t, b, bb, hidden,
                  dtype, 1, interpret)
    out = _unstack(hs, lens_p, flip_sequences)
    return out[:b_true]


def bidir_rnn_pallas_sharded(x: jnp.ndarray,
                             lengths: Optional[jnp.ndarray],
                             fwd_params: Tuple, bwd_params: Tuple,
                             hidden: int, cell: str,
                             interpret: bool = False,
                             mesh=None, data_axis: str = 'data'):
    """bidir_rnn_pallas, shard_mapped over the data-parallel mesh axis when
    one is active (pallas_rnns(..., mesh=...)) — the serving twin of
    rnn_train.bidir_rnn_trainable_sharded.

    Handwritten Pallas kernels carry no GSPMD partitioning rules, so inside
    a mesh-partitioned serving jit they must be explicitly placed: batch
    (and lengths) split over ``data_axis``, weights replicated. This is what
    keeps data-parallel serving on the fused kernels instead of silently
    falling back to the XLA scan."""
    if mesh is None:
        mesh, data_axis = sharding_ctx()
    if mesh is None:
        return bidir_rnn_pallas(x, lengths, fwd_params, bwd_params, hidden,
                                cell, interpret)

    P = jax.sharding.PartitionSpec
    rep = jax.tree.map(lambda _: P(), (fwd_params, bwd_params))

    if lengths is None:
        def body(x, fwd, bwd):
            return bidir_rnn_pallas(x, None, fwd, bwd, hidden, cell,
                                    interpret)
        fn = jax.shard_map(body, mesh=mesh,
                           in_specs=(P(data_axis),) + rep,
                           out_specs=P(data_axis), check_vma=False)
        return fn(x, fwd_params, bwd_params)

    def body(x, lengths, fwd, bwd):
        return bidir_rnn_pallas(x, lengths, fwd, bwd, hidden, cell,
                                interpret)
    fn = jax.shard_map(body, mesh=mesh,
                       in_specs=(P(data_axis), P(data_axis)) + rep,
                       out_specs=P(data_axis), check_vma=False)
    return fn(x, lengths, fwd_params, bwd_params)


def gru_from_xp_pallas(xp_f: jnp.ndarray, xp_b: jnp.ndarray,
                       wh: jnp.ndarray, bh: jnp.ndarray,
                       hidden: int,
                       interpret: bool = False) -> jnp.ndarray:
    """Fused-scan GRU from precomputed per-direction input projections.

    xp_f/xp_b: [B, T, G] (= x @ wi + bi, backward already flipped);
    wh: [2, H, G]; bh: [2, G]. Returns [T, 2, B, H] hidden states (caller
    flips/concats — multi_bigru needs per-sub-GRU slices first).
    """
    dtype = xp_f.dtype
    bb = _pick_bb(xp_f.shape[0])
    xp_f, b_true = _pad_batch(xp_f, bb)
    xp_b, _ = _pad_batch(xp_b, bb)
    b, t, _ = xp_f.shape

    xp2 = _stack_time_major(jnp.stack([xp_f, xp_b], axis=0))
    xp2 = jax.lax.optimization_barrier(xp2)
    bh_t = jnp.broadcast_to(bh[:, None, :].astype(dtype),
                            (2, bb) + bh.shape[1:])
    hs = _run(_gru_xp_kernel, (xp2, wh.astype(dtype), bh_t),
              t, b, bb, hidden, dtype, 1, interpret)
    return hs, b_true


def lstm_lr_mel_pallas(x_tok: jnp.ndarray, dur: jnp.ndarray,
                       fwd_params: Tuple, bwd_params: Tuple, hidden: int,
                       w_mel: jnp.ndarray, b_mel: jnp.ndarray,
                       max_len: int,
                       interpret: bool = False) -> jnp.ndarray:
    """Fused frame-rate serving trunk: LR + bi-LSTM + mel projection.

    x_tok: [B, N, C] token-rate activations (post prenet + pitch/energy
    projections); dur: [B, N] float durations; w_mel: [2H, M] / b_mel: [M]
    the mel Dense. Returns [B, max_len, M] = lin(bilstm(expand(x_tok, dur)))
    — the reference's LR -> pack_padded bi-LSTM -> Linear chain
    (reference forward_tacotron.py:145-154) as two Pallas kernels:

      1. the bidirectional LR writes the expanded activations straight in
         the LSTM kernel's [T, 2, B, C] layout (forward + per-item flipped)
         — the [B, T, C] expansion plus its stack/flip/transpose round
         trips never exist in HBM;
      2. the LSTM kernel applies the mel Dense per step in its output
         stage, so the [T, 2, B, H] hidden states never hit HBM either —
         only [T, 2, B, 128] mel partials do (fwd/bwd halves), combined
         with one flip-add outside.

    Inference-only (no VJP); numerics match the XLA path to bf16 rounding.
    """
    from forwardtacotron_tpu.models.layers import flip_sequences
    from forwardtacotron_tpu.ops.length_regulator import duration_spans
    from forwardtacotron_tpu.ops.pallas.length_regulator import \
        length_regulator_bidir_pallas

    from forwardtacotron_tpu.ops.pallas.length_regulator import LRB_T_TILE

    dtype = x_tok.dtype
    bb = _pick_bb(x_tok.shape[0])
    x_tok, b_true = _pad_batch(x_tok, bb)
    dur, _ = _pad_batch(dur, bb)
    b, n, c = x_tok.shape
    starts, ends = duration_spans(dur)

    # pad T to the LR kernel's time tile (serving buckets can be any
    # multiple of the 32-frame routing granularity); the <= LRB_T_TILE-1
    # extra LSTM steps run on zero frames and are cropped below
    t_run = -(-max_len // LRB_T_TILE) * LRB_T_TILE

    x2 = length_regulator_bidir_pallas(x_tok, starts, ends, t_run,
                                       interpret)
    x2 = jax.lax.optimization_barrier(x2)

    wi = jnp.stack([fwd_params[0], bwd_params[0]]).astype(dtype)
    wh = jnp.stack([fwd_params[1], bwd_params[1]]).astype(dtype)
    bias = jnp.stack([fwd_params[2] + fwd_params[3],
                      bwd_params[2] + bwd_params[3]]).astype(dtype)

    m = w_mel.shape[-1]
    mp = -(-m // 128) * 128
    wm = jnp.stack([w_mel[:hidden], w_mel[hidden:]]).astype(dtype)
    wm = jnp.pad(wm, ((0, 0), (0, 0), (0, mp - m)))

    parts = _run(_lstm_mel_kernel, (x2, wi, wh, bias, wm), t_run, b, bb,
                 hidden, dtype, 2, interpret, out_dim=mp)
    fwd = jnp.transpose(parts[:, 0], (1, 0, 2))[..., :m]
    bwd = jnp.transpose(parts[:, 1], (1, 0, 2))[..., :m]
    lengths = ends[:, -1]
    mel = fwd + flip_sequences(bwd, lengths) + b_mel.astype(dtype)
    return mel[:b_true, :max_len]


def lstm_lr_mel_sharded(x_tok: jnp.ndarray, dur: jnp.ndarray,
                        fwd_params: Tuple, bwd_params: Tuple, hidden: int,
                        w_mel: jnp.ndarray, b_mel: jnp.ndarray,
                        max_len: int,
                        interpret: bool = False,
                        mesh=None, data_axis: str = 'data') -> jnp.ndarray:
    """lstm_lr_mel_pallas, shard_mapped over the data axis when a mesh is
    active (see bidir_rnn_pallas_sharded)."""
    if mesh is None:
        mesh, data_axis = sharding_ctx()
    if mesh is None:
        return lstm_lr_mel_pallas(x_tok, dur, fwd_params, bwd_params,
                                  hidden, w_mel, b_mel, max_len, interpret)

    P = jax.sharding.PartitionSpec
    rep = jax.tree.map(lambda _: P(),
                       (fwd_params, bwd_params, w_mel, b_mel))

    def body(x_tok, dur, fwd, bwd, w_mel, b_mel):
        return lstm_lr_mel_pallas(x_tok, dur, fwd, bwd, hidden,
                                  w_mel, b_mel, max_len, interpret)

    fn = jax.shard_map(body, mesh=mesh,
                       in_specs=(P(data_axis), P(data_axis)) + rep,
                       out_specs=P(data_axis), check_vma=False)
    return fn(x_tok, dur, fwd_params, bwd_params, w_mel, b_mel)


def gru_from_xp_pallas_sharded(xp_f: jnp.ndarray, xp_b: jnp.ndarray,
                               wh: jnp.ndarray, bh: jnp.ndarray,
                               hidden: int,
                               interpret: bool = False,
                               mesh=None, data_axis: str = 'data'):
    """gru_from_xp_pallas, shard_mapped over the data axis when a mesh is
    active (see bidir_rnn_pallas_sharded). Returns [T, 2, B, H] hidden
    states with the batch already cropped to its true size (unlike the
    unsharded function, which returns (hs, b_true) — a Python int cannot
    cross a shard_map boundary, so the crop happens inside the body)."""
    if mesh is None:
        mesh, data_axis = sharding_ctx()
    if mesh is None:
        hs, b_true = gru_from_xp_pallas(xp_f, xp_b, wh, bh, hidden,
                                        interpret)
        return hs[:, :, :b_true]

    P = jax.sharding.PartitionSpec

    def body(xp_f, xp_b, wh, bh):
        hs, b_true = gru_from_xp_pallas(xp_f, xp_b, wh, bh, hidden,
                                        interpret)
        return hs[:, :, :b_true]

    fn = jax.shard_map(body, mesh=mesh,
                       in_specs=(P(data_axis), P(data_axis), P(), P()),
                       out_specs=P(None, None, data_axis, None),
                       check_vma=False)
    return fn(xp_f, xp_b, wh, bh)
