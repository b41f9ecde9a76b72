"""Differentiable fused Pallas TPU RNN cores (training path).

The inference kernels in ops/pallas/rnn.py have no VJP, so training falls
back to the `lax.scan` formulation — which materializes the whole input
projection in HBM and pays while-loop overhead per step, twice (forward and
reverse-mode sweep). These cores make the fused kernels differentiable:

  * **forward**: the same VMEM-resident-weights kernel shape as inference
    (in-kernel input projection, time as the sequential grid dim, state in
    VMEM scratch); the LSTM forward additionally writes the cell-state
    sequence, the backward sweep's only extra residual.
  * **backward**: a time-reversed Pallas kernel that carries dh (and dc) in
    VMEM scratch, *recomputes* the per-step gates from the saved hidden
    states (cheaper than storing [T, 2, B, G] activations), and emits only
    the per-step pre-activation gradients `dgates` to HBM.
  * the large, parallel weight/input gradient contractions
    (dx = dgates @ Wi^T, dWi = x^T dgates, dWh = h_prev^T dgates) run
    OUTSIDE the kernel as single XLA GEMMs over the whole [T*2*B] axis —
    that work is MXU-shaped and needs no sequential carry, so handing it to
    the compiler beats accumulating f32 weight gradients in VMEM scratch
    (which would not fit for the H=512 LSTM anyway).

Numerics: gates compute in f32 on the MXU exactly like the forward kernel;
`dgates` are stored in the compute dtype; weight gradients accumulate in f32
(`preferred_element_type`). Layout/eligibility constraints are those of
ops/pallas/rnn.py (H multiple of 128, padded batch multiple of 16, bf16 on
real TPUs).

Reference parity note: the recurrences themselves follow torch gate order
(GRU r,z,n / LSTM i,f,g,o) like models/layers.py, so these cores are a
drop-in for `_bidir_scan` (reference models/forward_tacotron.py:147-152
uses nn.LSTM/nn.GRU; this is the TPU-native training equivalent).
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from forwardtacotron_tpu.ops.pallas.rnn import (_gru_kernel, _pick_bb,
                                                _lstm_kernel)

# Train-path batch-tile cap: the trainable cores stream an extra
# cell-state output and carry f32 state scratch, so a 256-item tile at
# H=512 (gate width 2048) needs 21 MB of scoped VMEM (limit 16 MB,
# measured at bs=256 bf16). 128 fits every shape that reaches this path.
_TRAIN_BB_CAP = 128

# ------------------------------------------------------------ forward kernels


def _lstm_kernel_train(x_ref, wi_ref, wh_ref, b_ref, out_ref, c_out_ref,
                       h_scr, c_scr):
    """Forward LSTM step that also writes the cell-state sequence (the
    backward sweep needs c_{t-1} and c_t; everything else is recomputed)."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[...] = jnp.zeros(h_scr.shape, h_scr.dtype)
        c_scr[...] = jnp.zeros(c_scr.shape, c_scr.dtype)

    x_t = x_ref[0]
    h = h_scr[...]
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
    c_out_ref[0] = c.astype(c_out_ref.dtype)


# ----------------------------------------------------------- backward kernels


def _gru_bwd_kernel(dh_out_ref, hs_prev_ref, x_ref, wi_ref, wh_ref,
                    bi_ref, bh_ref, dgx_ref, dgh_ref, dh_scr):
    """Reverse-time GRU step: grid index j visits t = T-1-j (the index maps
    handle the reversal); carries dL/dh_{t-1} in scratch, recomputes the
    gates, writes pre-activation grads for the x-projection (dgx) and the
    h-projection (dgh) — they differ in the n gate (n = tanh(gx_n + r*gh_n)).
    """
    j = pl.program_id(1)
    t_total = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        dh_scr[...] = jnp.zeros(dh_scr.shape, dh_scr.dtype)

    is_first_step = j == t_total - 1  # t == 0: h_{t-1} is the zero state
    h_prev = jnp.where(is_first_step, 0.0,
                       hs_prev_ref[0].astype(jnp.float32))

    x_t = x_ref[0]
    dims = (((2,), (1,)), ((0,), (0,)))
    gx = (jax.lax.dot_general(x_t, wi_ref[...], dims,
                              preferred_element_type=jnp.float32)
          + bi_ref[...].astype(jnp.float32))
    gh = (jax.lax.dot_general(h_prev.astype(x_t.dtype), wh_ref[...], dims,
                              preferred_element_type=jnp.float32)
          + bh_ref[...].astype(jnp.float32))

    hd = dh_scr.shape[-1]
    r = jax.nn.sigmoid(gx[..., :hd] + gh[..., :hd])
    z = jax.nn.sigmoid(gx[..., hd:2 * hd] + gh[..., hd:2 * hd])
    ghn = gh[..., 2 * hd:]
    n = jnp.tanh(gx[..., 2 * hd:] + r * ghn)

    dh_total = dh_out_ref[0].astype(jnp.float32) + dh_scr[...]

    dz = dh_total * (h_prev - n)
    dn = dh_total * (1.0 - z)
    dgn = dn * (1.0 - n * n)
    dr = dgn * ghn
    dghn = dgn * r
    dgr = dr * r * (1.0 - r)
    dgz = dz * z * (1.0 - z)

    dgx = jnp.concatenate([dgr, dgz, dgn], axis=-1)
    dgh = jnp.concatenate([dgr, dgz, dghn], axis=-1)

    # dh_{t-1} = z * dh_t + dgh @ Wh^T   (contract the gate axis)
    dims_t = (((2,), (2,)), ((0,), (0,)))
    dh_prev = dh_total * z + jax.lax.dot_general(
        dgh.astype(x_t.dtype), wh_ref[...], dims_t,
        preferred_element_type=jnp.float32)

    dh_scr[...] = dh_prev
    dgx_ref[0] = dgx.astype(dgx_ref.dtype)
    dgh_ref[0] = dgh.astype(dgh_ref.dtype)


def _lstm_bwd_kernel(dh_out_ref, hs_prev_ref, cs_ref, cs_prev_ref, x_ref,
                     wi_ref, wh_ref, b_ref, dgates_ref, dh_scr, dc_scr):
    """Reverse-time LSTM step. Gates recompute from (x_t, h_{t-1}); cell
    states come from the forward pass's saved sequence. gx and gh share one
    pre-activation, so a single dgates output serves both contractions."""
    j = pl.program_id(1)
    t_total = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        dh_scr[...] = jnp.zeros(dh_scr.shape, dh_scr.dtype)
        dc_scr[...] = jnp.zeros(dc_scr.shape, dc_scr.dtype)

    is_first_step = j == t_total - 1  # t == 0
    h_prev = jnp.where(is_first_step, 0.0,
                       hs_prev_ref[0].astype(jnp.float32))
    c_prev = jnp.where(is_first_step, 0.0,
                       cs_prev_ref[0].astype(jnp.float32))
    c_t = cs_ref[0].astype(jnp.float32)

    x_t = x_ref[0]
    dims = (((2,), (1,)), ((0,), (0,)))
    gx = jax.lax.dot_general(x_t, wi_ref[...], dims,
                             preferred_element_type=jnp.float32)
    gh = jax.lax.dot_general(h_prev.astype(x_t.dtype), wh_ref[...], dims,
                             preferred_element_type=jnp.float32)
    gates = gx + gh + b_ref[...][:, None, :].astype(jnp.float32)

    hd = dh_scr.shape[-1]
    i = jax.nn.sigmoid(gates[..., :hd])
    f = jax.nn.sigmoid(gates[..., hd:2 * hd])
    g = jnp.tanh(gates[..., 2 * hd:3 * hd])
    o = jax.nn.sigmoid(gates[..., 3 * hd:])
    tc = jnp.tanh(c_t)

    dh_total = dh_out_ref[0].astype(jnp.float32) + dh_scr[...]
    do = dh_total * tc
    dc_total = dh_total * o * (1.0 - tc * tc) + dc_scr[...]

    di = dc_total * g
    df = dc_total * c_prev
    dg = dc_total * i

    dgi = di * i * (1.0 - i)
    dgf = df * f * (1.0 - f)
    dgg = dg * (1.0 - g * g)
    dgo = do * o * (1.0 - o)
    dgates = jnp.concatenate([dgi, dgf, dgg, dgo], axis=-1)

    dims_t = (((2,), (2,)), ((0,), (0,)))
    dh_prev = jax.lax.dot_general(dgates.astype(x_t.dtype), wh_ref[...],
                                  dims_t, preferred_element_type=jnp.float32)

    dh_scr[...] = dh_prev
    dc_scr[...] = dc_total * f
    dgates_ref[0] = dgates.astype(dgates_ref.dtype)


# ------------------------------------------------------------- pallas drivers


def _seq_spec(bb, width, t, reverse, shift=0):
    """BlockSpec for a [T, 2, B, width] tensor walked along time; ``reverse``
    walks t = T-1-j, ``shift`` reads position t-shift (clamped to 0 — the
    kernel masks the t==0 read)."""
    if reverse:
        def index_map(i, j):
            tt = t - 1 - j - shift
            return (jnp.maximum(tt, 0), 0, i, 0)
    else:
        def index_map(i, j):
            return (j, 0, i, 0)
    return pl.BlockSpec((1, 2, bb, width), index_map,
                        memory_space=pltpu.VMEM)


def _full_spec():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _gru_fwd_call(x2, wi, wh, bi, bh, hidden, bb, interpret):
    t, _, b, _ = x2.shape
    dtype = x2.dtype
    bi_t = jnp.broadcast_to(bi[:, None, :], (2, bb) + bi.shape[1:])
    bh_t = jnp.broadcast_to(bh[:, None, :], (2, bb) + bh.shape[1:])
    return pl.pallas_call(
        _gru_kernel,
        grid=(b // bb, t),
        in_specs=[_seq_spec(bb, x2.shape[-1], t, False),
                  _full_spec(), _full_spec(), _full_spec(), _full_spec()],
        out_specs=_seq_spec(bb, hidden, t, False),
        out_shape=jax.ShapeDtypeStruct((t, 2, b, hidden), dtype),
        scratch_shapes=[pltpu.VMEM((2, bb, hidden), dtype)],
        interpret=interpret,
    )(x2, wi, wh, bi_t, bh_t)


def _lstm_fwd_call(x2, wi, wh, b_sum, hidden, bb, interpret,
                   with_cell: bool):
    t, _, b, _ = x2.shape
    dtype = x2.dtype
    common = dict(
        grid=(b // bb, t),
        in_specs=[_seq_spec(bb, x2.shape[-1], t, False),
                  _full_spec(), _full_spec(), _full_spec()],
        interpret=interpret,
    )
    if not with_cell:
        return pl.pallas_call(
            _lstm_kernel,
            out_specs=_seq_spec(bb, hidden, t, False),
            out_shape=jax.ShapeDtypeStruct((t, 2, b, hidden), dtype),
            scratch_shapes=[pltpu.VMEM((2, bb, hidden), dtype)] * 2,
            **common)(x2, wi, wh, b_sum)
    return pl.pallas_call(
        _lstm_kernel_train,
        out_specs=[_seq_spec(bb, hidden, t, False)] * 2,
        out_shape=[jax.ShapeDtypeStruct((t, 2, b, hidden), dtype)] * 2,
        scratch_shapes=[pltpu.VMEM((2, bb, hidden), dtype)] * 2,
        **common)(x2, wi, wh, b_sum)


# -------------------------------------------------------- custom-VJP cores


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def gru_core(x2, wi, wh, bi, bh, hidden: int, interpret: bool = False):
    """Bidirectional-as-batch GRU over pre-stacked input x2 [T, 2, B, I]
    (backward direction pre-flipped). Returns hidden states [T, 2, B, H]."""
    bb = _pick_bb(x2.shape[2], cap=_TRAIN_BB_CAP)
    return _gru_fwd_call(x2, wi, wh, bi, bh, hidden, bb, interpret)


def _gru_core_fwd(x2, wi, wh, bi, bh, hidden, interpret):
    hs = gru_core(x2, wi, wh, bi, bh, hidden, interpret)
    return hs, (x2, wi, wh, bi, bh, hs)


def _gru_core_bwd(hidden, interpret, res, dhs):
    x2, wi, wh, bi, bh, hs = res
    t, _, b, in_dim = x2.shape
    bb = _pick_bb(b, cap=_TRAIN_BB_CAP)
    dtype = x2.dtype
    g = 3 * hidden

    bi_t = jnp.broadcast_to(bi[:, None, :], (2, bb, g))
    bh_t = jnp.broadcast_to(bh[:, None, :], (2, bb, g))
    dgx, dgh = pl.pallas_call(
        _gru_bwd_kernel,
        grid=(b // bb, t),
        in_specs=[_seq_spec(bb, hidden, t, True),        # dhs at t
                  _seq_spec(bb, hidden, t, True, 1),     # hs at t-1
                  _seq_spec(bb, in_dim, t, True),        # x at t
                  _full_spec(), _full_spec(), _full_spec(), _full_spec()],
        out_specs=[_seq_spec(bb, g, t, True)] * 2,
        out_shape=[jax.ShapeDtypeStruct((t, 2, b, g), dtype)] * 2,
        scratch_shapes=[pltpu.VMEM((2, bb, hidden), jnp.float32)],
        interpret=interpret,
    )(dhs.astype(dtype), hs, x2, wi, wh, bi_t, bh_t)

    h_prev = jnp.concatenate([jnp.zeros_like(hs[:1]), hs[:-1]], axis=0)
    f32 = jnp.float32
    # big parallel contractions over the T*B axis — XLA/MXU territory
    dx2 = jnp.einsum('tdbg,dig->tdbi', dgx, wi,
                     preferred_element_type=f32).astype(dtype)
    dwi = jnp.einsum('tdbi,tdbg->dig', x2, dgx,
                     preferred_element_type=f32).astype(wi.dtype)
    dwh = jnp.einsum('tdbh,tdbg->dhg', h_prev, dgh,
                     preferred_element_type=f32).astype(wh.dtype)
    dbi = jnp.sum(dgx.astype(f32), axis=(0, 2)).astype(bi.dtype)
    dbh = jnp.sum(dgh.astype(f32), axis=(0, 2)).astype(bh.dtype)
    return dx2, dwi, dwh, dbi, dbh


gru_core.defvjp(_gru_core_fwd, _gru_core_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def lstm_core(x2, wi, wh, b_sum, hidden: int, interpret: bool = False):
    """Bidirectional-as-batch LSTM over x2 [T, 2, B, I]; ``b_sum`` is the
    combined bias (bi + bh). Returns hidden states [T, 2, B, H]."""
    bb = _pick_bb(x2.shape[2], cap=_TRAIN_BB_CAP)
    return _lstm_fwd_call(x2, wi, wh, b_sum, hidden, bb, interpret,
                          with_cell=False)


def _lstm_core_fwd(x2, wi, wh, b_sum, hidden, interpret):
    bb = _pick_bb(x2.shape[2], cap=_TRAIN_BB_CAP)
    hs, cs = _lstm_fwd_call(x2, wi, wh, b_sum, hidden, bb, interpret,
                            with_cell=True)
    return hs, (x2, wi, wh, b_sum, hs, cs)


def _lstm_core_bwd(hidden, interpret, res, dhs):
    x2, wi, wh, b_sum, hs, cs = res
    t, _, b, in_dim = x2.shape
    bb = _pick_bb(b, cap=_TRAIN_BB_CAP)
    dtype = x2.dtype
    g = 4 * hidden

    dgates = pl.pallas_call(
        _lstm_bwd_kernel,
        grid=(b // bb, t),
        in_specs=[_seq_spec(bb, hidden, t, True),        # dhs at t
                  _seq_spec(bb, hidden, t, True, 1),     # hs at t-1
                  _seq_spec(bb, hidden, t, True),        # cs at t
                  _seq_spec(bb, hidden, t, True, 1),     # cs at t-1
                  _seq_spec(bb, in_dim, t, True),        # x at t
                  _full_spec(), _full_spec(), _full_spec()],
        out_specs=_seq_spec(bb, g, t, True),
        out_shape=jax.ShapeDtypeStruct((t, 2, b, g), dtype),
        scratch_shapes=[pltpu.VMEM((2, bb, hidden), jnp.float32)] * 2,
        interpret=interpret,
    )(dhs.astype(dtype), hs, cs, cs, x2, wi, wh, b_sum)

    h_prev = jnp.concatenate([jnp.zeros_like(hs[:1]), hs[:-1]], axis=0)
    f32 = jnp.float32
    dx2 = jnp.einsum('tdbg,dig->tdbi', dgates, wi,
                     preferred_element_type=f32).astype(dtype)
    dwi = jnp.einsum('tdbi,tdbg->dig', x2, dgates,
                     preferred_element_type=f32).astype(wi.dtype)
    dwh = jnp.einsum('tdbh,tdbg->dhg', h_prev, dgates,
                     preferred_element_type=f32).astype(wh.dtype)
    db = jnp.sum(dgates.astype(f32), axis=(0, 2)).astype(b_sum.dtype)
    return dx2, dwi, dwh, db


lstm_core.defvjp(_lstm_core_fwd, _lstm_core_bwd)


# --------------------------------------------------------------- entry point


def bidir_rnn_trainable(x: jnp.ndarray, lengths, fwd_params: Tuple,
                        bwd_params: Tuple, hidden: int, cell: str,
                        interpret: bool = False) -> jnp.ndarray:
    """Differentiable fused bidirectional RNN: same contract as
    ops.pallas.rnn.bidir_rnn_pallas, but with a custom VJP so it can run
    inside `jax.grad` (the mixed-precision training path). All glue
    (flips, stacking, padding) stays in differentiable JAX ops; only the
    sequential cores are Pallas."""
    from forwardtacotron_tpu.models.layers import flip_sequences
    from forwardtacotron_tpu.ops.pallas.rnn import _pad_batch

    dtype = x.dtype
    bb = _pick_bb(x.shape[0], cap=_TRAIN_BB_CAP)
    x, b_true = _pad_batch(x, bb)

    lens_p = lengths
    if lengths is not None and x.shape[0] != lengths.shape[0]:
        lens_p = jnp.pad(lengths, (0, x.shape[0] - lengths.shape[0]),
                         constant_values=1)
    x2 = jnp.stack([x, flip_sequences(x, lens_p)], axis=0)
    x2 = jnp.transpose(x2, (2, 0, 1, 3))                 # [T, 2, B, I]

    wi = jnp.stack([fwd_params[0], bwd_params[0]]).astype(dtype)
    wh = jnp.stack([fwd_params[1], bwd_params[1]]).astype(dtype)
    bi = jnp.stack([fwd_params[2], bwd_params[2]]).astype(dtype)
    bh = jnp.stack([fwd_params[3], bwd_params[3]]).astype(dtype)

    if cell == 'lstm':
        hs = lstm_core(x2, wi, wh, bi + bh, hidden, interpret)
    else:
        hs = gru_core(x2, wi, wh, bi, bh, hidden, interpret)

    fwd_out = jnp.transpose(hs[:, 0], (1, 0, 2))
    bwd_out = flip_sequences(jnp.transpose(hs[:, 1], (1, 0, 2)), lens_p)
    out = jnp.concatenate([fwd_out, bwd_out], axis=-1)
    return out[:b_true]


def bidir_rnn_trainable_sharded(x, lengths, fwd_params: Tuple,
                                bwd_params: Tuple, hidden: int, cell: str,
                                interpret: bool = False,
                                mesh=None, data_axis: str = 'data'):
    """bidir_rnn_trainable, shard_mapped over the data-parallel mesh axis
    when one is active (ops.pallas.rnn.pallas_rnns(..., mesh=...)).

    Handwritten Pallas kernels carry no GSPMD partitioning rules, so inside
    a pjit'd train step they must be explicitly placed: batch (and lengths)
    split over ``data_axis``, weights replicated. shard_map's transpose
    inserts the psum over the data axis for the weight gradients, which is
    exactly the DP grad all-reduce the scan formulation gets from GSPMD."""
    if mesh is None:
        from forwardtacotron_tpu.ops.pallas.rnn import sharding_ctx
        mesh, data_axis = sharding_ctx()
    if mesh is None:
        return bidir_rnn_trainable(x, lengths, fwd_params, bwd_params,
                                   hidden, cell, interpret)

    P = jax.sharding.PartitionSpec
    rep = jax.tree.map(lambda _: P(), (fwd_params, bwd_params))

    if lengths is None:
        def body(x, fwd, bwd):
            return bidir_rnn_trainable(x, None, fwd, bwd, hidden, cell,
                                       interpret)
        fn = jax.shard_map(body, mesh=mesh,
                           in_specs=(P(data_axis),) + rep,
                           out_specs=P(data_axis), check_vma=False)
        return fn(x, fwd_params, bwd_params)

    def body(x, lengths, fwd, bwd):
        return bidir_rnn_trainable(x, lengths, fwd, bwd, hidden, cell,
                                   interpret)
    fn = jax.shard_map(body, mesh=mesh,
                       in_specs=(P(data_axis), P(data_axis)) + rep,
                       out_specs=P(data_axis), check_vma=False)
    return fn(x, lengths, fwd_params, bwd_params)
