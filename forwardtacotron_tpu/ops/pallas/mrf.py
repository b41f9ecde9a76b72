"""Fused Pallas kernel for HiFi-GAN's MRF (multi-receptive-field) stack.

One upsample level of the generator runs, per kernel-size kr in (3,7,11),
three sequential residual units (leaky -> dilated conv kr,d -> leaky ->
conv kr,1 -> add), then averages the kr-branches (models/vocoder.py
ResBlock1 / HiFiGANGenerator.__call__). As separate XLA convs that is 18
conv dispatches, each reading+writing the [B, T, C] activation from HBM —
measured on v5e the ch<=64 levels run 2.5-3x off their bytes-bound
roofline, and worse, [B, T, 32] bf16 tensors waste 3/4 of every 128-lane
memory tile (scripts/bench_vocoder_stages.py).

This kernel computes the WHOLE MRF level per time tile with activations
resident in VMEM — HBM traffic drops from 36 tensor passes to ~2.25 — and
lays activations out as [C, T] (channels = GEMM M/stream dim, time =
lanes) so every conv is one GEMM W[C_out, kr*C_in] @ im2col[kr*C_in, T]
with K and N both full MXU tiles even at C=32 (a [T, C] layout would cap
MXU utilization at C/128).

Sequence-boundary semantics: every conv zero-pads at the true sequence
ends (torch Conv1d padding). Tiles carry a halo of real neighbor values;
positions outside [0, T) are re-zeroed before every conv so halo garbage
(bias offsets at out-of-range positions) never leaks in.
"""

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LRELU_SLOPE = 0.1
HALO = 64        # >= accumulated conv span of the deepest branch (kr=11: 60)
MAX_SHIFT = 32   # >= max single-conv tap offset ((11//2)*5 = 25), 8-aligned


def _leaky(x):
    # max(x, s*x) == leaky_relu for 0 < s < 1, without the bf16 vector
    # compare Mosaic does not support
    return jnp.maximum(x, LRELU_SLOPE * x)


def pack_conv_weight(kernel: jnp.ndarray) -> jnp.ndarray:
    """flax Conv kernel [k, C_in, C_out] -> [C_out, k*C_in] with im2col
    row order j-major (row = j*C_in + c_in)."""
    k, cin, cout = kernel.shape
    return jnp.transpose(kernel, (2, 0, 1)).reshape(cout, k * cin)


def _mrf_kernel(x_ref, mask_ref, *rest, krs, dils, t_tile, im2col):
    """One (batch item, time tile). x_ref [1, 1, C, T_w]; mask_ref
    [1, 1, 1, T_w] (1.0 at global positions in [0, T)); rest = per-kr
    (w1 [U, C, kr*C], b1 [U, C, 1], w2, b2) ..., then an optional VMEM
    scratch (when ``im2col``), then out_ref [1, 1, C, t_tile]."""
    if im2col:  # pallas arg order: inputs..., outputs..., scratches
        *wb, out_ref, scratch_ref = rest
    else:
        *wb, out_ref = rest
    c = x_ref.shape[2]
    t_w = x_ref.shape[3]
    x = x_ref[0, 0]
    mask = mask_ref[0, 0]

    def conv_taps(a_ext, w, kr, dil):
        # per-tap GEMM accumulation: y = sum_j W_j @ a[:, t+shift_j]
        acc = None
        for j in range(kr):
            sh = MAX_SHIFT + (j - kr // 2) * dil
            y_j = jax.lax.dot_general(
                w[:, j * c:(j + 1) * c], a_ext[:, sh:sh + t_w],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = y_j if acc is None else acc + y_j
        return acc

    def conv_im2col(a_ext, w, kr, dil):
        # build [kr*C, T_w] in a scratch via strided stores, one GEMM with
        # full K = kr*C contraction depth
        for j in range(kr):
            sh = MAX_SHIFT + (j - kr // 2) * dil
            scratch_ref[j * c:(j + 1) * c, :] = a_ext[:, sh:sh + t_w]
        return jax.lax.dot_general(
            w, scratch_ref[:kr * c, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def conv(a, w, bias, kr, dil):
        a_ext = jnp.pad(a, ((0, 0), (MAX_SHIFT, MAX_SHIFT)))
        y = (conv_im2col if im2col else conv_taps)(a_ext, w, kr, dil)
        return y.astype(a.dtype) + bias

    acc = jnp.zeros((c, t_w), jnp.float32)
    wb_i = 0
    for kr in krs:
        w1, b1 = wb[wb_i][...], wb[wb_i + 1][...]
        w2, b2 = wb[wb_i + 2][...], wb[wb_i + 3][...]
        wb_i += 4
        cur = x
        for u, dil in enumerate(dils):
            a = _leaky(cur) * mask
            y = conv(a, w1[u], b1[u], kr, dil)
            a2 = _leaky(y) * mask
            y2 = conv(a2, w2[u], b2[u], kr, 1)
            cur = cur + y2
        acc = acc + cur.astype(jnp.float32)
    out = (acc / len(krs)).astype(x.dtype) * mask
    out_ref[0, 0] = out[:, HALO:HALO + t_tile]


@partial(jax.jit, static_argnames=('krs', 'dils', 't_tile', 'interpret',
                                   'im2col'))
def mrf_pallas(x: jnp.ndarray,
               weights: Tuple[jnp.ndarray, ...],
               krs: Sequence[int],
               dils: Sequence[int],
               t_tile: int = 1024,
               interpret: bool = False,
               im2col: bool = False) -> jnp.ndarray:
    """x [B, C, T] (channels-major!) -> [B, C, T].

    ``weights``: flat tuple, per kr in order: (w1 [U, C, kr*C],
    b1 [U, C, 1], w2 [U, C, kr*C], b2 [U, C, 1]) — pack with
    :func:`pack_conv_weight` / biases as ``b[:, :, None]``.
    """
    b, c, t = x.shape
    interpret = interpret or jax.default_backend() != 'tpu'
    t_tile = min(t_tile, max(128, ((t + 127) // 128) * 128))
    n_tiles = -(-t // t_tile)
    t_pad = n_tiles * t_tile
    t_w = t_tile + 2 * HALO

    # pre-window: [B, n_tiles, C, T_w] (zero-padded at sequence edges) so
    # block specs stay non-overlapping; costs (T_w/t_tile)x input bytes
    x_p = jnp.pad(x, ((0, 0), (0, 0), (HALO, HALO + t_pad - t)))
    windows = jnp.stack(
        [jax.lax.dynamic_slice(
            x_p, (0, 0, i * t_tile), (b, c, t_w)) for i in range(n_tiles)],
        axis=1)

    # validity mask per tile: global position in [0, T)
    pos = (np.arange(t_w)[None, :]
           + (np.arange(n_tiles) * t_tile)[:, None] - HALO)
    mask = np.asarray((pos >= 0) & (pos < t), np.float32)
    mask = jnp.asarray(mask, x.dtype)[None, :, None, :]
    mask = jnp.broadcast_to(mask, (b, n_tiles, 1, t_w))

    scratch = [pltpu.VMEM((max(krs) * c, t_w), x.dtype)] if im2col else []
    out = pl.pallas_call(
        partial(_mrf_kernel, krs=tuple(krs), dils=tuple(dils),
                t_tile=t_tile, im2col=im2col),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, c, t_w), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, t_w), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights],
        out_specs=pl.BlockSpec((1, 1, c, t_tile), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles, c, t_tile), x.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(windows, mask, *weights)

    return jnp.swapaxes(out, 1, 2).reshape(b, c, t_pad)[:, :, :t]


# ---------------------------------------------------- fused upsample + MRF

# The round-4 channels-major tail lost END-TO-END because the polyphase
# upsampler ran as a separate XLA GEMM with an interleave (depth-to-space)
# between the MRF kernels (255 vs 208 ms full v1). This kernel removes the
# interleave from existence: activations live PHASE-STACKED channels-major
# [s*C, T/s] — phase r of global sample tau = s*t + r is row block r at
# lane t. In that representation:
#   * the transposed-conv upsampler's output phases are natural GEMM row
#     blocks (per input-phase/tap GEMM accumulated into the right output
#     block with a +-1 lane shift) — no zero-stuffing, no interleave;
#   * an MRF conv tap at global offset delta maps out-phase r to source
#     phase (r+delta) mod s with lane shift floor((r+delta)/s) — the same
#     per-tap GEMM loop as _mrf_kernel, with phase bookkeeping.
# One kernel per level computes leaky -> upsample -> whole MRF; the tail
# de-phase-stacks ONCE at the end (an XLA reshape of the final tensor).

MAX_SHIFT_PS = 32    # >= max per-phase lane shift (kr=11,d=5,s=2: 13) + ups


def _ups_mrf_kernel(x_ref, mask_in_ref, mask_out_ref, upw_ref, upb_ref,
                    *rest, s_in, s_up, krs, dils, t_tile):
    """One (batch item, lane tile). x_ref [1, 1, s_in*C_in, T_w_in]
    phase-stacked input (already windowed with halo lanes); masks
    [1, 1, 1, T_w] (input / output lane validity); upw [k, C_in, C_out]
    (pre-flipped, TransposedConv1d layout); upb [C_out, 1]; rest = MRF
    (w1, b1, w2, b2) per kr, then out_ref [1, 1, s_out*C_out, t_tile]."""
    *wb, out_ref = rest
    s_out = s_in * s_up
    k_up = upw_ref.shape[0]
    c_in = upw_ref.shape[1]
    c = upw_ref.shape[2]
    t_w = x_ref.shape[3]
    pad_up = k_up - 1 - (k_up - s_up) // 2
    x = x_ref[0, 0]
    m_in = mask_in_ref[0, 0]
    m_out = mask_out_ref[0, 0]

    # leaky (pre-upsample, slope 0.1) + zero outside the true sequence
    x = _leaky(x) * m_in

    # ---- polyphase transposed conv: accumulate per (input phase, tap)
    x_ext = jnp.pad(x, ((0, 0), (MAX_SHIFT_PS, MAX_SHIFT_PS)))
    ublocks = [None] * s_out
    for r_in in range(s_in):
        xe = x_ext[r_in * c_in:(r_in + 1) * c_in]
        for m in range(k_up):
            off = s_up * r_in + pad_up - m
            r_out = off % s_out
            sig = (off - r_out) // s_out
            # out[:, l] += W_m^T @ x[:, l - sig]
            y = jax.lax.dot_general(
                upw_ref[m], xe[:, MAX_SHIFT_PS - sig:
                               MAX_SHIFT_PS - sig + t_w],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            ublocks[r_out] = y if ublocks[r_out] is None \
                else ublocks[r_out] + y
    u = jnp.concatenate(
        [(blk + upb_ref[...]).astype(x.dtype) for blk in ublocks], axis=0)

    # ---- MRF in s_out-phase space
    def conv_ps(a, w, bias, kr, dil):
        a_ext = jnp.pad(a, ((0, 0), (MAX_SHIFT_PS, MAX_SHIFT_PS)))
        outs = []
        for r in range(s_out):
            acc = None
            for j in range(kr):
                delta = (j - kr // 2) * dil
                q = (r + delta) % s_out
                sig = (r + delta - q) // s_out
                y_j = jax.lax.dot_general(
                    w[:, j * c:(j + 1) * c],
                    a_ext[q * c:(q + 1) * c,
                          MAX_SHIFT_PS + sig:MAX_SHIFT_PS + sig + t_w],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = y_j if acc is None else acc + y_j
            outs.append((acc + bias).astype(a.dtype))
        return jnp.concatenate(outs, axis=0)

    acc = jnp.zeros((s_out * c, t_w), jnp.float32)
    wb_i = 0
    for kr in krs:
        w1, b1 = wb[wb_i][...], wb[wb_i + 1][...]
        w2, b2 = wb[wb_i + 2][...], wb[wb_i + 3][...]
        wb_i += 4
        cur = u
        for i_u, dil in enumerate(dils):
            a = _leaky(cur) * m_out
            y = conv_ps(a, w1[i_u], b1[i_u], kr, dil)
            a2 = _leaky(y) * m_out
            y2 = conv_ps(a2, w2[i_u], b2[i_u], kr, 1)
            cur = cur + y2
        acc = acc + cur.astype(jnp.float32)
    out = (acc / len(krs)).astype(x.dtype) * m_out
    out_ref[0, 0] = out[:, (t_w - t_tile) // 2:(t_w - t_tile) // 2 + t_tile]


@partial(jax.jit, static_argnames=('s_in', 's_up', 'krs', 'dils',
                                   't_valid', 't_tile', 'interpret'))
def ups_mrf_pallas(x: jnp.ndarray,
                   up_kernel: jnp.ndarray,
                   up_bias: jnp.ndarray,
                   weights: Tuple[jnp.ndarray, ...],
                   s_in: int,
                   s_up: int,
                   krs: Sequence[int],
                   dils: Sequence[int],
                   t_valid: int,
                   t_tile: int = 512,
                   interpret: bool = False) -> jnp.ndarray:
    """One whole HiFi-GAN level (leaky -> transposed-conv upsample by
    ``s_up`` -> full MRF) in one dispatch, phase-stacked channels-major.

    x: [B, s_in*C_in, T_ps] (``s_in`` = product of upstream upsample
    rates since entering the tail; phase r of global sample s*t+r is row
    block r at lane t). ``t_valid``: true per-phase length (lanes beyond
    it are padding and masked off). up_kernel [k, C_in, C_out] is the
    TransposedConv1d parameter (stored pre-flipped); ``weights`` like
    :func:`mrf_pallas`. Returns [B, s_in*s_up*C_out, T_ps].
    """
    b, rows_in, t_ps = x.shape
    s_out = s_in * s_up
    interpret = interpret or jax.default_backend() != 'tpu'
    # per-phase halo lanes: the global MRF span divided across phases plus
    # one lane of rounding per chained conv (6) plus the upsampler's +-1
    halo = -(-HALO // s_out) + 8
    t_tile = min(t_tile, max(128, ((t_ps + 127) // 128) * 128))
    n_tiles = -(-t_ps // t_tile)
    t_pad = n_tiles * t_tile
    t_w = t_tile + 2 * halo

    x_p = jnp.pad(x, ((0, 0), (0, 0), (halo, halo + t_pad - t_ps)))
    windows = jnp.stack(
        [jax.lax.dynamic_slice(x_p, (0, 0, i * t_tile), (b, rows_in, t_w))
         for i in range(n_tiles)], axis=1)

    pos = (np.arange(t_w)[None, :]
           + (np.arange(n_tiles) * t_tile)[:, None] - halo)
    m_np = np.asarray((pos >= 0) & (pos < t_valid), np.float32)
    mask = jnp.asarray(m_np, x.dtype)[None, :, None, :]
    mask = jnp.broadcast_to(mask, (b, n_tiles, 1, t_w))

    c_out = up_kernel.shape[2]
    out = pl.pallas_call(
        partial(_ups_mrf_kernel, s_in=s_in, s_up=s_up, krs=tuple(krs),
                dils=tuple(dils), t_tile=t_tile),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, rows_in, t_w), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, t_w), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, t_w), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights],
        out_specs=pl.BlockSpec((1, 1, s_out * c_out, t_tile),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles, s_out * c_out, t_tile),
                                       x.dtype),
        interpret=interpret,
    )(windows, mask, mask, up_kernel.astype(x.dtype),
      up_bias.astype(jnp.float32)[:, None], *weights)

    return jnp.swapaxes(out, 1, 2).reshape(
        b, s_out * c_out, t_pad)[:, :, :t_ps]
