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
