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
    return jnp.where(x >= 0, x, LRELU_SLOPE * x)


def pack_conv_weight(kernel: jnp.ndarray) -> jnp.ndarray:
    """flax Conv kernel [k, C_in, C_out] -> [C_out, k*C_in] with im2col
    row order j-major (row = j*C_in + c_in)."""
    k, cin, cout = kernel.shape
    return jnp.transpose(kernel, (2, 0, 1)).reshape(cout, k * cin)


def _mrf_kernel(x_ref, mask_ref, *rest, krs, dils, t_tile):
    """One (batch item, time tile). x_ref [1, 1, C, T_w]; mask_ref
    [1, 1, 1, T_w] (1.0 at global positions in [0, T)); rest = per-kr
    (w1 [U, C, kr*C], b1 [U, C], w2, b2) ... , out_ref [1, 1, C, t_tile]."""
    *wb, out_ref = rest
    c = x_ref.shape[2]
    t_w = x_ref.shape[3]
    x = x_ref[0, 0]
    mask = mask_ref[0, 0]

    def conv(a, w, bias, kr, dil):
        # zero-extend lanes so every dilated tap read is a static slice
        a_ext = jnp.pad(a, ((0, 0), (MAX_SHIFT, MAX_SHIFT)))
        rows = [a_ext[:, MAX_SHIFT + (j - kr // 2) * dil:
                      MAX_SHIFT + (j - kr // 2) * dil + t_w]
                for j in range(kr)]
        im = jnp.concatenate(rows, axis=0)               # [kr*C, T_w]
        y = jax.lax.dot_general(
            w, im, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(a.dtype)
        return y + bias[:, None]

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


@partial(jax.jit, static_argnames=('krs', 'dils', 't_tile', 'interpret'))
def mrf_pallas(x: jnp.ndarray,
               weights: Tuple[jnp.ndarray, ...],
               krs: Sequence[int],
               dils: Sequence[int],
               t_tile: int = 1024,
               interpret: bool = False) -> jnp.ndarray:
    """x [B, C, T] (channels-major!) -> [B, C, T].

    ``weights``: flat tuple, per kr in order: (w1 [U, C, kr*C], b1 [U, C],
    w2 [U, C, kr*C], b2 [U, C]) — pack with :func:`pack_conv_weight`.
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

    out = pl.pallas_call(
        partial(_mrf_kernel, krs=tuple(krs), dils=tuple(dils),
                t_tile=t_tile),
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
        interpret=interpret,
    )(windows, mask, *weights)

    return jnp.swapaxes(out, 1, 2).reshape(b, c, t_pad)[:, :, :t]
