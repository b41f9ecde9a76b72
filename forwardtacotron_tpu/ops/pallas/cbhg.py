"""Fused Pallas kernel for CBHG's maxpool -> first-projection conv.

In the XLA op order (reference common_layers.py:103-110) the [B, T, K*C]
bank concatenation is written to HBM, read+written again by
MaxPool1d(2, 1), and read a third time by the k=3 projection conv's im2col
— at postnet serving shapes (batch 4096 x 256 frames, K*C=2048) those
round-trips plus the pool dominate the stage (r4 decomposition: maxpool
+19.5 ms, proj1 +11.6 ms vs a 16.7 ms compute floor for the conv alone).

This kernel reads the concat ONCE per tile: the 2-tap max, the
exact-length tail mask, and the three shifted GEMMs of the k=3 conv all
happen on the VMEM-resident tile. Whole-T blocks (serving frame budgets
are <= a few hundred frames) keep halos out of the picture; longer
sequences fall back to the XLA path.

Semantics match the reference exactly: pool out[i] = max(x[i-1], x[i])
with a -inf left boundary (MaxPool1d(k=2, s=1, pad=1) truncated to T), the
tail mask zeroes pooled frames at/after each item's length, and the conv
zero-pads at the sequence ends. Output is the PRE-ReLU/BN conv result
(conv_project1's conv has no bias); the caller applies ReLU + BatchNorm.

Inference-only (no VJP).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_T = 512   # whole-T VMEM blocks; larger sequences use the XLA path


def _pool_proj_kernel(x_ref, mask_ref, w_ref, out_ref):
    bb, t, kc = x_ref.shape
    a = x_ref[...]
    neg = jnp.asarray(-3e38 if a.dtype == jnp.float32 else -3e38, a.dtype)
    shifted = jnp.concatenate(
        [jnp.full((bb, 1, kc), neg, a.dtype), a[:, :t - 1, :]], axis=1)
    # mask arrives f32: Mosaic only supports non-no-op minor-dim inserts
    # (the [bb, t] -> [bb, t, 1] expand) for 32-bit types
    mask = jnp.expand_dims(jnp.squeeze(mask_ref[...], axis=1), -1)
    pooled = (jnp.maximum(a, shifted).astype(jnp.float32)
              * mask).astype(a.dtype)

    p = w_ref.shape[-1]
    acc = None
    for d in range(3):   # conv tap offsets -1, 0, +1 with zero boundary
        off = d - 1
        if off < 0:
            sh = jnp.concatenate(
                [jnp.zeros((bb, -off, kc), a.dtype), pooled[:, :t + off]],
                axis=1)
        elif off > 0:
            sh = jnp.concatenate(
                [pooled[:, off:], jnp.zeros((bb, off, kc), a.dtype)],
                axis=1)
        else:
            sh = pooled
        y = jax.lax.dot_general(
            sh.reshape(bb * t, kc), w_ref[d],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = y if acc is None else acc + y
    out_ref[...] = acc.reshape(bb, t, p).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=('interpret',))
def pool_proj1_pallas(x: jnp.ndarray, mask: jnp.ndarray,
                      w: jnp.ndarray, interpret: bool = False
                      ) -> jnp.ndarray:
    """x [B, T, KC] bank concat; mask [B, T] (1.0 = valid frame, applied
    AFTER the pool like the reference's tail zeroing); w [3, KC, P] the
    projection conv kernel. Returns [B, T, P] pre-activation conv output.
    """
    from forwardtacotron_tpu.ops.pallas.rnn import interpret_forced
    b, t, kc = x.shape
    p = w.shape[-1]
    # batch tile sized to keep the [bb, T, KC] block <= 4 MB of VMEM
    # (double-buffered input + the weight + temporaries must fit the 16 MB
    # scoped limit in f32 as well as bf16)
    # 2 MB block: the in-kernel f32 masked-pool temporary doubles the
    # tile footprint, and 4 MB blocks hit the 16 MB scoped-VMEM limit
    budget = 2 * 2 ** 20
    bb = next((n for n in (8, 4, 2, 1)
               if b % n == 0 and n * t * kc * x.dtype.itemsize <= budget), 1)
    return pl.pallas_call(
        _pool_proj_kernel,
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, t, kc), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # [B, 1, T]: block last-two dims (1, T) match the array,
            # satisfying the 8x128 tiling rule for any bb
            pl.BlockSpec((bb, 1, t), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, t, p), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, p), x.dtype),
        interpret=interpret or interpret_forced(),
    )(x, mask.astype(jnp.float32)[:, None, :], w.astype(x.dtype))


# -------------------------------------------------------- pool-only kernel

def _pool_mask_kernel(x_ref, m_ref, out_ref):
    bb, t, kc = x_ref.shape
    a = x_ref[...]
    mask = jnp.expand_dims(jnp.squeeze(m_ref[...], axis=1), -1).astype(a.dtype)
    out_ref[:, 1:, :] = jnp.maximum(a[:, 1:, :], a[:, :t - 1, :]) \
        * mask[:, 1:, :]
    # first frame: the left pool neighbor is the -inf pad -> identity
    out_ref[:, 0:1, :] = a[:, 0:1, :] * mask[:, 0:1, :]


@partial(jax.jit, static_argnames=('interpret',))
def pool_mask_pallas(x: jnp.ndarray, mask: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """MaxPool1d(2, 1, pad=1)[:T] + tail-zero mask as one kernel.

    x [B, T, KC] bank concat, mask [B, T] (1.0 = valid). The reference op
    order (common_layers.py:103-105 + the tail zeroing) reads and writes
    the [B, T, KC] tensor through reduce_window and again through the mask
    multiply; this reads it once per tile. The mask multiply is exact in
    bf16 (mask is 0/1).

    Measured on v5e at postnet serving shapes ([2048, 256, 2048] bf16,
    chained + readback): XLA reduce_window+mask 25.7 ms, this kernel
    18.7 ms at bb=2 — but BOTH are ~4x off the 5.2 ms bytes floor: the
    one-sublane shift of the pool is a relayout Mosaic pays for too.
    END-TO-END the kernel LOSES: serving 24.5k vs 29.7k audio-s/s/chip
    with it on (in situ XLA fuses pool+mask into the surrounding
    concat/proj chain; the kernel adds a dispatch boundary). Ships OFF
    (CBHG.fuse_pool=False), kept with parity tests alongside the other
    measured-and-rejected CBHG fusions.
    """
    from forwardtacotron_tpu.ops.pallas.rnn import interpret_forced
    b, t, kc = x.shape
    bb = 2 if b % 2 == 0 else 1
    return pl.pallas_call(
        _pool_mask_kernel,
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, t, kc), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1, t), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, t, kc), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, kc), x.dtype),
        interpret=interpret or interpret_forced(),
    )(x, mask.astype(jnp.float32)[:, None, :])
