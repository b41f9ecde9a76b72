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


# ------------------------------------------- bank + pool + proj1 mega-kernel

# Every earlier CBHG fusion attempt still materialized (or read) the
# [B, T, K*C] bank concatenation somewhere: the streamed XLA variant
# round-tripped each branch through HBM, pool_proj1_pallas read the concat
# from HBM, and the zero-embedded fused bank paid K^2/sum(k) extra MACs.
# This kernel runs the ENTIRE bank -> ReLU -> BN -> maxpool -> tail-mask ->
# proj1-conv -> ReLU -> BN chain branch-by-branch with everything VMEM-
# resident: HBM traffic is one read of [B, T, C_in] and one write of
# [B, T, P] — the 2048-wide concat never exists anywhere. Each branch k
# builds a [T, k*C_in] im2col in scratch (full-depth contraction, no
# zero taps) and its pooled output feeds three partial proj1 GEMMs.
# Row shifts go through zero/neg-inf-bordered scratch buffers (ref stores
# + sublane-offset reads — Mosaic cannot concat offset slices).
#
# Measured on a QUIET v5e (bf16, median-of-4 + readback): whole postnet
# CBHG 167 vs 176 ms at serving shapes (batch 4096 x 256 frames), and
# END-TO-END serving 30.8k -> 32.1k audio-s/s/chip (+4.2%) — ships ON
# (CBHG.fuse_front) where the resident weight set fits scoped VMEM: the
# K=8 C_in=80 postnet (4.6 MB) fuses; the K=16 C_in=256 prenet (~24 MB
# of bank+proj weights) is gated out, measured VMEM OOM.

BANK_HALO = 8          # >= max bank tap offset (k=16 -> -8..7)


def _bank_pool_proj_kernel(x_ref, mask_ref, *rest, ks, c_in, c_bank,
                           p_out, bb, t, final_act):
    (w_refs, rest2) = (rest[:len(ks)], rest[len(ks):])
    (bns_ref, bnb_ref, pw_ref, ps_ref, pb_ref, out_ref,
     xpad_s, col_s, ypad_s, yppad_s) = rest2
    dt = x_ref.dtype
    neg = jnp.float32(-3e38)
    for i in range(bb):
        # zero-bordered input for tap shifts (kept in the compute dtype —
        # the XLA path's convs also consume bf16 inputs)
        xpad_s[0:BANK_HALO] = jnp.zeros((BANK_HALO, c_in), dt)
        xpad_s[BANK_HALO:BANK_HALO + t] = x_ref[i]
        xpad_s[BANK_HALO + t:] = jnp.zeros((BANK_HALO, c_in), dt)
        mask = mask_ref[i, 0, :][:, None]                 # [T, 1] f32
        pacc = jnp.zeros((t, p_out), jnp.float32)
        for bi, k in enumerate(ks):
            for j in range(k):
                off = j - k // 2
                col_s[:, j * c_in:(j + 1) * c_in] = \
                    xpad_s[BANK_HALO + off: BANK_HALO + off + t, :]
            y = jax.lax.dot_general(
                col_s[:, :k * c_in], w_refs[bi][...],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # ReLU then BN eval affine (reference order, scale/bias folded)
            y = jnp.maximum(y, 0.0) * bns_ref[bi] + bnb_ref[bi]
            # maxpool(2,1,left): out[t] = max(y[t-1], y[t]); -inf border
            ypad_s[0:1] = jnp.full((1, c_bank), neg, jnp.float32)
            ypad_s[1:t + 1] = y
            yp = jnp.maximum(ypad_s[1:t + 1, :], ypad_s[0:t, :]) * mask
            # zero-bordered pooled branch for the k=3 proj taps
            yppad_s[0:1] = jnp.zeros((1, c_bank), jnp.float32)
            yppad_s[1:t + 1] = yp
            yppad_s[t + 1:] = jnp.zeros((1, c_bank), jnp.float32)
            for d in range(3):                            # taps -1, 0, +1
                pacc = pacc + jax.lax.dot_general(
                    yppad_s[d:d + t, :].astype(dt),
                    pw_ref[d, bi * c_bank:(bi + 1) * c_bank, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        if final_act:
            out = jnp.maximum(pacc, 0.0) * ps_ref[...] + pb_ref[...]
            out_ref[i] = out.astype(dt)
        else:
            # group-split mode: emit the raw f32 partial proj1 sum; the
            # caller adds the groups and applies ReLU + affine once
            out_ref[i] = pacc


def _front_weight_bytes(ks, c_in, c_bank, p_out, itemsize=2) -> int:
    return itemsize * (sum(ks) * c_in * c_bank
                       + 3 * len(ks) * c_bank * p_out)


# resident-weight budget per dispatch: blocks + scratch + double buffering
# must share the 16 MB scoped limit with the weights
FRONT_WEIGHT_BUDGET = 10 * 2 ** 20


def _front_groups(ks, c_in, c_bank, p_out):
    """Partition branch indices into contiguous groups whose weights fit
    the budget (greedy; ks are tiny so optimality is irrelevant)."""
    groups, cur = [], []
    for bi, k in enumerate(ks):
        if cur and _front_weight_bytes(
                [ks[j] for j in cur] + [k], c_in, c_bank, p_out) \
                > FRONT_WEIGHT_BUDGET:
            groups.append(cur)
            cur = []
        cur.append(bi)
    if cur:
        groups.append(cur)
    return groups


def _front_call(x, mask3, wk, bns, bnb, pw, ps, pb, ks, bis, t, c_in,
                c_bank, p_out, bb, final_act, interpret):
    sub_ks = tuple(ks[bi] for bi in bis)
    out_dt = x.dtype if final_act else jnp.float32
    return pl.pallas_call(
        partial(_bank_pool_proj_kernel, ks=sub_ks, c_in=c_in,
                c_bank=c_bank, p_out=p_out, bb=bb, t=t,
                final_act=final_act),
        grid=(x.shape[0] // bb,),
        in_specs=[
            pl.BlockSpec((bb, t, c_in), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1, t), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (len(bis) + 5),
        out_specs=pl.BlockSpec((bb, t, p_out), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], t, p_out), out_dt),
        scratch_shapes=[
            pltpu.VMEM((t + 2 * BANK_HALO, c_in), x.dtype),
            pltpu.VMEM((t, max(sub_ks) * c_in), x.dtype),
            pltpu.VMEM((t + 1, c_bank), jnp.float32),
            pltpu.VMEM((t + 2, c_bank), jnp.float32),
        ],
        interpret=interpret,
    )(x, mask3, *[wk[bi] for bi in bis],
      jnp.stack([bns[bi] for bi in bis])[:, None, :],
      jnp.stack([bnb[bi] for bi in bis])[:, None, :],
      jnp.stack([pw[:, bi * c_bank:(bi + 1) * c_bank, :] for bi in bis],
                axis=1).reshape(3, len(bis) * c_bank, p_out),
      ps[None, :], pb[None, :])


@partial(jax.jit, static_argnames=('ks', 'interpret'))
def bank_pool_proj_pallas(x: jnp.ndarray, mask: jnp.ndarray,
                          bank_weights, bn_scale, bn_bias,
                          proj_w, proj_scale, proj_bias,
                          ks, interpret: bool = False) -> jnp.ndarray:
    """Whole CBHG front (bank..proj1 incl. both ReLU+BN evals) fused.

    x [B, T, C_in] (already zeroed beyond each item's length);
    mask [B, T] 1.0 at valid frames (applied after the pool);
    bank_weights: tuple of [k, C_in, C] conv kernels for k in ``ks``;
    bn_scale/bn_bias [K, C]: folded eval-BN affine per branch
    (scale' = scale*rsqrt(var+eps), bias' = bias - mean*scale');
    proj_w [3, K*C, P]; proj_scale/proj_bias [P]: proj1's folded BN.
    Returns [B, T, P] = conv_project1 output (post ReLU+BN).

    When the weight set exceeds the per-dispatch budget (the K=16
    C_in=256 prenet is ~24 MB), branches split into budget-sized GROUPS:
    one dispatch per group emitting its raw f32 partial proj1 sum, summed
    in XLA with the ReLU + affine applied once — exact, at the cost of
    the f32 partials' HBM round-trips.
    """
    from forwardtacotron_tpu.ops.pallas.rnn import interpret_forced
    interpret = interpret or interpret_forced()
    b, t, c_in = x.shape
    c_bank = bank_weights[0].shape[-1]
    p_out = proj_w.shape[-1]
    dt = x.dtype
    bb = next((n for n in (8, 4, 2, 1) if b % n == 0), 1)
    wk = tuple(jnp.asarray(w, dt).reshape(w.shape[0] * c_in, c_bank)
               for w in bank_weights)
    mask3 = mask.astype(jnp.float32)[:, None, :]
    bns = jnp.asarray(bn_scale, jnp.float32)
    bnb = jnp.asarray(bn_bias, jnp.float32)
    pw = jnp.asarray(proj_w, dt)
    ps = jnp.asarray(proj_scale, jnp.float32)
    pb = jnp.asarray(proj_bias, jnp.float32)

    groups = _front_groups(ks, c_in, c_bank, p_out)
    if len(groups) == 1:
        return _front_call(x, mask3, wk, bns, bnb, pw, ps, pb, ks,
                           groups[0], t, c_in, c_bank, p_out, bb,
                           final_act=True, interpret=interpret)
    acc = None
    for bis in groups:
        part = _front_call(x, mask3, wk, bns, bnb, pw, ps, pb, ks,
                           bis, t, c_in, c_bank, p_out, bb,
                           final_act=False, interpret=interpret)
        acc = part if acc is None else acc + part
    return (jnp.maximum(acc, 0.0) * ps[None, None, :]
            + pb[None, None, :]).astype(dt)
