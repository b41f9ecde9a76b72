"""Fused Pallas TPU kernel for the length regulator.

The XLA formulation (ops/length_regulator.py) materializes the [B, T, N]
one-hot selection tensor in HBM before the matmul. This kernel builds each
[T_TILE, N] selection tile in VMEM with a broadcasted iota + two compares
and feeds it straight to the MXU — the selection tensor never touches HBM,
so the op is bounded by reading x once and writing the output once.

Grid: (B / B_TILE, T / T_TILE). Per program, for each of its B_TILE items:
out[b, t0:t0+T_TILE, :] = onehot(t in [starts[b], ends[b])) @ x[b].
B_TILE items per program amortize the per-program dispatch/DMA-setup
overhead — at serving shapes (B=4096, one T tile) a per-item grid was
overhead-bound at ~3x the bytes-floor SoL; batching items recovers it.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from forwardtacotron_tpu.ops.length_regulator import duration_spans

T_TILE = 256
B_TILE = 8


def _lr_kernel(starts_ref, ends_ref, x_ref, out_ref, *, b_tile):
    # spans arrive [bt, 1, n]: the (1, n) trailing block dims equal the
    # array's, which keeps any batch tile legal under the 8x128 tiling rule
    t0 = pl.program_id(1) * T_TILE
    n = x_ref.shape[1]
    t_ids = jax.lax.broadcasted_iota(jnp.int32, (T_TILE, n), 0) + t0
    for k in range(b_tile):
        starts = starts_ref[k, 0, :][None, :]
        ends = ends_ref[k, 0, :][None, :]
        sel = ((t_ids >= starts) & (t_ids < ends)).astype(x_ref.dtype)
        out_ref[k] = jnp.dot(sel, x_ref[k],
                             preferred_element_type=jnp.float32
                             ).astype(out_ref.dtype)


def _pallas_impl(x: jnp.ndarray, dur: jnp.ndarray, max_len: int,
                 interpret: bool) -> jnp.ndarray:
    b, n, c = x.shape
    if max_len % T_TILE != 0:
        padded = ((max_len + T_TILE - 1) // T_TILE) * T_TILE
        return _pallas_impl(x, dur, padded, interpret)[:, :max_len]
    starts, ends = duration_spans(dur)
    # batch tile: divisibility AND a VMEM budget — at long-form token
    # counts (N=2048 for a 16k-frame decode) the [b_tile, N, C] token
    # block dominates; an 8-item tile was 33 MB and blew the 16 MB scoped
    # limit. ~6 MB keeps block + selection temporaries + double buffering
    # comfortably inside it at every shape that reaches this path.
    budget = 6 * 2 ** 20
    item = x.dtype.itemsize

    def tile_bytes(bt):
        return bt * (n * c * item + 2 * n * 4 + T_TILE * c * item
                     + T_TILE * n * 4)

    b_tile = next((bt for bt in (B_TILE, 4, 2, 1)
                   if b % bt == 0 and tile_bytes(bt) <= budget), 1)

    return pl.pallas_call(
        partial(_lr_kernel, b_tile=b_tile),
        grid=(b // b_tile, max_len // T_TILE),
        in_specs=[
            # blocked per batch tile: an unblocked spec would DMA the FULL
            # [B, N] spans into every program (1.4 GB of redundant traffic
            # at serving shapes — measured 4x the bytes-floor SoL)
            pl.BlockSpec((b_tile, 1, n), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, 1, n), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, n, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b_tile, T_TILE, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, max_len, c), x.dtype),
        interpret=interpret,
    )(starts[:, None, :], ends[:, None, :], x)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _lr_pallas(x, dur, max_len, interpret):
    return _pallas_impl(x, dur, max_len, interpret)


def _lr_pallas_fwd(x, dur, max_len, interpret):
    return _pallas_impl(x, dur, max_len, interpret), dur


def _lr_pallas_bwd(max_len, interpret, dur, g):
    # dL/dx[b,n] = sum over the frames token n was copied to; plain XLA
    # einsum (pallas_call has no autodiff rule). Durations are rounded to
    # integer repeats, so their gradient is zero (reference semantics).
    starts, ends = duration_spans(dur)
    t = jnp.arange(g.shape[1], dtype=jnp.int32)
    sel = ((t[None, :, None] >= starts[:, None, :])
           & (t[None, :, None] < ends[:, None, :])).astype(g.dtype)
    dx = jnp.einsum('btn,btc->bnc', sel, g)
    return dx, jnp.zeros_like(dur)


_lr_pallas.defvjp(_lr_pallas_fwd, _lr_pallas_bwd)


@partial(jax.jit, static_argnames=('max_len', 'interpret'))
def length_regulator_pallas(x: jnp.ndarray,
                            dur: jnp.ndarray,
                            max_len: int,
                            interpret: bool = False) -> jnp.ndarray:
    """[B, N, C] tokens + [B, N] durations -> [B, max_len, C] frames.

    Differentiable w.r.t. ``x`` via a custom VJP (XLA einsum backward);
    identical output to ops.length_regulator.length_regulator.
    """
    return _lr_pallas(x, dur, max_len, interpret)


# ------------------------------------------------- bidirectional LR (serving)

# 64-frame time tile: at serving shapes (b_tile 16, C 512) a 128-frame tile
# put block+scratch at 16.7 MB, just over the 16 MB scoped-VMEM limit
LRB_T_TILE = 64


def _lr_bidir_kernel(starts_ref, ends_ref, lens_ref, x_ref, out_ref, acc_scr,
                     *, b_tile, t_tile, t_total):
    """One program: for each of its b_tile items, build the forward AND the
    per-item-flipped selection tiles and contract both with the token
    features in ONE MXU dot; results land in a [b_tile, 2, t_tile, C]
    scratch (contiguous writes) and flush to the output block with a single
    transpose — per-item strided writes into the (dir, batch) middle dims
    were the slow alternative."""
    t0 = pl.program_id(1) * t_tile
    n = x_ref.shape[1]
    t_ids = jax.lax.broadcasted_iota(jnp.int32, (t_tile, n), 0) + t0
    for k in range(b_tile):
        starts = starts_ref[k, :][None, :]
        ends = ends_ref[k, :][None, :]
        length = lens_ref[k, 0]
        # backward-direction frame index: the valid prefix reversed, with
        # torch-gather clip semantics for over-budget durations
        # (models/layers.py flip_sequences + take_along_axis 'clip')
        f_bwd = jnp.minimum(length - 1 - t_ids, t_total - 1)
        sel = jnp.concatenate(
            [(t_ids >= starts) & (t_ids < ends),
             (f_bwd >= starts) & (f_bwd < ends)], axis=0).astype(x_ref.dtype)
        r = jnp.dot(sel, x_ref[k],
                    preferred_element_type=jnp.float32)     # [2*t_tile, C]
        acc_scr[k] = r.reshape(2, t_tile, -1).astype(acc_scr.dtype)
    out_ref[...] = jnp.transpose(acc_scr[...], (2, 1, 0, 3))


@partial(jax.jit, static_argnames=('max_len', 'interpret'))
def length_regulator_bidir_pallas(x: jnp.ndarray,
                                  starts: jnp.ndarray,
                                  ends: jnp.ndarray,
                                  max_len: int,
                                  interpret: bool = False) -> jnp.ndarray:
    """[B, N, C] tokens + frame spans -> [T, 2, B, C]: the fused RNN
    kernels' input layout, with dir 0 the forward frame order and dir 1 the
    per-item length-flipped order (ops/pallas/rnn.py wants the backward
    direction's sequence pre-flipped). Replaces LR + stack + flip +
    transpose — three full [B, T, C] HBM round-trips — with one kernel that
    writes the stacked layout directly. Inference-only (no VJP).
    """
    from forwardtacotron_tpu.ops.pallas.rnn import interpret_forced
    b, n, c = x.shape
    assert max_len % LRB_T_TILE == 0, \
        f'max_len must be a multiple of {LRB_T_TILE} (serving buckets are)'
    b_tile = next(bt for bt in (16, 8, 4, 2, 1) if b % bt == 0)
    lens = ends[:, -1].astype(jnp.int32)[:, None]   # SMEM wants rank >= 2

    return pl.pallas_call(
        partial(_lr_bidir_kernel, b_tile=b_tile, t_tile=LRB_T_TILE,
                t_total=max_len),
        grid=(b // b_tile, max_len // LRB_T_TILE),
        in_specs=[
            pl.BlockSpec((b_tile, n), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, n), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((b_tile, n, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((LRB_T_TILE, 2, b_tile, c),
                               lambda i, j: (j, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((max_len, 2, b, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((b_tile, 2, LRB_T_TILE, c), x.dtype)],
        interpret=interpret or interpret_forced(),
    )(starts.astype(jnp.int32), ends.astype(jnp.int32), lens, x)
