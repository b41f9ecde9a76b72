"""Length regulation (duration-based token expansion) as MXU matmuls.

The reference expands tokens with a per-item Python loop of
``repeat_interleave`` + ``pad_sequence`` (models/common_layers.py:12-24).
That shape-dynamic gather is hostile to XLA, so here expansion is recast as
a selection-matrix product: frame t of item b copies token n iff
``starts[b,n] <= t < ends[b,n]`` where ends = cumsum(round(dur)). Building
the one-hot selection tile and contracting it with the token activations is
two dense ops that XLA fuses onto the MXU, with a fixed output length
``max_len`` (frames past the expanded length are zero, matching the
reference's zero padding). A fused Pallas kernel that never materializes the
selection matrix in HBM lives in ops/pallas/length_regulator.py.
"""

from functools import partial

import jax
import jax.numpy as jnp


def round_durations(dur: jnp.ndarray) -> jnp.ndarray:
    """Torch-compatible rounding: negatives clamp to 0, then floor(d + 0.5)
    (reference common_layers.py:18-21)."""
    return jnp.floor(jnp.maximum(dur, 0.0) + 0.5).astype(jnp.int32)


def duration_spans(dur: jnp.ndarray):
    """[B, N] float durations -> (starts, ends) int32 frame spans."""
    reps = round_durations(dur)
    ends = jnp.cumsum(reps, axis=1)
    starts = ends - reps
    return starts, ends


@partial(jax.jit, static_argnames=('max_len',))
def length_regulator(x: jnp.ndarray,
                     dur: jnp.ndarray,
                     max_len: int) -> jnp.ndarray:
    """Expand [B, N, C] token features to [B, max_len, C] frames.

    Each output frame receives exactly one token's features (or zeros past
    the expanded length). Differentiable w.r.t. ``x`` (constant w.r.t. the
    rounded durations, like the reference).
    """
    starts, ends = duration_spans(dur)
    t = jnp.arange(max_len, dtype=jnp.int32)
    sel = ((t[None, :, None] >= starts[:, None, :])
           & (t[None, :, None] < ends[:, None, :]))
    return jnp.einsum('btn,bnc->btc', sel.astype(x.dtype), x)


@partial(jax.jit, static_argnames=('max_len',))
def length_regulator_gather(x: jnp.ndarray,
                            dur: jnp.ndarray,
                            max_len: int) -> jnp.ndarray:
    """Gather-based variant (searchsorted + take): lighter when C is small.

    Kept for benchmarking against the matmul formulation; identical output.
    """
    _, ends = duration_spans(dur)
    total = ends[:, -1]
    t = jnp.arange(max_len, dtype=jnp.int32)
    # token index owning frame t = number of span-ends <= t
    idx = jnp.sum(t[:, None, None] >= ends.T[None, :, :], axis=1).T  # [B, max_len]
    idx = jnp.clip(idx, 0, x.shape[1] - 1)
    out = jnp.take_along_axis(x, idx[:, :, None], axis=1)
    valid = t[None, :] < total[:, None]
    return out * valid[:, :, None].astype(x.dtype)


def expanded_lengths(dur: jnp.ndarray) -> jnp.ndarray:
    """Total expanded frames per item: sum of rounded durations."""
    return jnp.sum(round_durations(dur), axis=1)


def length_regulator_auto(x: jnp.ndarray, dur: jnp.ndarray,
                          max_len: int) -> jnp.ndarray:
    """Backend-aware dispatch: the fused Pallas kernel on TPU (the selection
    tensor never touches HBM), the XLA einsum elsewhere. Opt out with
    FTT_PALLAS_LR=0."""
    import os

    import jax
    if (os.environ.get('FTT_PALLAS_LR', '1') != '0'
            and jax.default_backend() == 'tpu'):
        from forwardtacotron_tpu.ops.pallas.length_regulator import \
            length_regulator_pallas
        return length_regulator_pallas(x, dur, max_len)
    return length_regulator(x, dur, max_len)
