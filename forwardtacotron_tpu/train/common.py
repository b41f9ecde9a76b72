"""Training primitives shared by the trainers.

Parity with reference trainer/common.py: TTSSession (:8-27), Averager
(:51-66), MaskedL1 + pad_mask (:69-92) — the losses reimplemented as pure
jnp functions usable inside jit.
"""

import time
from typing import Any, Dict, Optional

import jax.numpy as jnp


class TTSSession:
    """Per-schedule-row training context (reference trainer/common.py:8-27)."""

    def __init__(self, index: int, r: int, lr: float, max_step: int, bs: int,
                 train_set, val_set) -> None:
        self.index = index
        self.r = r
        self.lr = lr
        self.max_step = max_step
        self.bs = bs
        self.train_set = train_set
        self.val_set = val_set
        self.val_sample = next(iter(val_set))


class Averager:

    def __init__(self) -> None:
        self.count = 0
        self.val = 0.0

    def add(self, val: float) -> None:
        self.val += float(val)
        self.count += 1

    def reset(self) -> None:
        self.val = 0.0
        self.count = 0

    def get(self) -> float:
        return self.val / self.count if self.count > 0 else 0.0


def len_mask(lens: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[B] -> [B, max_len] float mask, 1 inside the valid prefix."""
    return (jnp.arange(max_len)[None, :] < lens[:, None]).astype(jnp.float32)


def masked_l1(x: jnp.ndarray, target: jnp.ndarray,
              lens: jnp.ndarray) -> jnp.ndarray:
    """Sum of |x - target| over the valid time prefix / number of masked
    elements (reference MaskedL1, trainer/common.py:69-78).

    Accepts [B, T] or [B, T, C]; the mask runs over axis 1.
    """
    if x.ndim == 2:
        x = x[:, :, None]
        target = target[:, :, None]
    mask = len_mask(lens, x.shape[1])[:, :, None]
    mask = jnp.broadcast_to(mask, x.shape)
    loss = jnp.sum(jnp.abs(x * mask - target * mask))
    return loss / jnp.maximum(jnp.sum(mask), 1.0)


def masked_cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray,
                         ignore_index: int = 0) -> jnp.ndarray:
    """Token-level CE with an ignored class (reference
    trainer/multi_forward_trainer.py:34: CrossEntropyLoss(ignore_index=0))."""
    import jax
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(log_probs, targets[..., None], axis=-1)[..., 0]
    valid = (targets != ignore_index).astype(jnp.float32)
    return -jnp.sum(picked * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def classification_accuracy(logits: jnp.ndarray, targets: jnp.ndarray,
                            ignore_index: int = 0) -> jnp.ndarray:
    pred = jnp.argmax(logits, axis=-1)
    valid = (targets != ignore_index).astype(jnp.float32)
    correct = (pred == targets).astype(jnp.float32) * valid
    return jnp.sum(correct) / jnp.maximum(jnp.sum(valid), 1.0)


class StepTimer:
    """Wall-clock steps/s tracker (replaces the reference's inline timing,
    trainer/forward_trainer.py:70,106-112)."""

    def __init__(self) -> None:
        self._avg = Averager()
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.time()
        if self._last is not None:
            self._avg.add(now - self._last)
        self._last = now

    def steps_per_second(self) -> float:
        d = self._avg.get()
        return 1.0 / d if d > 0 else 0.0

    def reset(self) -> None:
        self._avg.reset()
        self._last = None


def to_host(metrics: Dict[str, Any]) -> Dict[str, float]:
    return {k: float(v) for k, v in metrics.items()}


def cast_floats(tree: Any, dtype) -> Any:
    """Cast every floating-point leaf of a pytree to ``dtype`` (ints, bools
    and non-arrays pass through). Used by the mixed-precision train step to
    move params/batch into bf16 and model outputs back to f32."""
    import jax

    def cast(a):
        if hasattr(a, 'dtype') and jnp.issubdtype(a.dtype, jnp.floating):
            return a.astype(dtype)
        return a
    return jax.tree.map(cast, tree)
