"""TrainState: parameters + batch stats + optax optimizer state.

The optimizer matches the reference trainers (Adam + global-norm grad clip,
trainer/forward_trainer.py:95-99) with the learning rate exposed as an
injected hyperparameter so schedule sessions can change it without resetting
Adam moments (the reference mutates optimizer.param_groups in place,
trainer/forward_trainer.py:62-63).
"""

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray  # scalar int32

    def variables(self) -> Dict[str, Any]:
        v = {'params': self.params}
        if self.batch_stats is not None:
            v['batch_stats'] = self.batch_stats
        return v


def make_optimizer(learning_rate: float,
                   clip_grad_norm: Optional[float] = 1.0
                   ) -> optax.GradientTransformation:
    parts = []
    if clip_grad_norm:
        parts.append(optax.clip_by_global_norm(clip_grad_norm))
    parts.append(optax.inject_hyperparams(optax.adam)(
        learning_rate=learning_rate))
    return optax.chain(*parts)


def create_train_state(variables: Dict[str, Any],
                       tx: optax.GradientTransformation,
                       step: int = 0) -> TrainState:
    params = variables['params']
    return TrainState(params=params,
                      batch_stats=variables.get('batch_stats'),
                      opt_state=tx.init(params),
                      step=jnp.asarray(step, jnp.int32))


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Update the injected learning rate in place, preserving Adam moments."""
    def maybe_set(node):
        return node
    opt_state = state.opt_state
    new_states = []
    for s in opt_state:
        if hasattr(s, 'hyperparams') and 'learning_rate' in s.hyperparams:
            hp = dict(s.hyperparams)
            hp['learning_rate'] = jnp.asarray(lr, jnp.float32)
            s = s._replace(hyperparams=hp)
        new_states.append(s)
    return state.replace(opt_state=type(opt_state)(new_states))
