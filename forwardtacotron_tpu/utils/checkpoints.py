"""Self-describing checkpoints: variables + optimizer state + config in one
msgpack file.

Mirrors the reference contract (utils/checkpoints.py:13-34: checkpoint =
{'model','optim','config'} (+ meta such as multispeaker speaker embeddings),
restore-if-exists, ``latest_model`` convention) with flax msgpack
serialization instead of torch.save. ``load_checkpoint`` transparently
ingests reference ``.pt`` files by running the torch->flax converter, so a
user can point gen_forward at a published PyTorch checkpoint.
"""

import io
from pathlib import Path
from typing import Any, Dict, Optional, Tuple, Union

import numpy as np
import yaml
from flax import serialization

CHECKPOINT_VERSION = 1


def _to_numpy_tree(tree):
    import jax
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: Union[str, Path],
                    variables: Dict[str, Any],
                    config: Dict[str, Any],
                    opt_state: Any = None,
                    step: int = 0,
                    meta: Optional[Dict[str, Any]] = None) -> None:
    payload = {
        'version': CHECKPOINT_VERSION,
        'step': int(step),
        'config_yaml': yaml.dump(config, default_flow_style=False),
        'variables': _to_numpy_tree(variables),
    }
    if opt_state is not None:
        payload['opt_state'] = serialization.to_bytes(
            _to_numpy_tree(opt_state))
    if meta:
        payload['meta'] = _to_numpy_tree(meta)
    data = serialization.msgpack_serialize(payload)
    path = Path(path)
    tmp = path.with_suffix(path.suffix + '.tmp')
    tmp.write_bytes(data)
    tmp.replace(path)  # atomic so a crash never corrupts latest_model


def load_checkpoint(path: Union[str, Path]) -> Dict[str, Any]:
    """Load a checkpoint; accepts both native msgpack and reference torch
    ``.pt`` files (auto-converted). Returns a dict with keys
    'variables', 'config', 'step', optionally 'opt_state_bytes' / 'meta'."""
    path = Path(path)
    data = path.read_bytes()
    if _is_torch_checkpoint(data):
        return _load_torch_checkpoint(path)
    payload = serialization.msgpack_restore(data)
    out = {
        'variables': payload['variables'],
        'config': yaml.load(payload['config_yaml'], Loader=yaml.FullLoader),
        'step': int(payload['step']),
    }
    if 'opt_state' in payload:
        out['opt_state_bytes'] = payload['opt_state']
    if 'meta' in payload:
        out['meta'] = payload['meta']
    return out


def restore_opt_state(checkpoint: Dict[str, Any], opt_state_template):
    """Rebuild an optax state pytree from serialized bytes using a freshly
    initialized state of the same structure as the template."""
    if 'opt_state_bytes' not in checkpoint:
        return opt_state_template
    return serialization.from_bytes(opt_state_template,
                                    checkpoint['opt_state_bytes'])


def restore_checkpoint(checkpoint_dir: Union[str, Path],
                       name: str = 'latest_model.ckpt'
                       ) -> Optional[Dict[str, Any]]:
    """Restore ``name`` from ``checkpoint_dir`` if present (implicit-resume
    convention of reference utils/checkpoints.py:26-34)."""
    path = Path(checkpoint_dir) / name
    if not path.is_file():
        return None
    return load_checkpoint(path)


def _is_torch_checkpoint(data: bytes) -> bool:
    # torch.save produces a zipfile (PK..) or legacy pickle protocol stream
    return data[:2] == b'PK' or data[:2] == b'\x80\x02'


def _load_torch_checkpoint(path: Path) -> Dict[str, Any]:
    from forwardtacotron_tpu.utils.convert import (convert_state_dict,
                                                   load_torch_checkpoint)
    ckpt = load_torch_checkpoint(str(path))
    variables, aux = convert_state_dict(ckpt['model'])
    step = int(aux.get('step', np.zeros(1))[0]) if 'step' in aux else 0
    out = {'variables': variables, 'config': ckpt.get('config', {}),
           'step': step}
    meta = {k: v for k, v in ckpt.items()
            if k not in ('model', 'optim', 'config')}
    if meta:
        out['meta'] = meta
    return out


def init_tts_model_from_checkpoint(path: Union[str, Path]
                                   ) -> Tuple[Any, Dict[str, Any], Dict[str, Any]]:
    """(model, variables, checkpoint) from any supported checkpoint file."""
    from forwardtacotron_tpu.models.registry import init_tts_model
    checkpoint = load_checkpoint(path)
    model = init_tts_model(checkpoint['config'])
    return model, checkpoint['variables'], checkpoint
