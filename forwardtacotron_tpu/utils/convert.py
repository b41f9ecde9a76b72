"""PyTorch state_dict -> flax variables converter.

Ingests reference checkpoints (utils/checkpoints.py:13-23 format: a torch
``.pt`` with {'model': state_dict, 'config': dict, ...}) and emits the flax
variable tree for the TPU models. The mapping is mechanical because module
names in this package mirror the reference's attribute names:

  torch                              flax
  -----                              ----
  a.b.weight           (conv, 3D) -> params/a/b/kernel, transposed (K,I,O)
  a.b.weight         (linear, 2D) -> params/a/b/kernel, transposed (I,O)
  a.embedding.weight             -> params/a/embedding/embedding (no T)
  a.bnorm.weight / .bias          -> params/a/bnorm/{scale,bias}
  a.bnorm.running_{mean,var}      -> batch_stats/a/bnorm/{mean,var}
  rnn.weight_ih_l0[_reverse]      -> rnn/{fwd,bwd}/wi, transposed; same for
                                     hh/bias pairs (GRU 3H / LSTM 4H rows,
                                     torch gate order preserved)
  cell.weight_ih (GRU/LSTMCell)   -> cell/{wi,wh,bi,bh}
  self_attn.in_proj_weight (3D,D) -> {q,k,v}_proj/kernel (row-split + T)
  self_attn.out_proj.*            -> out_proj/*
  norm*.weight (LayerNorm, 1D)    -> norm*/scale
  pos_encoder.scale               -> pos_encoder/scale
  ModuleList index 'xs.0.'        -> 'xs_0/'
  buffers step/r/stop_threshold/pe -> returned in the aux dict
"""

from typing import Any, Dict, List, Tuple

import numpy as np

RNN_SEQ_KEYS = {'weight_ih': 'wi', 'weight_hh': 'wh',
                'bias_ih': 'bi', 'bias_hh': 'bh'}


def _merge_digit_parts(parts: List[str]) -> List[str]:
    merged = []
    for p in parts:
        if p.isdigit() and merged:
            merged[-1] = f'{merged[-1]}_{p}'
        else:
            merged.append(p)
    return merged


def _set_path(tree: Dict, path: List[str], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_state_dict(state_dict: Dict[str, Any]
                       ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Returns ({'params': ..., 'batch_stats': ...}, aux_buffers)."""
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}
    aux: Dict[str, np.ndarray] = {}

    for key, tensor in state_dict.items():
        arr = np.asarray(tensor.detach().cpu().numpy()
                         if hasattr(tensor, 'detach') else tensor)
        parts = _merge_digit_parts(key.split('.'))
        leaf = parts[-1]
        prefix = parts[:-1]

        if leaf in ('num_batches_tracked', 'pe'):
            continue
        if leaf in ('step', 'r', 'stop_threshold'):
            aux[key] = arr
            continue

        # sequence RNN: weight_ih_l0, bias_hh_l0_reverse, ...
        handled = False
        for torch_name, flax_name in RNN_SEQ_KEYS.items():
            if leaf.startswith(torch_name + '_l'):
                direction = 'bwd' if leaf.endswith('_reverse') else 'fwd'
                val = arr.T if flax_name in ('wi', 'wh') else arr
                _set_path(params, prefix + [direction, flax_name], val)
                handled = True
                break
            if leaf == torch_name:  # GRUCell / LSTMCell (no _l0 suffix)
                val = arr.T if flax_name in ('wi', 'wh') else arr
                _set_path(params, prefix + [flax_name], val)
                handled = True
                break
        if handled:
            continue

        if leaf == 'in_proj_weight':
            q, k, v = np.split(arr, 3, axis=0)
            for name, w in (('q_proj', q), ('k_proj', k), ('v_proj', v)):
                _set_path(params, prefix + [name, 'kernel'], w.T)
            continue
        if leaf == 'in_proj_bias':
            q, k, v = np.split(arr, 3, axis=0)
            for name, b in (('q_proj', q), ('k_proj', k), ('v_proj', v)):
                _set_path(params, prefix + [name, 'bias'], b)
            continue

        if leaf == 'running_mean':
            _set_path(batch_stats, prefix + ['mean'], arr)
            continue
        if leaf == 'running_var':
            _set_path(batch_stats, prefix + ['var'], arr)
            continue

        if leaf == 'weight':
            if arr.ndim == 3:        # Conv1d [O, I, K] -> [K, I, O]
                _set_path(params, prefix + ['kernel'], arr.transpose(2, 1, 0))
            elif arr.ndim == 2:
                if prefix and prefix[-1].endswith('embedding'):
                    _set_path(params, prefix + ['embedding'], arr)
                else:                # Linear [O, I] -> [I, O]
                    _set_path(params, prefix + ['kernel'], arr.T)
            else:                    # BatchNorm / LayerNorm gain
                _set_path(params, prefix + ['scale'], arr)
            continue
        if leaf == 'bias':
            _set_path(params, prefix + ['bias'], arr)
            continue
        if leaf == 'scale':          # PositionalEncoding learned scale
            _set_path(params, prefix + ['scale'], arr)
            continue

        raise ValueError(f'Unrecognized state_dict key: {key} '
                         f'(shape {arr.shape})')

    variables: Dict[str, Any] = {'params': params}
    if batch_stats:
        variables['batch_stats'] = batch_stats
    return variables, aux


def _tree_paths(tree: Dict, prefix=()) -> Dict[tuple, tuple]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_tree_paths(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = tuple(np.shape(v))
    return out


def validate_against(variables: Dict[str, Any],
                     reference_variables: Dict[str, Any]) -> None:
    """Raise with a readable diff if converted tree doesn't match a fresh
    ``model.init`` tree in structure and shapes."""
    for col in reference_variables:
        got = _tree_paths(variables.get(col, {}))
        want = _tree_paths(_to_plain_dict(reference_variables[col]))
        missing = sorted(set(want) - set(got))
        unexpected = sorted(set(got) - set(want))
        mismatched = sorted(p for p in set(got) & set(want)
                            if got[p] != want[p])
        if missing or unexpected or mismatched:
            msg = [f'Converted tree mismatch in collection {col!r}:']
            for p in missing[:20]:
                msg.append(f'  missing:    {"/".join(p)} {want[p]}')
            for p in unexpected[:20]:
                msg.append(f'  unexpected: {"/".join(p)} {got[p]}')
            for p in mismatched[:20]:
                msg.append(f'  shape:      {"/".join(p)} got {got[p]} want {want[p]}')
            raise ValueError('\n'.join(msg))


def _to_plain_dict(tree) -> Dict:
    if hasattr(tree, 'items'):
        return {k: _to_plain_dict(v) for k, v in tree.items()}
    return tree


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference ``.pt`` checkpoint: returns dict with keys
    'model' (state_dict), 'config', optionally 'optim'/meta entries."""
    import torch
    return torch.load(path, map_location='cpu', weights_only=False)
