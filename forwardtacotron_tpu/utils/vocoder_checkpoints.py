"""Published vocoder checkpoint ingestion: torch -> flax.

Loads the public HiFi-GAN (jik876/hifigan ``generator_*`` files, state dict
under a ``'generator'`` key) and MelGAN (seungwonpark/melgan ``nvidia_tacotron2
_LJ11_epoch6400.pt``-style files, state dict under ``'model_g'``) checkpoints
into the flax generators in models/vocoder.py. The reference repo never loads
these weights itself — it exports mels for them (reference
gen_forward.py:108-116) — so this converter is what lets the full
text->waveform path run on-chip here.

Both repos train with ``torch.nn.utils.weight_norm`` on every conv; the
weights are stored factored as (weight_g, weight_v) — or, from newer torch,
``parametrizations.weight.original0/original1``. Inference does not need the
factoring, so it is folded here: W = g * v / ||v|| with the norm taken over
all axes except 0 (torch's default dim=0).

Layout conversions into the channels-last flax modules:
- Conv1d  [C_out, C_in, K]      -> kernel [K, C_in, C_out] (transpose 2,1,0)
- ConvTranspose1d [C_in, C_out, K] -> kernel [K, C_in, C_out], time-FLIPPED
  (models/vocoder.py stores the transposed-conv kernel pre-flipped so the
  call is one input-dilated conv_general_dilated)
"""

from typing import Any, Dict, Optional, Tuple

import numpy as np


def _load_torch_state(path: str) -> Dict[str, np.ndarray]:
    import torch
    data = torch.load(path, map_location='cpu', weights_only=False)
    if isinstance(data, dict):
        for key in ('generator', 'model_g', 'model', 'state_dict'):
            if key in data and isinstance(data[key], dict):
                data = data[key]
                break
    return {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, 'detach')
                          else v) for k, v in data.items()}


def fold_weight_norm(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Collapse (weight_g, weight_v) / parametrizations pairs to 'weight'."""
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.endswith('weight_g') or k.endswith(
                'parametrizations.weight.original0'):
            continue
        if k.endswith('weight_v'):
            base = k[:-len('_v')]
            g = sd[base + '_g']
            out[k[:-len('weight_v')] + 'weight'] = _fold(g, v)
        elif k.endswith('parametrizations.weight.original1'):
            prefix = k[:-len('parametrizations.weight.original1')]
            g = sd[prefix + 'parametrizations.weight.original0']
            out[prefix + 'weight'] = _fold(g, v)
        else:
            out[k] = v
    return out


def _fold(g: np.ndarray, v: np.ndarray) -> np.ndarray:
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt(np.sum(np.square(v), axis=axes, keepdims=True))
    return (g * v / norm).astype(v.dtype)


def _conv(sd: Dict[str, np.ndarray], torch_name: str) -> Dict[str, Any]:
    w = sd[f'{torch_name}.weight']
    entry = {'conv': {'kernel': np.ascontiguousarray(w.transpose(2, 1, 0))}}
    if f'{torch_name}.bias' in sd:
        entry['conv']['bias'] = sd[f'{torch_name}.bias']
    return entry


def _conv_transpose(sd: Dict[str, np.ndarray], torch_name: str
                    ) -> Dict[str, Any]:
    w = sd[f'{torch_name}.weight']  # [C_in, C_out, K]
    kernel = np.ascontiguousarray(w.transpose(2, 0, 1)[::-1])
    entry = {'kernel': kernel}
    if f'{torch_name}.bias' in sd:
        entry['bias'] = sd[f'{torch_name}.bias']
    return entry


def convert_hifigan_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """jik876/hifigan Generator state_dict -> flax params tree."""
    sd = fold_weight_norm(sd)
    params: Dict[str, Any] = {
        'conv_pre': _conv(sd, 'conv_pre'),
        'conv_post': _conv(sd, 'conv_post'),
    }
    i = 0
    while f'ups.{i}.weight' in sd:
        params[f'ups_{i}'] = _conv_transpose(sd, f'ups.{i}')
        i += 1
    r = 0
    while (f'resblocks.{r}.convs1.0.weight' in sd
           or f'resblocks.{r}.convs.0.weight' in sd):
        block: Dict[str, Any] = {}
        if f'resblocks.{r}.convs1.0.weight' in sd:  # ResBlock1
            j = 0
            while f'resblocks.{r}.convs1.{j}.weight' in sd:
                block[f'convs1_{j}'] = _conv(sd, f'resblocks.{r}.convs1.{j}')
                block[f'convs2_{j}'] = _conv(sd, f'resblocks.{r}.convs2.{j}')
                j += 1
        else:  # ResBlock2
            j = 0
            while f'resblocks.{r}.convs.{j}.weight' in sd:
                block[f'convs_{j}'] = _conv(sd, f'resblocks.{r}.convs.{j}')
                j += 1
        params[f'resblocks_{r}'] = block
        r += 1
    return params


# torch Sequential indices in seungwonpark/melgan's Generator.generator
_MELGAN_UPS = {3: 0, 6: 1, 9: 2, 12: 3}
_MELGAN_RES = {4: 0, 7: 1, 10: 2, 13: 3}


def convert_melgan_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """seungwonpark/melgan Generator state_dict -> flax params tree."""
    sd = fold_weight_norm(sd)
    sd = {k[len('generator.'):] if k.startswith('generator.') else k: v
          for k, v in sd.items()}
    params: Dict[str, Any] = {
        'conv_pre': _conv(sd, '1'),
        'conv_post': _conv(sd, '16'),
    }
    for seq_idx, i in _MELGAN_UPS.items():
        params[f'ups_{i}'] = _conv_transpose(sd, str(seq_idx))
    for seq_idx, i in _MELGAN_RES.items():
        stack: Dict[str, Any] = {}
        for j in range(3):
            stack[f'blocks_conv1_{j}'] = _conv(sd, f'{seq_idx}.blocks.{j}.2')
            stack[f'blocks_conv2_{j}'] = _conv(sd, f'{seq_idx}.blocks.{j}.4')
            stack[f'shortcuts_{j}'] = _conv(sd, f'{seq_idx}.shortcuts.{j}')
        params[f'res_{i}'] = stack
    return params


def load_hifigan(path: str, config: Optional[dict] = None,
                 dtype: Any = None) -> Tuple[Any, Dict[str, Any]]:
    """Load a published HiFi-GAN generator checkpoint.

    ``config``: the official config.json dict (resblock/upsample_* keys); the
    v1 defaults are used when omitted. Returns (module, variables).
    """
    import jax.numpy as jnp
    from forwardtacotron_tpu.models.vocoder import HiFiGANGenerator
    model = HiFiGANGenerator.from_config(config or {},
                                         dtype=dtype or jnp.float32)
    params = convert_hifigan_state_dict(_load_torch_state(path))
    return model, {'params': params}


def load_melgan(path: str, dtype: Any = None) -> Tuple[Any, Dict[str, Any]]:
    """Load a published seungwonpark/melgan generator checkpoint."""
    import jax.numpy as jnp
    from forwardtacotron_tpu.models.vocoder import MelGANGenerator
    model = MelGANGenerator(dtype=dtype or jnp.float32)
    params = convert_melgan_state_dict(_load_torch_state(path))
    return model, {'params': params}
