"""Two-phase jitted synthesis orchestrator for all forward model families.

The reference's ``generate()`` is one eager call (models/forward_tacotron.py
:167-184); under XLA the expanded frame count is data-dependent, so synthesis
splits into (1) a jitted series-prediction phase, (2) a host-side read of the
total frame count, and (3) a jitted decode at a bucket-rounded static length.
Buckets are multiples of 128 frames, so the decode compiles a handful of
times ever, and every compiled shape tiles cleanly onto the MXU.
"""

import math
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from forwardtacotron_tpu.ops.length_regulator import expanded_lengths

Array = jnp.ndarray


def bucket_frames(n: int, bucket: int = 128, max_frames: int = 16384) -> int:
    """Round a frame count up to a bucket boundary to bound jit recompiles."""
    return min(max_frames, int(math.ceil(max(n, 1) / bucket)) * bucket)


class TTSInference:
    """Wraps a (model, variables) pair with the two-phase generate flow.

    Works for ForwardTacotron, FastPitch and their multispeaker variants;
    multispeaker models take ``speaker_emb``. ``pitch_function`` /
    ``energy_function`` mirror the reference's user hooks (gen_forward.py
    :97-99) and run on host arrays between the two phases.
    """

    def __init__(self, model, variables: Dict[str, Any],
                 multispeaker: Optional[bool] = None):
        self.model = model
        self.variables = variables
        if multispeaker is None:
            multispeaker = 'speaker_emb_dims' in type(model).__annotations__ \
                           or hasattr(model, 'speaker_emb_dims')
        self.multispeaker = multispeaker

        if self.multispeaker:
            self._predict = jax.jit(
                lambda v, x, semb, alpha: model.apply(
                    v, x, semb, alpha, method=type(model).predict_series))
        else:
            self._predict = jax.jit(
                lambda v, x, alpha: model.apply(
                    v, x, alpha, method=type(model).predict_series))
        self._decode_cache: Dict[int, Callable] = {}

    def _get_decode(self, max_len: int) -> Callable:
        fn = self._decode_cache.get(max_len)
        if fn is None:
            model = self.model
            if self.multispeaker:
                fn = jax.jit(lambda v, x, semb, d, p, e, pc: model.apply(
                    v, x, semb, d, p, e, pc, max_len,
                    method=type(model).generate))
            else:
                fn = jax.jit(lambda v, x, d, p, e: model.apply(
                    v, x, d, p, e, max_len, method=type(model).generate))
            self._decode_cache[max_len] = fn
        return fn

    def generate(self, x,
                 speaker_emb=None,
                 alpha: float = 1.0,
                 pitch_function: Callable = lambda p: p,
                 energy_function: Callable = lambda e: e
                 ) -> Dict[str, Array]:
        x = jnp.asarray(x)
        if x.ndim == 1:
            x = x[None, :]
        if self.multispeaker:
            semb = jnp.asarray(speaker_emb)
            if semb.ndim == 1:
                semb = semb[None, :]
            series = self._predict(self.variables, x, semb, alpha)
        else:
            series = self._predict(self.variables, x, alpha)

        dur = series['dur']
        pitch = jnp.asarray(pitch_function(series['pitch']))
        energy = jnp.asarray(energy_function(series['energy']))

        mel_lens = expanded_lengths(dur)
        max_len = bucket_frames(int(jnp.max(mel_lens)))
        decode = self._get_decode(max_len)
        if self.multispeaker:
            out = decode(self.variables, x, semb, dur, pitch, energy,
                         series['pitch_cond'])
        else:
            out = decode(self.variables, x, dur, pitch, energy)
        out['mel_len'] = mel_lens
        return out

    def generate_cropped(self, x, **kwargs) -> Dict[str, np.ndarray]:
        """Single-utterance convenience: crops outputs to the true length and
        returns [n_mels, T] numpy mels (the reference's output layout)."""
        out = self.generate(x, **kwargs)
        length = int(out['mel_len'][0])
        return {'mel': np.asarray(out['mel'])[0, :length].T,
                'mel_post': np.asarray(out['mel_post'])[0, :length].T,
                'dur': np.asarray(out['dur'])[0],
                'pitch': np.asarray(out['pitch'])[0],
                'energy': np.asarray(out['energy'])[0]}
