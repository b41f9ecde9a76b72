"""STFT / ISTFT / Griffin-Lim as pure JAX ops (TPU-compatible, jit-able).

Replaces the librosa calls of reference utils/dsp.py:62-94 with XLA-native
signal processing: framing is a strided gather, the FFT runs on-device via
``jnp.fft.rfft``, Griffin-Lim is a ``lax.fori_loop`` with momentum, and
overlap-add uses scatter-add. Conventions match librosa defaults used by the
reference: center=True with reflect padding, periodic Hann window,
``n_frames = 1 + len(y) // hop`` and magnitude (power=1) spectrograms.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window (matches scipy.signal.get_window('hann', N, fftbins=True))."""
    n = np.arange(win_length)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    return jnp.asarray(w, dtype=dtype)


def _pad_center(window: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    pad = n_fft - window.shape[0]
    return jnp.pad(window, (pad // 2, pad - pad // 2))


def frame_signal(y: jnp.ndarray, frame_length: int, hop_length: int) -> jnp.ndarray:
    """Strided framing: [n] -> [n_frames, frame_length]."""
    n_frames = 1 + (y.shape[-1] - frame_length) // hop_length
    starts = jnp.arange(n_frames) * hop_length
    idx = starts[:, None] + jnp.arange(frame_length)[None, :]
    return y[idx]


@partial(jax.jit, static_argnames=('n_fft', 'hop_length', 'win_length', 'center'))
def stft(y: jnp.ndarray,
         n_fft: int,
         hop_length: int,
         win_length: int,
         center: bool = True) -> jnp.ndarray:
    """Complex STFT of a 1-D signal -> [1 + n_fft//2, n_frames]."""
    window = _pad_center(hann_window(win_length, y.dtype), n_fft)
    if center:
        y = jnp.pad(y, (n_fft // 2, n_fft // 2), mode='reflect')
    frames = frame_signal(y, n_fft, hop_length) * window[None, :]
    return jnp.fft.rfft(frames, n=n_fft, axis=-1).T


@partial(jax.jit, static_argnames=('n_fft', 'hop_length', 'win_length', 'center'))
def stft_magnitude(y: jnp.ndarray,
                   n_fft: int,
                   hop_length: int,
                   win_length: int,
                   center: bool = True) -> jnp.ndarray:
    return jnp.abs(stft(y, n_fft, hop_length, win_length, center))


@partial(jax.jit, static_argnames=('n_fft', 'hop_length', 'win_length', 'length'))
def istft(spec: jnp.ndarray,
          n_fft: int,
          hop_length: int,
          win_length: int,
          length: int | None = None) -> jnp.ndarray:
    """Inverse STFT via windowed overlap-add with squared-window normalization.

    ``spec`` is complex [1 + n_fft//2, n_frames]; output is the center-trimmed
    signal (the n_fft//2 padding of the forward transform is removed).
    """
    window = _pad_center(hann_window(win_length, jnp.float32), n_fft)
    frames = jnp.fft.irfft(spec.T, n=n_fft, axis=-1) * window[None, :]
    n_frames = frames.shape[0]
    total = n_fft + hop_length * (n_frames - 1)

    starts = jnp.arange(n_frames) * hop_length
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    signal = jnp.zeros(total, frames.dtype).at[idx.reshape(-1)].add(frames.reshape(-1))
    win_sq = jnp.zeros(total, jnp.float32).at[idx.reshape(-1)].add(
        jnp.broadcast_to(window[None, :] ** 2, (n_frames, n_fft)).reshape(-1))
    signal = signal / jnp.maximum(win_sq, 1e-10)

    signal = signal[n_fft // 2: total - n_fft // 2]
    if length is not None:
        signal = signal[:length]
    return signal


@partial(jax.jit, static_argnames=('n_fft', 'hop_length', 'win_length', 'n_iter'))
def griffin_lim(magnitude: jnp.ndarray,
                key: jax.Array,
                n_fft: int,
                hop_length: int,
                win_length: int,
                n_iter: int = 32,
                momentum: float = 0.99) -> jnp.ndarray:
    """Griffin-Lim phase reconstruction with momentum (librosa-style).

    ``magnitude`` is [1 + n_fft//2, n_frames] (power=1). The iteration runs
    fully on-device as a ``lax.fori_loop``; each step is ISTFT -> STFT ->
    phase projection with momentum acceleration.
    """
    angles = jnp.exp(2j * jnp.pi * jax.random.uniform(key, magnitude.shape))
    magnitude = magnitude.astype(jnp.complex64)

    def project(angles):
        inverse = istft(magnitude * angles, n_fft, hop_length, win_length)
        rebuilt = stft(inverse, n_fft, hop_length, win_length)
        return rebuilt

    def body(_, carry):
        angles, tprev = carry
        rebuilt = project(angles)
        update = rebuilt - (momentum / (1 + momentum)) * tprev
        angles = update / jnp.maximum(jnp.abs(update), 1e-16)
        return angles, rebuilt

    angles, _ = jax.lax.fori_loop(0, n_iter, body,
                                  (angles, jnp.zeros_like(magnitude)))
    return istft(magnitude * angles, n_fft, hop_length, win_length)
