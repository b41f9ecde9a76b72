"""STFT / ISTFT / Griffin-Lim as pure JAX ops (TPU-compatible, jit-able).

Replaces the librosa calls of reference utils/dsp.py:62-94 with XLA-native
signal processing: framing is a strided gather, the FFT runs on-device via
``jnp.fft.rfft``, Griffin-Lim is a ``lax.fori_loop`` with momentum, and
overlap-add uses scatter-add. Conventions match librosa defaults used by the
reference: center=True with reflect padding, periodic Hann window,
``n_frames = 1 + len(y) // hop`` and magnitude (power=1) spectrograms.
"""

from functools import lru_cache, partial

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


# --------------------------------------------------------- MXU fast path
# Complex-free STFT/ISTFT: DFT as two real matmuls + framing/overlap-add as
# hop-strided reshapes. On TPU this beats the rfft lowering ~2-6x at
# synthesis shapes (jnp.fft runs far off the MXU; measured n_fft=1024,
# 64 x 10 s batch on v5e: rfft 20.3 ms vs DFT-matmul 10.8 ms, and istft's
# scatter-add overlap-add 39 ms vs reshape-OLA a few ms), avoids complex64
# entirely (which some transports cannot even transfer), and keeps
# Griffin-Lim — the user-facing gen_forward.py vocoder — on the MXU.
# The rfft-based stft/istft above stay the parity reference; preprocessing
# (wav_to_mel golden tests at 1e-5) keeps using them.


@lru_cache(maxsize=8)
def _dft_matrices(n_fft: int):
    """Forward DFT (cos, -sin) [n_fft, n_bins] and inverse real-synthesis
    bases [n_bins, n_fft] (irfft weights folded: DC/Nyquist once, others
    twice)."""
    bins = n_fft // 2 + 1
    k = np.arange(n_fft)[:, None] * np.arange(bins)[None, :] \
        * (2.0 * np.pi / n_fft)
    fwd_re = np.cos(k).astype(np.float32)
    fwd_im = (-np.sin(k)).astype(np.float32)
    w = np.full(bins, 2.0 / n_fft, np.float64)
    w[0] = w[-1] = 1.0 / n_fft
    inv_re = (np.cos(k.T) * w[:, None]).astype(np.float32)
    inv_im = (-np.sin(k.T) * w[:, None]).astype(np.float32)
    return fwd_re, fwd_im, inv_re, inv_im


def _frame_by_reshape(y: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """[S] (center-padded) -> [F, n_fft] via n_fft/hop strided reshapes —
    no gather. Requires hop | n_fft."""
    s = y.shape[-1]
    f = 1 + (s - n_fft) // hop
    chunks = [jax.lax.dynamic_slice(y, (j * hop,), (f * hop,)).reshape(f, hop)
              for j in range(n_fft // hop)]
    return jnp.concatenate(chunks, axis=1)


def _dot_f32(a: jnp.ndarray, b: jnp.ndarray,
             compute_dtype=None) -> jnp.ndarray:
    """a @ b with optional reduced-precision multiplies (bf16) and f32
    accumulation on the MXU — f32 multiplies run at ~1/4 the bf16 rate on
    v5e, and the DFT matmuls dominate the fast STFT/ISTFT path."""
    if compute_dtype is not None:
        a = a.astype(compute_dtype)
        b = b.astype(compute_dtype)
    return jax.lax.dot_general(a, b, (((a.ndim - 1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=('n_fft', 'hop_length', 'win_length',
                                   'center', 'compute_dtype'))
def stft_pair(y: jnp.ndarray, n_fft: int, hop_length: int, win_length: int,
              center: bool = True, compute_dtype=None):
    """STFT of a 1-D signal as a real pair: -> (re, im), each
    [n_frames, 1 + n_fft//2] (frames-major: the GL/vocode loops keep this
    layout; transpose once if the librosa [bins, frames] layout is needed).

    ``compute_dtype=jnp.bfloat16`` runs the DFT matmuls in bf16 with f32
    accumulation. Measured on v5e (GL-32, batch 64 x 10 s): bf16 is
    quality-neutral (spectral convergence 0.07846 for BOTH) and exactly
    speed-neutral (237 vs 238 ms) — the pair path is framing/OLA/phase
    glue-bound, not f32-MXU-bound, so feature extraction and Griffin-Lim
    both keep the f32 default; the option stays for hardware where f32
    matmul throughput is the constraint.
    """
    assert n_fft % hop_length == 0, 'fast path requires hop | n_fft'
    window = _pad_center(hann_window(win_length, jnp.float32), n_fft)
    if center:
        y = jnp.pad(y, (n_fft // 2, n_fft // 2), mode='reflect')
    frames = _frame_by_reshape(y, n_fft, hop_length) * window[None, :]
    fwd_re, fwd_im, _, _ = _dft_matrices(n_fft)
    return (_dot_f32(frames, jnp.asarray(fwd_re), compute_dtype),
            _dot_f32(frames, jnp.asarray(fwd_im), compute_dtype))


@lru_cache(maxsize=32)
def _ola_win_sq(n_fft: int, hop: int, n_frames: int,
                win_length: int) -> np.ndarray:
    """Squared-window overlap-add normalizer — a trace-time constant
    (pure numpy: torch-convention periodic Hann, matching hann_window)."""
    win = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(win_length)
                              / win_length))
    lpad = (n_fft - win_length) // 2
    window = np.zeros(n_fft, np.float64)
    window[lpad:lpad + win_length] = win
    window = window ** 2
    total = n_fft + hop * (n_frames - 1)
    acc = np.zeros(total, np.float32)
    for f in range(n_frames):
        acc[f * hop: f * hop + n_fft] += window
    return np.maximum(acc, 1e-10)


@partial(jax.jit, static_argnames=('n_fft', 'hop_length', 'win_length',
                                   'length', 'compute_dtype'))
def istft_pair(re: jnp.ndarray, im: jnp.ndarray, n_fft: int,
               hop_length: int, win_length: int,
               length: int | None = None,
               compute_dtype=None) -> jnp.ndarray:
    """Inverse of :func:`stft_pair`: (re, im) [n_frames, bins] -> signal.

    IDFT as two real matmuls; overlap-add as n_fft/hop shifted
    reshape-pads summed (no scatter); squared-window normalization baked
    as a constant. ``compute_dtype``: see :func:`stft_pair` (the OLA and
    normalization stay f32 either way)."""
    assert n_fft % hop_length == 0, 'fast path requires hop | n_fft'
    _, _, inv_re, inv_im = _dft_matrices(n_fft)
    frames = _dot_f32(re, jnp.asarray(inv_re), compute_dtype) \
        + _dot_f32(im, jnp.asarray(inv_im), compute_dtype)
    window = _pad_center(hann_window(win_length, jnp.float32), n_fft)
    frames = frames * window[None, :]

    f = frames.shape[0]
    hop = hop_length
    total = n_fft + hop * (f - 1)
    signal = jnp.zeros(total, frames.dtype)
    for j in range(n_fft // hop):
        part = frames[:, j * hop:(j + 1) * hop].reshape(f * hop)
        signal = signal + jnp.pad(part,
                                  (j * hop, total - j * hop - f * hop))
    signal = signal / jnp.asarray(_ola_win_sq(n_fft, hop, f, win_length))
    signal = signal[n_fft // 2: total - n_fft // 2]
    if length is not None:
        signal = signal[:length]
    return signal


@partial(jax.jit, static_argnames=('n_fft', 'hop_length', 'win_length',
                                   'n_iter', 'compute_dtype'))
def griffin_lim_pair(magnitude: jnp.ndarray,
                     key: jax.Array,
                     n_fft: int,
                     hop_length: int,
                     win_length: int,
                     n_iter: int = 32,
                     momentum: float = 0.99,
                     compute_dtype=None) -> jnp.ndarray:
    """Griffin-Lim on the complex-free fast path; same algorithm (momentum
    acceleration, librosa-style) as :func:`griffin_lim` but every iteration
    is matmuls + reshapes on the MXU. ``magnitude`` is [bins, n_frames]
    (the griffin_lim layout). ``compute_dtype=jnp.bfloat16`` runs the
    per-iteration DFT matmuls split-precision (bf16 multiply, f32
    accumulate); the phase normalization, OLA and the final synthesis
    ISTFT stay f32."""
    mag = magnitude.T                                    # frames-major
    # draw phases in [bins, frames] so the same key gives the same init as
    # griffin_lim (bit-comparable trajectories up to f32 rounding)
    phase = 2.0 * jnp.pi * jax.random.uniform(key, magnitude.shape).T
    ang_re, ang_im = jnp.cos(phase), jnp.sin(phase)

    def project(ang_re, ang_im):
        inverse = istft_pair(mag * ang_re, mag * ang_im, n_fft, hop_length,
                             win_length, compute_dtype=compute_dtype)
        return stft_pair(inverse, n_fft, hop_length, win_length,
                         compute_dtype=compute_dtype)

    def body(_, carry):
        ang_re, ang_im, tp_re, tp_im = carry
        rb_re, rb_im = project(ang_re, ang_im)
        up_re = rb_re - (momentum / (1 + momentum)) * tp_re
        up_im = rb_im - (momentum / (1 + momentum)) * tp_im
        mod = jnp.maximum(jnp.sqrt(up_re ** 2 + up_im ** 2), 1e-16)
        return up_re / mod, up_im / mod, rb_re, rb_im

    zeros = jnp.zeros_like(mag)
    ang_re, ang_im, _, _ = jax.lax.fori_loop(
        0, n_iter, body, (ang_re, ang_im, zeros, zeros))
    return istft_pair(mag * ang_re, mag * ang_im, n_fft, hop_length,
                      win_length)
