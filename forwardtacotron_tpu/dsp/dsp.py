"""Config-driven DSP: wav IO, log-mel extraction, Griffin-Lim, silence trims.

API parity with reference utils/dsp.py:11-128 (load_wav/save_wav/wav_to_mel/
griffinlim/normalize/denormalize/trim_silence/trim_long_silences), with the
compute paths rebuilt on JAX: mel extraction is STFT -> mel-matmul (MXU) ->
clip(1e-5) -> log, Griffin-Lim runs as an on-device fori_loop, and mel
inversion uses pinv-init + multiplicative-update NNLS refinement instead of
librosa's host NNLS. WAV IO uses scipy (soundfile/librosa are not required).
"""

from functools import partial
from pathlib import Path
from typing import Any, Dict, Union

import jax
import jax.numpy as jnp
import numpy as np

from forwardtacotron_tpu.dsp.mel import mel_filterbank
from forwardtacotron_tpu.ops.stft import (griffin_lim,
                                          griffin_lim_pair, stft_magnitude)

LOG_MEL_FLOOR = 1e-5                 # clip floor (reference utils/dsp.py:97)
PAD_VALUE = float(np.log(LOG_MEL_FLOOR))   # -11.5129...


class DSP:

    def __init__(self,
                 num_mels: int,
                 sample_rate: int,
                 hop_length: int,
                 win_length: int,
                 n_fft: int,
                 fmin: float,
                 fmax: float,
                 peak_norm: bool = False,
                 trim_start_end_silence: bool = True,
                 trim_silence_top_db: int = 60,
                 trim_long_silences: bool = False,
                 vad_sample_rate: int = 16000,
                 vad_window_length: float = 30,
                 vad_moving_average_width: float = 8,
                 vad_max_silence_length: int = 12,
                 **kwargs: Any) -> None:
        self.n_mels = num_mels
        self.sample_rate = sample_rate
        self.hop_length = hop_length
        self.win_length = win_length
        self.n_fft = n_fft
        self.fmin = fmin
        self.fmax = fmax

        self.should_peak_norm = peak_norm
        self.should_trim_start_end_silence = trim_start_end_silence
        self.should_trim_long_silences = trim_long_silences
        self.trim_silence_top_db = trim_silence_top_db

        self.vad_sample_rate = vad_sample_rate
        self.vad_window_length = vad_window_length
        self.vad_moving_average_width = vad_moving_average_width
        self.vad_max_silence_length = vad_max_silence_length

        self.mel_basis = jnp.asarray(
            mel_filterbank(sample_rate, n_fft, num_mels, fmin, fmax))
        self._mel_pinv = jnp.asarray(
            np.linalg.pinv(np.asarray(self.mel_basis)))

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> 'DSP':
        return cls(**config['dsp'])

    # ------------------------------------------------------------------ wav io

    def load_wav(self, path: Union[str, Path]) -> np.ndarray:
        sr, wav = _read_audio(path)
        if wav.dtype == np.int16:
            wav = wav.astype(np.float32) / 32768.0
        elif wav.dtype == np.int32:
            wav = wav.astype(np.float32) / 2147483648.0
        elif wav.dtype == np.uint8:
            wav = (wav.astype(np.float32) - 128.0) / 128.0
        else:
            wav = wav.astype(np.float32)
        if wav.ndim > 1:
            wav = wav.mean(axis=-1)
        if sr != self.sample_rate:
            wav = resample(wav, sr, self.sample_rate)
        return wav

    def save_wav(self, wav: np.ndarray, path: Union[str, Path]) -> None:
        from scipy.io import wavfile
        wav = np.asarray(wav, dtype=np.float32)
        wav = np.clip(wav, -1.0, 1.0)
        wavfile.write(str(path), self.sample_rate,
                      (wav * 32767).astype(np.int16))

    # ------------------------------------------------------------- mel extract

    @partial(jax.jit, static_argnames=('self', 'normalize'))
    def _wav_to_mel_jax(self, y: jnp.ndarray, normalize: bool = True) -> jnp.ndarray:
        spec = stft_magnitude(y, self.n_fft, self.hop_length, self.win_length)
        mel = self.mel_basis @ spec
        if normalize:
            mel = jnp.log(jnp.clip(mel, min=LOG_MEL_FLOOR))
        return mel

    def wav_to_mel(self, y: np.ndarray, normalize: bool = True) -> np.ndarray:
        return np.asarray(self._wav_to_mel_jax(jnp.asarray(y), normalize))

    def normalize(self, mel: np.ndarray) -> np.ndarray:
        return np.log(np.clip(mel, a_min=LOG_MEL_FLOOR, a_max=None))

    def denormalize(self, mel: np.ndarray) -> np.ndarray:
        return np.exp(mel)

    # -------------------------------------------------------------- griffinlim

    @partial(jax.jit, static_argnames=('self', 'nnls_iter'))
    def _mel_to_stft_jax(self, mel_power: jnp.ndarray, nnls_iter: int = 8) -> jnp.ndarray:
        """Approximate linear spectrogram from mel: pinv init + NNLS refinement.

        Multiplicative updates ``S <- S * (M^T mel) / (M^T M S)`` keep S
        non-negative and run entirely as MXU matmuls.
        """
        s = jnp.maximum(self._mel_pinv @ mel_power, 0.0)

        def body(_, s):
            num = self.mel_basis.T @ mel_power
            den = self.mel_basis.T @ (self.mel_basis @ s)
            return s * num / jnp.maximum(den, 1e-10)

        return jax.lax.fori_loop(0, nnls_iter, body, s)

    def griffinlim(self, mel: np.ndarray, n_iter: int = 32, seed: int = 0) -> np.ndarray:
        """Log-mel -> waveform (reference utils/dsp.py:80-94)."""
        mel_power = jnp.exp(jnp.asarray(mel))
        linear = self._mel_to_stft_jax(mel_power)
        key = jax.random.PRNGKey(seed)
        # complex-free DFT-matmul Griffin-Lim: same algorithm/phase init as
        # ops.stft.griffin_lim (tracks it to ~3e-5) but every iteration is
        # MXU matmuls + reshapes — measured several times faster than the
        # rfft/scatter formulation on TPU, and avoids complex64 transfers.
        # The pair path's strided-reshape overlap-add needs hop | n_fft;
        # configs with a non-dividing hop (e.g. 2048/275) take the rfft
        # formulation instead of asserting at trace time (ADVICE r3).
        if self.n_fft % self.hop_length == 0:
            if self._gl_fused_usable(linear.shape[1]):
                # fused per-iteration Pallas kernel: one dispatch per GL
                # iteration, frames VMEM-resident — 2.3x the pair path on
                # v5e (104 vs 239 ms, GL-32 batch 64 x 10 s) at f32, so it
                # tracks the pair trajectory (ops/pallas/griffin_lim.py)
                from forwardtacotron_tpu.ops.pallas.griffin_lim import \
                    griffin_lim_fused
                wav = griffin_lim_fused(
                    linear[None], key[None], self.n_fft, self.hop_length,
                    self.win_length, n_iter=n_iter)[0]
            else:
                wav = griffin_lim_pair(linear, key, self.n_fft,
                                       self.hop_length, self.win_length,
                                       n_iter=n_iter)
        else:
            wav = griffin_lim(linear, key, self.n_fft, self.hop_length,
                              self.win_length, n_iter=n_iter)
        return np.asarray(wav)

    def _gl_fused_usable(self, n_frames: int) -> bool:
        import jax as _jax
        from forwardtacotron_tpu.ops.pallas.rnn import interpret_forced
        if n_frames < 2 * (self.n_fft // self.hop_length):
            return False
        if (self.n_fft // self.hop_length - 1) > 8:
            return False
        return _jax.default_backend() == 'tpu' or interpret_forced()

    # ------------------------------------------------------------------- trims

    def trim_silence(self, wav: np.ndarray,
                     frame_length: int = 2048, hop_length: int = 512) -> np.ndarray:
        """Trim leading/trailing silence by frame RMS threshold relative to peak
        (equivalent to librosa.effects.trim(top_db=...) used at reference
        utils/dsp.py:103-104)."""
        if len(wav) < frame_length:
            return wav
        pad = frame_length // 2
        y = np.pad(wav, (pad, pad), mode='constant')
        n_frames = 1 + (len(y) - frame_length) // hop_length
        idx = (np.arange(n_frames)[:, None] * hop_length
               + np.arange(frame_length)[None, :])
        rms = np.sqrt(np.mean(y[idx] ** 2, axis=1))
        ref = rms.max()
        if ref <= 0:
            return wav
        db = 20.0 * np.log10(np.maximum(rms, 1e-10) / ref)
        nonsilent = np.flatnonzero(db > -self.trim_silence_top_db)
        if len(nonsilent) == 0:
            return wav[:0]
        start = int(nonsilent[0] * hop_length)
        end = min(len(wav), int((nonsilent[-1] + 1) * hop_length))
        return wav[start:end]

    def trim_long_silences(self, wav: np.ndarray) -> np.ndarray:
        """Shorten long interior silences with a VAD mask.

        Uses webrtcvad when installed (reference behavior, utils/dsp.py:107-128);
        otherwise falls back to an energy-based VAD with the same windowing,
        moving-average smoothing and binary dilation.
        """
        samples_per_window = int(
            (self.vad_window_length * self.vad_sample_rate) // 1000)
        ratio = self.sample_rate / self.vad_sample_rate
        wav16 = resample(wav, self.sample_rate, self.vad_sample_rate)
        wav16 = wav16[:len(wav16) - (len(wav16) % samples_per_window)]
        if len(wav16) == 0:
            return wav

        n_windows = len(wav16) // samples_per_window
        frames = wav16[:n_windows * samples_per_window].reshape(
            n_windows, samples_per_window)
        voice_flags = self._vad_flags(frames)

        width = int(self.vad_moving_average_width)
        padded = np.concatenate([np.zeros((width - 1) // 2), voice_flags,
                                 np.zeros(width // 2)])
        csum = np.cumsum(np.concatenate([[0.0], padded]))
        smoothed = (csum[width:] - csum[:-width]) / width
        mask = np.round(smoothed).astype(bool)
        mask = _binary_dilation(mask, self.vad_max_silence_length + 1)

        sample_mask = np.repeat(mask, samples_per_window)
        # map the 16k-domain mask back to the native sample rate
        keep = np.repeat(sample_mask, int(round(ratio)))[:len(wav)]
        if len(keep) < len(wav):
            keep = np.concatenate([keep, np.ones(len(wav) - len(keep), bool)])
        return wav[keep]

    def _vad_flags(self, frames: np.ndarray) -> np.ndarray:
        try:
            import webrtcvad
            vad = webrtcvad.Vad(mode=3)
            pcm = (np.clip(frames, -1, 1) * 32767).astype(np.int16)
            return np.array([vad.is_speech(f.tobytes(), self.vad_sample_rate)
                             for f in pcm], dtype=float)
        except ImportError:
            rms = np.sqrt(np.mean(frames ** 2, axis=1))
            ref = rms.max()
            if ref <= 0:
                return np.ones(len(frames))
            db = 20.0 * np.log10(np.maximum(rms, 1e-10) / ref)
            return (db > -40.0).astype(float)


def _read_audio(path: Union[str, Path]):
    """Read an audio file: scipy for .wav, soundfile (if installed) for
    everything else (e.g. VCTK's .flac)."""
    path = str(path)
    if path.lower().endswith('.wav'):
        from scipy.io import wavfile
        return wavfile.read(path)
    try:
        import soundfile as sf
    except ImportError as e:
        raise RuntimeError(
            f'Reading {path} requires the soundfile package '
            '(only .wav is supported without it)') from e
    wav, sr = sf.read(path, dtype='float32')
    return sr, wav


def resample(wav: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resampling (scipy) — replaces librosa.load's resampler."""
    if orig_sr == target_sr:
        return wav
    from math import gcd
    from scipy.signal import resample_poly
    g = gcd(int(orig_sr), int(target_sr))
    return resample_poly(wav, target_sr // g, orig_sr // g).astype(np.float32)


def _binary_dilation(mask: np.ndarray, width: int) -> np.ndarray:
    """1-D binary dilation with a flat structuring element of ``width`` ones."""
    from scipy.ndimage import binary_dilation
    return binary_dilation(mask, np.ones(width))
