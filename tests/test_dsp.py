"""DSP tests: STFT parity vs torch.stft, mel filterbank properties,
ISTFT round-trip, Griffin-Lim reconstruction quality, trims, wav IO."""

import numpy as np
import pytest

from forwardtacotron_tpu.dsp.dsp import DSP, PAD_VALUE, resample
from forwardtacotron_tpu.dsp.mel import (hz_to_mel, mel_filterbank,
                                         mel_frequencies, mel_to_hz)
from forwardtacotron_tpu.ops.stft import istft, stft, stft_magnitude

DSP_KW = dict(num_mels=80, sample_rate=22050, hop_length=256, win_length=1024,
              n_fft=1024, fmin=0, fmax=8000, peak_norm=False,
              trim_start_end_silence=True, trim_silence_top_db=60,
              trim_long_silences=False)


def _test_signal(n=22050, sr=22050):
    t = np.arange(n) / sr
    return (0.5 * np.sin(2 * np.pi * 220 * t)
            + 0.3 * np.sin(2 * np.pi * 440 * t)
            + 0.05 * np.random.RandomState(0).randn(n)).astype(np.float32)


def test_stft_magnitude_matches_torch():
    import torch
    y = _test_signal()
    mag = np.asarray(stft_magnitude(y, 1024, 256, 1024))
    ref = torch.stft(torch.tensor(y), n_fft=1024, hop_length=256,
                     win_length=1024, window=torch.hann_window(1024),
                     center=True, pad_mode='reflect', return_complex=True)
    ref_mag = ref.abs().numpy()
    assert mag.shape == ref_mag.shape == (513, 1 + len(y) // 256)
    np.testing.assert_allclose(mag, ref_mag, rtol=1e-3, atol=1e-3)


def test_mel_scale_round_trip():
    freqs = np.array([0.0, 200.0, 999.0, 1000.0, 4000.0, 8000.0])
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(freqs)), freqs, rtol=1e-10)


def test_mel_filterbank_properties():
    fb = mel_filterbank(22050, 1024, 80, 0, 8000)
    assert fb.shape == (80, 513)
    assert fb.min() >= 0
    # each filter is a triangle: unimodal with a single peak
    for i in range(80):
        peak = fb[i].argmax()
        assert fb[i, peak] > 0
    # Slaney norm: filter area (integral over Hz) == 1. Narrow low-frequency
    # filters span only ~3 FFT bins, so the discrete integral is crude there;
    # check wide (log-region) filters tightly and narrow ones loosely.
    fft_freqs = np.linspace(0, 22050 / 2, 513)
    mel_f = mel_frequencies(82, 0, 8000)
    for i, tol in [(10, 0.35), (40, 0.1), (70, 0.05)]:
        area = np.trapezoid(fb[i], fft_freqs)
        assert abs(area - 1.0) < tol, (i, area)
    # independent construction: evaluate the triangle formula directly
    i = 40
    left, center, right = mel_f[i], mel_f[i + 1], mel_f[i + 2]
    expected = np.zeros(513)
    up = (fft_freqs - left) / (center - left)
    down = (right - fft_freqs) / (right - center)
    expected = np.maximum(0, np.minimum(up, down)) * 2.0 / (right - left)
    np.testing.assert_allclose(fb[i], expected, atol=1e-6)


def test_istft_round_trip():
    y = _test_signal(8192)
    spec = stft(y, 1024, 256, 1024)
    y2 = np.asarray(istft(spec, 1024, 256, 1024, length=len(y)))
    np.testing.assert_allclose(y2, y, atol=1e-4)


def test_wav_to_mel_shape_and_floor():
    dsp = DSP(**DSP_KW)
    y = np.zeros(22050, np.float32)
    mel = dsp.wav_to_mel(y)
    assert mel.shape == (80, 1 + 22050 // 256)
    # silence hits the log floor = padding value
    np.testing.assert_allclose(mel, PAD_VALUE, atol=1e-4)


def test_griffinlim_reconstruction():
    dsp = DSP(**DSP_KW)
    y = _test_signal()
    mel = dsp.wav_to_mel(y)
    wav = dsp.griffinlim(mel, n_iter=32)
    assert wav.shape[0] > 0.9 * len(y)
    mel2 = dsp.wav_to_mel(wav[:len(y)])
    t = min(mel.shape[1], mel2.shape[1]) - 2
    corr = np.corrcoef(mel[:, :t].ravel(), mel2[:, :t].ravel())[0, 1]
    assert corr > 0.95, corr


def test_trim_silence():
    dsp = DSP(**DSP_KW)
    sr = 22050
    sig = _test_signal(sr)
    wav = np.concatenate([np.zeros(sr // 2, np.float32), sig,
                          np.zeros(sr // 2, np.float32)])
    trimmed = dsp.trim_silence(wav)
    assert len(trimmed) < len(wav)
    assert abs(len(trimmed) - len(sig)) < 4096


def test_trim_long_silences_fallback_vad():
    dsp = DSP(**{**DSP_KW, 'trim_long_silences': True,
                 'vad_sample_rate': 16000, 'vad_window_length': 30,
                 'vad_moving_average_width': 8, 'vad_max_silence_length': 12})
    sr = 22050
    sig = _test_signal(sr)
    wav = np.concatenate([sig, np.zeros(2 * sr, np.float32), sig])
    out = dsp.trim_long_silences(wav)
    assert len(out) < len(wav)
    assert len(out) > 1.5 * sr


def test_wav_io_round_trip(tmp_path):
    dsp = DSP(**DSP_KW)
    y = _test_signal(4096)
    path = tmp_path / 'x.wav'
    dsp.save_wav(y, path)
    y2 = dsp.load_wav(path)
    assert len(y2) == len(y)
    np.testing.assert_allclose(y2, y, atol=1e-3)


def test_resample():
    y = _test_signal(44100, sr=44100)
    y2 = resample(y, 44100, 22050)
    assert abs(len(y2) - 22050) <= 1


def test_dsp_from_reference_config():
    import yaml
    with open('/root/reference/configs/singlespeaker.yaml') as f:
        config = yaml.safe_load(f)
    dsp = DSP.from_config(config)
    assert dsp.n_mels == 80 and dsp.hop_length == 256


def test_full_filterbank_matches_independent_construction():
    """Every filter of the Slaney bank, rebuilt in-test directly from the
    published triangle formula (librosa-default semantics the reference
    relies on, /root/reference/utils/dsp.py:69-75)."""
    sr, n_fft, n_mels, fmin, fmax = 22050, 1024, 80, 0, 8000
    fb = mel_filterbank(sr, n_fft, n_mels, fmin, fmax)
    fft_freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    mel_f = mel_frequencies(n_mels + 2, fmin, fmax)
    for i in range(n_mels):
        left, center, right = mel_f[i], mel_f[i + 1], mel_f[i + 2]
        up = (fft_freqs - left) / (center - left)
        down = (right - fft_freqs) / (right - center)
        expected = np.maximum(0, np.minimum(up, down)) * 2.0 / (right - left)
        np.testing.assert_allclose(fb[i], expected, atol=1e-6,
                                   err_msg=f'filter {i}')


def test_wav_to_mel_matches_vendored_golden():
    """Golden-array regression in the spirit of the reference's
    tests/test_dsp.py:20-26 (librosa's brahms sample is not shippable here;
    the vendored fixture is a deterministic harmonic+chirp+noise signal and
    a mel generated ONCE by this pipeline after its STFT was parity-tested
    against torch.stft and the filterbank verified against the independent
    Slaney construction). Any numerical drift in the wav->mel composition
    fails this."""
    from forwardtacotron_tpu.dsp.dsp import DSP
    from forwardtacotron_tpu.utils.files import read_config

    y = np.load('tests/resources/golden_wav.npy')
    golden_mel = np.load('tests/resources/golden_mel.npy')
    config = read_config('configs/singlespeaker.yaml')
    mel = np.asarray(DSP.from_config(config).wav_to_mel(y))
    assert mel.shape == golden_mel.shape == (80, 130)
    np.testing.assert_allclose(mel, golden_mel, rtol=1e-5, atol=1e-5)
    # the log floor is exactly the reference's clip constant
    assert golden_mel.min() == np.float32(np.log(1e-5))


def test_pitch_matches_vendored_golden():
    """Same regression lock for the default YIN extractor on the golden
    signal (voiced fraction, f0 trajectory, silence gap)."""
    from forwardtacotron_tpu.dsp.pitch import YinPitchExtractor

    y = np.load('tests/resources/golden_wav.npy')
    golden = np.load('tests/resources/golden_pitch.npy')
    pitch = YinPitchExtractor(sample_rate=22050, hop_length=256,
                              fmin=30.0, fmax=600.0)(y)
    np.testing.assert_allclose(pitch, golden, rtol=1e-5, atol=1e-3)
    # sanity on the fixture itself: vibrato around 180 Hz, near-silence gap
    voiced = golden[golden > 0]
    assert 170 < np.median(voiced) < 195


import jax
import jax.numpy as jnp


def test_stft_pair_matches_complex_stft():
    """The MXU fast path (DFT as two real matmuls, reshape framing) must
    match the rfft reference to f32 matmul rounding."""
    from forwardtacotron_tpu.ops.stft import stft, stft_pair

    rs = np.random.RandomState(0)
    y = jnp.asarray(rs.randn(22050).astype(np.float32) * 0.3)
    ref = stft(y, 1024, 256, 1024)
    re, im = stft_pair(y, 1024, 256, 1024)
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(np.asarray(re.T), np.asarray(ref.real),
                               atol=2e-6 * scale)
    np.testing.assert_allclose(np.asarray(im.T), np.asarray(ref.imag),
                               atol=2e-6 * scale)


def test_istft_pair_round_trip():
    from forwardtacotron_tpu.ops.stft import istft_pair, stft_pair

    rs = np.random.RandomState(1)
    y = jnp.asarray(rs.randn(20480).astype(np.float32) * 0.5)
    re, im = stft_pair(y, 1024, 256, 1024)
    y2 = istft_pair(re, im, 1024, 256, 1024)
    n = min(y.shape[0], y2.shape[0])
    np.testing.assert_allclose(np.asarray(y2[:n]), np.asarray(y[:n]),
                               atol=1e-4)


def test_griffin_lim_pair_tracks_complex_griffin_lim():
    """Same key, same algorithm: the pair formulation must track the
    complex rfft Griffin-Lim trajectory (not just produce 'a' waveform)."""
    from forwardtacotron_tpu.ops.stft import (griffin_lim, griffin_lim_pair,
                                              stft)

    rs = np.random.RandomState(2)
    y = jnp.asarray(rs.randn(11025).astype(np.float32) * 0.3)
    mag = jnp.abs(stft(y, 1024, 256, 1024))
    w1 = griffin_lim(mag, jax.random.PRNGKey(0), 1024, 256, 1024, n_iter=8)
    w2 = griffin_lim_pair(mag, jax.random.PRNGKey(0), 1024, 256, 1024,
                          n_iter=8)
    corr = float(np.corrcoef(np.asarray(w1), np.asarray(w2))[0, 1])
    assert corr > 0.999, corr
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=2e-3)
