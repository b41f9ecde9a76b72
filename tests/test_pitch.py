"""Numerical validation of the built-in YIN pitch extractor (dsp/pitch.py).

The reference defaults to pyworld DIO (/root/reference/configs/
singlespeaker.yaml:44, pitch_extraction/pitch_extractor.py:50-61); that wheel
is optional here and the shipped default is the from-scratch YIN. These tests
pin its numerics: known-f0 synthetic signals (pure tones, harmonic stacks,
vibrato), voiced/unvoiced decisions (noise, silence), the frame-alignment
contract with the mel pipeline (one value per hop, n_frames = 1 + len//hop —
the same shape contract DIO's frame_period setting produces in the
reference), and the config factory's fallback chain.
"""

import numpy as np
import pytest

from forwardtacotron_tpu.dsp.pitch import (YinPitchExtractor,
                                           new_pitch_extractor_from_config)

SR = 22050
HOP = 256


@pytest.fixture
def yin():
    return YinPitchExtractor(sample_rate=SR, hop_length=HOP,
                             fmin=30.0, fmax=600.0)


def _tone(freq, seconds=0.6, amp=0.5, sr=SR):
    t = np.arange(int(seconds * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _voiced(pitch, margin=8):
    """Interior frames (edges see partial windows)."""
    return pitch[margin:-margin]


@pytest.mark.parametrize('f0', [82.4, 110.0, 220.0, 440.0])
def test_pure_tone_within_half_percent(yin, f0):
    pitch = yin(_tone(f0))
    inner = _voiced(pitch)
    voiced = inner[inner > 0]
    assert voiced.size > 0.9 * inner.size, 'tone must be voiced'
    rel_err = np.abs(voiced - f0) / f0
    assert np.median(rel_err) < 0.005, np.median(rel_err)
    assert rel_err.max() < 0.02, rel_err.max()


def test_harmonic_stack_finds_fundamental(yin):
    """A harmonic-rich signal (like glottal pulses) must yield f0, not a
    harmonic or subharmonic."""
    f0 = 150.0
    t = np.arange(int(0.6 * SR)) / SR
    y = sum((0.6 / k) * np.sin(2 * np.pi * k * f0 * t) for k in range(1, 6))
    pitch = yin(y.astype(np.float32))
    voiced = _voiced(pitch)
    voiced = voiced[voiced > 0]
    rel_err = np.abs(voiced - f0) / f0
    assert np.median(rel_err) < 0.01, np.median(rel_err)
    # no octave errors in the bulk of frames
    assert (rel_err < 0.1).mean() > 0.95


def test_vibrato_tracks_modulation(yin):
    """f0 modulated +-5% at 5 Hz: per-frame estimates must follow the
    instantaneous frequency."""
    f0, depth, rate = 220.0, 0.05, 5.0
    n = int(0.8 * SR)
    t = np.arange(n) / SR
    inst_freq = f0 * (1 + depth * np.sin(2 * np.pi * rate * t))
    phase = 2 * np.pi * np.cumsum(inst_freq) / SR
    y = (0.5 * np.sin(phase)).astype(np.float32)
    pitch = yin(y)
    # measurement model: YIN compares y[0:w/2] against y[tau:tau+w/2] inside
    # a frame whose first sample is f*hop - w/2 (center padding), so the
    # estimate is ~a w/2-window average of f0 centered at f*hop - w/4 —
    # against that model the median error is ~0.2% (vs ~2% against the
    # instantaneous value, which over-asks: the window genuinely averages)
    w = yin.frame_length
    kernel = np.ones(w // 2) / (w // 2)
    avg_freq = np.convolve(inst_freq, kernel, mode='same')
    frames = np.clip(np.arange(len(pitch)) * HOP - w // 4, 0, n - 1)
    expected = avg_freq[frames]
    sel = slice(8, len(pitch) - 8)
    voiced = pitch[sel] > 0
    assert voiced.mean() > 0.9
    rel_err = np.abs(pitch[sel][voiced] - expected[sel][voiced]) \
        / expected[sel][voiced]
    assert np.median(rel_err) < 0.01, np.median(rel_err)
    assert rel_err.max() < 0.02, rel_err.max()
    # the estimates must actually span the (attenuated) vibrato range,
    # not sit at f0
    assert pitch[sel][voiced].max() > f0 * 1.02
    assert pitch[sel][voiced].min() < f0 * 0.98


def test_white_noise_mostly_unvoiced(yin):
    rs = np.random.RandomState(0)
    pitch = yin(rs.randn(int(0.6 * SR)).astype(np.float32) * 0.3)
    assert (pitch == 0).mean() > 0.8, (pitch > 0).mean()


def test_silence_is_unvoiced(yin):
    pitch = yin(np.zeros(int(0.5 * SR), np.float32))
    assert (pitch == 0).all()


def test_voiced_unvoiced_segmentation(yin):
    """tone | silence | tone: the silent span must be zeros, the tone spans
    voiced — the structure pitch_cond (1=unvoiced, 2=voiced) depends on."""
    tone = _tone(200.0, seconds=0.4)
    gap = np.zeros(int(0.4 * SR), np.float32)
    y = np.concatenate([tone, gap, tone])
    pitch = yin(y)
    frames_per_span = len(tone) // HOP
    mid = pitch[frames_per_span + 8: 2 * frames_per_span - 8]
    assert (mid == 0).mean() > 0.9, 'silence span must be unvoiced'
    head = pitch[8:frames_per_span - 8]
    assert (head > 0).mean() > 0.9, 'tone span must be voiced'


def test_out_of_band_rejected(yin):
    """Frequencies outside [fmin, fmax] must come back as unvoiced zeros
    (the reference filters the same band in extract_pitch_energy,
    /root/reference/train_tacotron.py:65-70)."""
    pitch_high = yin(_tone(1200.0))   # above fmax=600
    assert (pitch_high == 0).mean() > 0.9
    pitch_low = yin(_tone(20.0, seconds=1.0))  # below fmin=30
    assert (_voiced(pitch_low) == 0).mean() > 0.9


def test_frame_alignment_matches_mel_pipeline(yin):
    """One pitch value per hop: n_frames = 1 + len(y)//hop, the exact frame
    count of the center-padded STFT/mel pipeline (dsp/dsp.py)."""
    from forwardtacotron_tpu.dsp.dsp import DSP
    from forwardtacotron_tpu.utils.files import read_config

    config = read_config('tests/resources/test_config.yaml')
    dsp = DSP.from_config(config)
    for n_samples in (HOP * 40, HOP * 40 + 1, HOP * 40 + HOP - 1, 22050):
        y = _tone(220.0, seconds=1.2)[:n_samples]
        pitch = yin(y)
        assert len(pitch) == 1 + n_samples // HOP
        mel = dsp.wav_to_mel(y)
        assert mel.shape[1] == len(pitch), (mel.shape, len(pitch))


def test_amplitude_invariance(yin):
    """YIN's CMND is amplitude-normalized: a quiet tone must track like a
    loud one."""
    loud = yin(_tone(220.0, amp=0.9))
    quiet = yin(_tone(220.0, amp=0.05))
    sel = slice(8, -8)
    both = (loud[sel] > 0) & (quiet[sel] > 0)
    assert both.mean() > 0.9
    np.testing.assert_allclose(loud[sel][both], quiet[sel][both], rtol=0.01)


def test_factory_default_and_fallbacks():
    config = {'dsp': {'sample_rate': SR, 'hop_length': HOP},
              'preprocessing': {'pitch_extractor': 'yin',
                                'pitch_min_freq': 30,
                                'pitch_max_freq': 600}}
    assert isinstance(new_pitch_extractor_from_config(config),
                      YinPitchExtractor)
    # reference-default 'pyworld' falls back to YIN when the wheel is absent
    config['preprocessing']['pitch_extractor'] = 'pyworld'
    try:
        import pyworld  # noqa: F401
        pytest.skip('pyworld installed; fallback path not reachable')
    except ImportError:
        pass
    extractor = new_pitch_extractor_from_config(config)
    assert isinstance(extractor, YinPitchExtractor)
    with pytest.raises(ValueError):
        new_pitch_extractor_from_config(
            {**config, 'preprocessing':
             {**config['preprocessing'], 'pitch_extractor': 'nope'}})
