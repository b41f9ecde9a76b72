"""Parity tests for the fused Griffin-Lim iteration kernel
(ops/pallas/griffin_lim.py) vs the pair path (ops/stft.py) vs the rfft
reference (reference utils/dsp.py:80-94).

The fused kernel is the shipped DSP.griffinlim path on TPU (f32 default,
measured 2.3x the pair path); tests run it in interpret mode on the CPU
backend where f32 matmuls are exact, so trajectory parity is tight.
"""

import numpy as np
import pytest


@pytest.fixture()
def interp(monkeypatch):
    monkeypatch.setenv('FTT_PALLAS_INTERPRET', '1')


def _mag_of(sig, n_fft, hop, win):
    import jax.numpy as jnp
    from forwardtacotron_tpu.ops.stft import stft_pair
    re, im = stft_pair(jnp.asarray(sig), n_fft, hop, win)
    return jnp.sqrt(re ** 2 + im ** 2).T          # [bins, F]


def test_fused_gl_matches_pair_trajectory(interp):
    """Same phase init, same momentum algorithm: the fused kernel tracks
    griffin_lim_pair to f32 rounding (exact edge handling included)."""
    import jax
    import jax.numpy as jnp
    from forwardtacotron_tpu.ops.pallas.griffin_lim import griffin_lim_fused
    from forwardtacotron_tpu.ops.stft import griffin_lim_pair

    n_fft, hop, win = 64, 16, 64
    rs = np.random.RandomState(0)
    sig = rs.randn(2, 400).astype(np.float32) * 0.3
    mag = jnp.stack([_mag_of(sig[i], n_fft, hop, win) for i in range(2)])
    keys = jax.random.split(jax.random.PRNGKey(7), 2)

    ref = jnp.stack([griffin_lim_pair(mag[i], keys[i], n_fft, hop, win,
                                      n_iter=5) for i in range(2)])
    got = griffin_lim_fused(mag, keys, n_fft, hop, win, n_iter=5,
                            compute_dtype=jnp.float32, block_frames=8,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_fused_gl_real_shape_and_bf16_quality(interp):
    """Production n_fft/hop; f32 parity stays tight and the bf16 compute
    option is quality-neutral (spectral convergence within 1%)."""
    import jax
    import jax.numpy as jnp
    from forwardtacotron_tpu.ops.pallas.griffin_lim import griffin_lim_fused
    from forwardtacotron_tpu.ops.stft import griffin_lim_pair

    n_fft, hop, win = 1024, 256, 1024
    rs = np.random.RandomState(1)
    sig = rs.randn(12000).astype(np.float32) * 0.3
    mag = jnp.stack([_mag_of(sig, n_fft, hop, win)])
    keys = jax.random.split(jax.random.PRNGKey(3), 1)

    ref = jnp.stack([griffin_lim_pair(mag[0], keys[0], n_fft, hop, win,
                                      n_iter=4)])
    got = griffin_lim_fused(mag, keys, n_fft, hop, win, n_iter=4,
                            compute_dtype=jnp.float32, block_frames=16,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-3, atol=1e-4)

    def spec_conv(wav):
        m2 = _mag_of(np.asarray(wav), n_fft, hop, win)
        return float(jnp.linalg.norm(m2 - mag[0])
                     / jnp.linalg.norm(mag[0]))

    bf = griffin_lim_fused(mag, keys, n_fft, hop, win, n_iter=4,
                           compute_dtype=jnp.bfloat16, block_frames=16,
                           interpret=True)
    c_ref = spec_conv(np.asarray(ref)[0])
    c_bf = spec_conv(np.asarray(bf)[0])
    assert abs(c_bf - c_ref) < 0.01 * max(c_ref, 1e-6)


def test_dsp_griffinlim_uses_fused_path(interp):
    """DSP.griffinlim dispatches to the fused kernel when usable and its
    output matches the pair path on the same mel."""
    import jax.numpy as jnp
    from forwardtacotron_tpu.dsp.dsp import DSP

    d = DSP(num_mels=80, sample_rate=22050, n_fft=1024, hop_length=256,
            win_length=1024, fmin=0, fmax=8000, peak_norm=False,
            should_trim_long_silences=False, should_trim_start_end_silence=False,
            trim_silence_top_db=60)
    rs = np.random.RandomState(2)
    mel = np.log(np.abs(rs.randn(80, 40)).astype(np.float32) + 1e-3)
    assert d._gl_fused_usable(40)
    wav_fused = d.griffinlim(mel, n_iter=3)

    # force the pair path and compare (same seed -> same phase init)
    import forwardtacotron_tpu.dsp.dsp as dspmod
    orig = DSP._gl_fused_usable
    DSP._gl_fused_usable = lambda self, n: False
    try:
        wav_pair = d.griffinlim(mel, n_iter=3)
    finally:
        DSP._gl_fused_usable = orig
    np.testing.assert_allclose(wav_fused, wav_pair, rtol=1e-3, atol=1e-4)
