"""DSP throughput on the chip: batched mel extraction and Griffin-Lim.

The reference runs librosa on CPU for both (utils/dsp.py:62-94); here the
whole signal path is JAX (ops/stft.py) so preprocessing and vocoding ride
the TPU. Chained dispatches + one readback (see bench_readback_sanity.py).

Reports audio-seconds processed per second per chip for:
  * wav -> log-mel (preprocessing hot loop, preprocess.py:67-98 equivalent)
  * mel -> wav via 32-iteration Griffin-Lim (gen_forward.py vocoder)
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SECONDS = 10.0


def chained(dispatch, x0, seed_fn, n=8):
    import jax.numpy as jnp

    def run(k):
        xi = x0
        t0 = time.time()
        for _ in range(k):
            y = dispatch(xi)
            xi = seed_fn(x0, y)
        float(jnp.sum(y.astype(jnp.float32).ravel()[:1]))
        return time.time() - t0

    run(2)
    t_small, t_big = run(3), run(n)
    return (t_big - t_small) / (n - 3)


def main():
    import jax
    import jax.numpy as jnp

    from forwardtacotron_tpu.dsp.mel import mel_filterbank
    from forwardtacotron_tpu.ops.stft import (griffin_lim_pair,
                                          stft_magnitude)
    from forwardtacotron_tpu.utils.files import read_config

    config = read_config('configs/singlespeaker.yaml')
    d = config['dsp']
    sr, n_fft, hop, win = (d['sample_rate'], d['n_fft'], d['hop_length'],
                           d['win_length'])
    n_mels = d['num_mels']
    n_samples = int(SECONDS * sr)

    rs = np.random.RandomState(0)
    basis = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, d['fmin'],
                                       d['fmax']))

    # ---- wav -> log-mel, batched
    b_mel = 256
    wavs = jnp.asarray(rs.randn(b_mel, n_samples).astype(np.float32) * 0.1)

    @jax.jit
    def wav_to_mel_batch(y):
        mag = jax.vmap(lambda w: stft_magnitude(
            w, n_fft=n_fft, hop_length=hop, win_length=win))(y)
        return jnp.log(jnp.clip(jnp.einsum('mf,bft->bmt', basis, mag),
                                1e-5, None))

    seed = jax.jit(lambda x0, y: x0 + (y[0, 0, 0] * 0).astype(x0.dtype))
    dt = chained(lambda w: wav_to_mel_batch(w), wavs, seed)
    rate = b_mel * SECONDS / dt
    print(f'wav->log-mel      {rate:12.0f} audio-s/s/chip '
          f'(batch {b_mel} x {SECONDS:.0f}s)', flush=True)

    # ---- Griffin-Lim 32 iters, batched (magnitude -> wav)
    b_gl = 64
    t_frames = n_samples // hop + 1
    mags = jnp.asarray(
        np.abs(rs.randn(b_gl, n_fft // 2 + 1, t_frames)).astype(np.float32))

    @jax.jit
    def gl_batch(m):
        # the production DSP.griffinlim path: fused per-iteration Pallas
        # kernel (ops/pallas/griffin_lim.py), f32 — tracks the pair path
        from forwardtacotron_tpu.ops.pallas.griffin_lim import \
            griffin_lim_fused
        keys = jax.random.split(jax.random.PRNGKey(0), m.shape[0])
        return griffin_lim_fused(m, keys, n_fft, hop, win, n_iter=32)

    seed_gl = jax.jit(lambda x0, y: x0 + (y[0, 0] * 0).astype(x0.dtype))
    dt = chained(lambda m: gl_batch(m), mags, seed_gl, n=5)
    rate = b_gl * SECONDS / dt
    print(f'griffinlim-32     {rate:12.0f} audio-s/s/chip '
          f'(batch {b_gl} x {SECONDS:.0f}s)', flush=True)


if __name__ == '__main__':
    main()
