"""Speed-of-light table for the DSP + LR kernels (BASELINE north-star #3).

For each kernel: analytic bytes moved (activation read+write across
unavoidable boundaries) and FLOPs vs measured time on the chip ->
fraction of the bytes-bound / compute-bound roofline achieved. High
iteration counts (~100 chained dispatches per timing) because these ops
are single-digit-ms and the pooled relay jitters at that scale.

Shapes: serving/preprocessing defaults — STFT/iSTFT at n_fft 1024 hop 256
on batch 64 x 10 s audio; Griffin-Lim per-iteration at the same; LR at the
serving decode shape (4096 x 86 tokens -> 256 frames x 512).
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SR = 22050
N_FFT, HOP = 1024, 256
BATCH_W, SECONDS = 64, 10.0
B_LR, N_LR, C_LR, T_LR = 4096, 86, 512, 256


def chained_ms(fn, x0, n=110, small=15):
    import jax.numpy as jnp

    def run(k):
        xi = x0
        t0 = time.time()
        for _ in range(k):
            y = fn(xi)
            xi = x0 + (y.ravel()[0] * 0).astype(x0.dtype)
        float(jnp.sum(jnp.abs(y).ravel()[:1].astype(jnp.float32)))
        return time.time() - t0

    run(5)
    a, b = run(small), run(n)
    return (b - a) / (n - small) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from forwardtacotron_tpu.ops.length_regulator import length_regulator
    from forwardtacotron_tpu.ops.pallas.length_regulator import \
        length_regulator_pallas
    from forwardtacotron_tpu.ops.stft import (istft, istft_pair,
                                              stft, stft_pair)
    from forwardtacotron_tpu.utils.flops import chip_spec

    spec = chip_spec()
    rs = np.random.RandomState(0)

    n_samples = int(SR * SECONDS)
    wav = jnp.asarray(rs.randn(BATCH_W, n_samples) * 0.3, jnp.float32)
    n_frames = n_samples // HOP + 1
    # complex64 host->device transfer is UNIMPLEMENTED on the axon relay;
    # synthesize the complex spectrogram on-device from two f32 uploads
    re = jnp.asarray(rs.randn(BATCH_W, N_FFT // 2 + 1, n_frames)
                     .astype(np.float32))
    im = jnp.asarray(rs.randn(BATCH_W, N_FFT // 2 + 1, n_frames)
                     .astype(np.float32))
    spec_c = jax.jit(lambda a, b: a + 1j * b)(re, im)
    mag = jax.jit(jnp.abs)(spec_c)

    # analytic traffic (f32/c64): framing duplicates by n_fft/hop
    frames_bytes = BATCH_W * n_frames * N_FFT * 4
    spec_bytes = BATCH_W * n_frames * (N_FFT // 2 + 1) * 8
    wav_bytes = BATCH_W * n_samples * 4
    # rfft compute: ~5 N log2 N per frame (split-radix real FFT estimate)
    fft_flops = BATCH_W * n_frames * 5 * N_FFT * np.log2(N_FFT)

    rows = []

    def add(name, ms, flops, byts):
        comp = flops / spec.flops_bf16 * 1e3   # f32 runs on VPU/MXU; use
        band = byts / spec.hbm_gbps * 1e3      # bf16 peak as upper bound
        sol = max(comp, band)
        rows.append(dict(name=name, ms=ms, gflop=flops / 1e9,
                         gb=byts / 1e9, sol_ms=sol,
                         sol_frac=sol / ms if ms > 0 else 0,
                         bound='compute' if comp >= band else 'bytes'))
        print(f'{name:14s} {ms:8.2f} ms   SoL {sol:6.2f} ms '
              f'({sol / ms:5.1%} of SoL, {rows[-1]["bound"]}-bound)',
              flush=True)

    stft_fn = jax.jit(jax.vmap(lambda y: stft(y, N_FFT, HOP, N_FFT)))
    add('stft', chained_ms(stft_fn, wav, n=40, small=8),
        fft_flops, wav_bytes + 2 * frames_bytes + spec_bytes)

    istft_fn = jax.jit(jax.vmap(lambda s: istft(s, N_FFT, HOP, N_FFT)))
    add('istft', chained_ms(istft_fn, spec_c, n=40, small=8),
        fft_flops, spec_bytes + 2 * frames_bytes + wav_bytes)

    def gl_iter_1d(m):
        # one Griffin-Lim iteration: istft -> stft -> phase normalize
        rebuilt = stft(istft(m * jnp.exp(1j * jnp.zeros_like(m)),
                             N_FFT, HOP, N_FFT), N_FFT, HOP, N_FFT)
        t = min(m.shape[1], rebuilt.shape[1])
        angles = rebuilt[:, :t] / jnp.maximum(jnp.abs(rebuilt[:, :t]), 1e-16)
        return jnp.abs(m[:, :t] * angles)
    gl_fn = jax.jit(jax.vmap(gl_iter_1d))
    add('gl_iteration', chained_ms(gl_fn, mag, n=40, small=8),
        2 * fft_flops,
        2 * (spec_bytes + 2 * frames_bytes) + 2 * wav_bytes + spec_bytes)

    # fast path (DFT matmul + reshape framing/OLA, no complex dtype)
    stft_p = jax.jit(jax.vmap(lambda y: jnp.stack(
        stft_pair(y, N_FFT, HOP, N_FFT))))
    add('stft_pair', chained_ms(stft_p, wav, n=60, small=10),
        2 * BATCH_W * n_frames * 2 * N_FFT * (N_FFT // 2 + 1),
        wav_bytes + 2 * frames_bytes + spec_bytes)

    re_im = stft_p(wav)
    istft_p = jax.jit(jax.vmap(lambda p: istft_pair(p[0], p[1], N_FFT, HOP,
                                                    N_FFT)))
    add('istft_pair', chained_ms(istft_p, re_im, n=60, small=10),
        2 * BATCH_W * n_frames * 2 * N_FFT * (N_FFT // 2 + 1),
        spec_bytes + 2 * frames_bytes + wav_bytes)

    def gl_pair_iter(p):
        from forwardtacotron_tpu.ops.stft import istft_pair as ip, \
            stft_pair as sp
        inverse = ip(p[0], p[1], N_FFT, HOP, N_FFT)
        rb_re, rb_im = sp(inverse, N_FFT, HOP, N_FFT)
        t = p.shape[1]
        mod = jnp.maximum(jnp.sqrt(rb_re[:t] ** 2 + rb_im[:t] ** 2), 1e-16)
        return jnp.stack([rb_re[:t] / mod, rb_im[:t] / mod])
    gl_p = jax.jit(jax.vmap(gl_pair_iter))
    add('gl_pair_iter', chained_ms(gl_p, re_im, n=60, small=10),
        2 * 2 * BATCH_W * n_frames * 2 * N_FFT * (N_FFT // 2 + 1),
        2 * (spec_bytes + 2 * frames_bytes) + 2 * wav_bytes + spec_bytes)

    x = jnp.asarray(rs.randn(B_LR, N_LR, C_LR), jnp.bfloat16)
    dur = jnp.asarray(rs.uniform(1.0, 4.0, (B_LR, N_LR)), jnp.float32)
    lr_bytes = (B_LR * N_LR * C_LR + B_LR * T_LR * C_LR) * 2
    lr_flops = 2.0 * B_LR * T_LR * N_LR * C_LR  # selection matmul
    add('lr_pallas',
        chained_ms(jax.jit(lambda h: length_regulator_pallas(h, dur, T_LR)),
                   x), lr_flops, lr_bytes)
    add('lr_einsum',
        chained_ms(jax.jit(lambda h: length_regulator(h, dur, T_LR)), x),
        lr_flops,
        lr_bytes + 2 * B_LR * T_LR * N_LR * 2)  # + materialized selection

    out = Path('/tmp/dsp_sol.json')
    out.write_text(json.dumps(rows, indent=1))
    print(f'wrote {out}')


if __name__ == '__main__':
    main()
