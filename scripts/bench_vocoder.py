"""Neural vocoder throughput on the chip: mel -> waveform.

The reference exports mels and leaves MelGAN/HiFiGAN to external torch repos
(reference gen_forward.py:108-116); here the generators run as JAX programs
(models/vocoder.py), so this measures what an on-chip neural-vocoding stage
adds to the serving story. Random weights — conv FLOPs don't depend on
values. Chained dispatches + one readback (see bench_readback_sanity.py).

Reports audio-seconds vocoded per second per chip for HiFi-GAN v1/v2 and
MelGAN at the LJSpeech hop (256 samples/frame, 22.05 kHz).
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SR = 22050
HOP = 256


def chained(dispatch, x0, n=8):
    import jax
    import jax.numpy as jnp

    seed = jax.jit(lambda x, y: x + (y[0, 0] * 0).astype(x.dtype))

    def run(k):
        xi = x0
        t0 = time.time()
        for _ in range(k):
            y = dispatch(xi)
            xi = seed(x0, y)
        float(jnp.sum(y.astype(jnp.float32).ravel()[:1]))
        return time.time() - t0

    run(2)
    t_small, t_big = run(3), run(n)
    return (t_big - t_small) / (n - 3)


HIFI_V2 = dict(upsample_initial_channel=128)


def main():
    import jax
    import jax.numpy as jnp

    from forwardtacotron_tpu.models.vocoder import (HiFiGANGenerator,
                                                    MelGANGenerator)

    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type=int, default=16)
    parser.add_argument('--frames', type=int, default=512)
    parser.add_argument('--dtype', default='bfloat16',
                        choices=['float32', 'bfloat16'])
    parser.add_argument('--which', default='all',
                        choices=['all', 'hifigan_v1', 'hifigan_v2', 'melgan'])
    parser.add_argument('--ab_upsampler', action='store_true',
                        help='bench each model with both the polyphase and '
                             'the input-dilated transposed-conv formulation')
    args = parser.parse_args()
    dtype = jnp.bfloat16 if args.dtype == 'bfloat16' else jnp.float32

    rs = np.random.RandomState(0)
    mel = jnp.asarray(
        rs.randn(args.batch, args.frames, 80).astype(np.float32) * 2 - 6)
    audio_s = args.batch * args.frames * HOP / SR

    targets = []
    if args.which in ('all', 'hifigan_v1'):
        targets.append(('hifigan-v1', HiFiGANGenerator(dtype=dtype)))
    if args.which in ('all', 'hifigan_v2'):
        targets.append(
            ('hifigan-v2', HiFiGANGenerator.from_config(HIFI_V2, dtype=dtype)))
    if args.which in ('all', 'melgan'):
        targets.append(('melgan', MelGANGenerator(dtype=dtype)))

    from forwardtacotron_tpu.models import vocoder as vocoder_mod
    modes = ((True, 'poly'), (False, 'direct')) if args.ab_upsampler \
        else ((vocoder_mod.POLYPHASE, ''),)
    for name, model in targets:
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), mel[:1])
        for poly, tag in modes:
            vocoder_mod.POLYPHASE = poly
            fn = jax.jit(lambda v, m, model=model: model.apply(v, m))
            dt = chained(lambda m: fn(variables, m), mel)
            label = f'{name}{"/" + tag if tag else ""}'
            print(f'{label:18s} {audio_s / dt:12.0f} audio-s/s/chip '
                  f'(batch {args.batch} x {args.frames} frames, '
                  f'{args.dtype})', flush=True)


if __name__ == '__main__':
    main()
