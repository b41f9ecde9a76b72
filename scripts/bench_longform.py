"""Long-form (article-length) serving bench on the real chip (VERDICT r4
task 6): measured audio-s/s and peak HBM at 8k and 16k frames.

FastPitch's post-LR self-attention is the only O(T^2)-in-frames op in the
model family; above 2048 frames it switches to the exact blockwise
(online-softmax) schedule (models/layers.py blockwise_attention) that was
previously validated only by a 4,352-frame CPU test. This runs the real
decode at 8,192 and 16,384 frames on chip (16,384 frames = ~190 s of
audio at hop 256 / 22.05 kHz), plus a 16,384-frame ForwardTacotron decode
(linear-memory BiLSTM path). Durations are fixed at 8 frames/token so the
frame budget is exact. Writes scripts/results/longform.json.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SR, HOP = 22050, 256
N_TRIALS = 3


def peak_hbm_gb():
    import jax
    try:
        stats = jax.local_devices()[0].memory_stats()
        return round(stats.get('peak_bytes_in_use', 0) / 2 ** 30, 2)
    except Exception:
        return None


def main():
    import jax
    import jax.numpy as jnp

    from forwardtacotron_tpu.models.fast_pitch import FastPitch
    from forwardtacotron_tpu.models.forward_tacotron import ForwardTacotron
    from forwardtacotron_tpu.ops.pallas.rnn import pallas_rnns
    from forwardtacotron_tpu.utils.files import read_config

    config = read_config('configs/singlespeaker.yaml')
    rs = np.random.RandomState(0)
    results = {}

    def run(name, model, variables, frames, b, decode):
        n_tok = frames // 8
        x = jnp.asarray(rs.randint(1, 130, (b, n_tok)).astype(np.int64))
        dur = jnp.full((b, n_tok), 8.0, jnp.float32)
        pitch = jnp.asarray(rs.randn(b, n_tok).astype(np.float32))
        energy = jnp.asarray(rs.rand(b, n_tok).astype(np.float32))

        out = decode(variables, x, dur, pitch, energy)
        float(jnp.sum(out['mel'].astype(jnp.float32).ravel()[:1]))
        times = []
        for _ in range(N_TRIALS):
            t0 = time.time()
            out = decode(variables, x, dur, pitch, energy)
            float(jnp.sum(out['mel'].astype(jnp.float32).ravel()[:1]))
            times.append(time.time() - t0)
        times.sort()
        med = times[len(times) // 2]
        audio_s = b * frames * HOP / SR
        row = dict(frames=frames, batch=b, audio_seconds=round(audio_s, 1),
                   ms_median=round(med * 1e3, 1),
                   ms_min=round(times[0] * 1e3, 1),
                   ms_max=round(times[-1] * 1e3, 1),
                   audio_s_per_s=round(audio_s / med, 1),
                   peak_hbm_gb=peak_hbm_gb())
        results[name] = row
        print(f'{name}: {row["ms_median"]} ms median -> '
              f'{row["audio_s_per_s"]} audio-s/s '
              f'(batch {b} x {frames} frames = {audio_s:.0f} audio-s, '
              f'peak HBM {row["peak_hbm_gb"]} GB)', flush=True)

    # ---- FastPitch blockwise attention at 8k / 16k frames
    fp = FastPitch.from_config(config)
    n_init = 64
    init_batch = {
        'x': np.ones((1, n_init), np.int64),
        'dur': np.full((1, n_init), 2.0, np.float32),
        'pitch': np.zeros((1, n_init), np.float32),
        'energy': np.zeros((1, n_init), np.float32),
        'mel': np.zeros((1, 128, 80), np.float32),
        'mel_len': np.array([128], np.int64),
        'x_len': np.array([n_init], np.int64),
    }
    v = fp.init({'params': jax.random.PRNGKey(0),
                 'dropout': jax.random.PRNGKey(1)}, init_batch, train=False)
    vb = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                      if hasattr(a, 'dtype') and a.dtype == jnp.float32
                      else a, v)

    for frames, b in ((8192, 16), (16384, 8)):
        def decode(variables, x, dur, pitch, energy, frames=frames):
            def f(v_, x_, d_, p_, e_):
                with pallas_rnns('on'):
                    return fp.apply(v_, x_, d_, p_, e_, frames,
                                    method=FastPitch.generate)
            return jax.jit(f)(variables, x, dur, pitch, energy)
        run(f'fastpitch_{frames}f', fp, vb, frames, b, decode)

    # ---- ForwardTacotron (linear-memory BiLSTM) at 16k frames
    ft = ForwardTacotron.from_config(config)
    v2 = ft.init({'params': jax.random.PRNGKey(0),
                  'dropout': jax.random.PRNGKey(1)}, init_batch, train=False)
    v2b = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                       if hasattr(a, 'dtype') and a.dtype == jnp.float32
                       else a, v2)

    def decode_ft(variables, x, dur, pitch, energy):
        def f(v_, x_, d_, p_, e_):
            with pallas_rnns('on'):
                return ft.apply(v_, x_, d_, p_, e_, 16384,
                                method=ForwardTacotron.generate)
        return jax.jit(f)(variables, x, dur, pitch, energy)
    run('forward_tacotron_16384f', ft, v2b, 16384, 8, decode_ft)

    out = Path(__file__).resolve().parent / 'results' / 'longform.json'
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(results, indent=1))
    print(f'wrote {out}')


if __name__ == '__main__':
    main()
