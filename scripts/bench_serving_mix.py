"""Realistic-mix routed serving benchmark (VERDICT r4 task 7).

The 29.7k audio-s/s headline is steady-state batch 4096 at one fixed
shape. This bench drives ``TTSInference.generate_routed`` with an
LJSpeech-like utterance-length distribution (log-normal over frames,
median ~450, clipped to [64, 1024] — LJSpeech clips are 1-10 s at hop
256), so every call scatters requests across multiple frame buckets and
power-of-two group sizes, exactly like a live traffic mix. Durations are
pinned per-request (the model is untrained; the routed machinery —
grouping, padded dispatch, reassembly — is what's under test, and the
decode compute at a given bucket is independent of the duration values).

Reports sustained audio-s/s over the steady-state calls plus the decode
compile count (the power-of-two group padding bounds it at
O(log2 B x #buckets)). Writes scripts/results/serving_mix.json.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SR, HOP = 22050, 256
BATCH = 256          # requests per routed call
N_CALLS = 8          # steady-state calls measured (after 2 warmup)
FRAME_MED, FRAME_SIGMA = 450.0, 0.45
FRAME_MIN, FRAME_MAX = 64, 1024


def main():
    import jax
    import jax.numpy as jnp

    from forwardtacotron_tpu.models.forward_tacotron import ForwardTacotron
    from forwardtacotron_tpu.models.synthesis import TTSInference
    from forwardtacotron_tpu.utils.files import read_config

    config = read_config('configs/singlespeaker.yaml')
    model = ForwardTacotron.from_config(config)
    rs = np.random.RandomState(0)

    n_tok = 128
    init_batch = {
        'x': np.ones((1, n_tok), np.int64),
        'dur': np.full((1, n_tok), 2.0, np.float32),
        'pitch': np.zeros((1, n_tok), np.float32),
        'energy': np.zeros((1, n_tok), np.float32),
        'mel': np.zeros((1, 128, 80), np.float32),
        'mel_len': np.array([128], np.int64),
        'x_len': np.array([n_tok], np.int64),
    }
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           init_batch, train=False)
    tts = TTSInference(model, variables, dtype='bfloat16')

    # pin per-request durations so each request's frame count follows the
    # LJSpeech-like distribution while the routed path stays untouched
    real_predict = tts._predict

    def sample_frames(n):
        f = np.exp(np.log(FRAME_MED)
                   + FRAME_SIGMA * rs.randn(n))
        return np.clip(f, FRAME_MIN, FRAME_MAX).astype(np.int64)

    frames_holder = {}

    def predict_pinned(variables, x, alpha):
        series = dict(real_predict(variables, x, alpha))
        b = x.shape[0]
        per_tok = frames_holder['frames'][:, None] / n_tok
        series['dur'] = jnp.asarray(
            np.broadcast_to(per_tok, (b, n_tok)).astype(np.float32))
        return series

    tts._predict = predict_pinned

    # Pre-draw the N_CALLS request mixes, warm each EXACT mix once (XLA
    # compiles per (bucket, pow2-group-size) shape inside each bucket's
    # jit — fresh random draws during the timed window would put compiles
    # on the clock), then measure a second pass over the same mixes. This
    # models steady-state serving where the router's traffic profile
    # repeats; the compile set is bounded by the pow2 padding either way.
    call_mixes = [(sample_frames(BATCH),
                   rs.randint(1, 130, (BATCH, n_tok)).astype(np.int64))
                  for _ in range(N_CALLS)]

    def one_call(frames, x):
        frames_holder['frames'] = frames
        out = tts.generate_routed(x)
        # readback forces execution on the pooled relay
        float(jnp.sum(out['mel_post'].astype(jnp.float32).ravel()[:1]))
        return float(frames.sum()) * HOP / SR

    for frames, x in call_mixes:
        one_call(frames, x)

    audio_total, t0 = 0.0, time.time()
    for frames, x in call_mixes:
        audio_total += one_call(frames, x)
    dt = time.time() - t0

    compiles = len(tts._decode_cache)
    rate = audio_total / dt
    row = dict(batch=BATCH, calls=N_CALLS,
               audio_s_total=round(audio_total, 1),
               wall_s=round(dt, 2),
               audio_s_per_s=round(rate, 1),
               decode_executables=compiles,
               frame_distribution=dict(kind='lognormal',
                                       median=FRAME_MED,
                                       sigma=FRAME_SIGMA,
                                       clip=[FRAME_MIN, FRAME_MAX]))
    print(f'routed mix: {rate:.0f} audio-s/s sustained '
          f'({N_CALLS} calls x {BATCH} requests, '
          f'{compiles} decode executables compiled)', flush=True)
    out = Path(__file__).resolve().parent / 'results' / 'serving_mix.json'
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(row, indent=1))
    print(f'wrote {out}')


if __name__ == '__main__':
    main()
