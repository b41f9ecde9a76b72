"""Duration-extraction wall-time estimate for an LJSpeech-size epoch.

The teacher->student bridge has two phases (duration/pipeline.py):
  A. teacher-forced attention extraction on the chip (r=1 scan over T
     decode steps per batch, PreNet dropout forced on);
  B. host-side shortest-monotonic-path DP over (mel, attention), C++
     via ctypes, process-pool parallel.

This script measures one representative phase-A batch (LJSpeech median
shapes) and one phase-B item at full size, then extrapolates to the
13,100-utterance corpus (~24 h of speech, mean mel length ~870 frames at
22.05 kHz / hop 256... LJSpeech is 625 frames mean at hop 275 — we use the
reference-config hop 275 => ~540 frames mean, ~1250 p99).

Usage: python scripts/bench_extraction.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

LJSPEECH_ITEMS = 13_100
MEAN_FRAMES = 540       # 6.57 s mean at hop 275 / 22.05 kHz
MEAN_TOKENS = 100


def main():
    import jax

    from forwardtacotron_tpu.models.tacotron import Tacotron
    from forwardtacotron_tpu.utils.files import read_config

    config = read_config('configs/singlespeaker.yaml')
    model = Tacotron.from_config(config)

    bs, n_tok, t = 32, MEAN_TOKENS, MEAN_FRAMES
    rs = np.random.RandomState(0)
    batch = {
        'x': rs.randint(1, 130, (bs, n_tok)).astype(np.int64),
        'mel': (rs.randn(bs, t, 80).astype(np.float32) - 4.0),
    }
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           {'x': batch['x'][:1], 'mel': batch['mel'][:1]},
                           r=1, train=False)

    def run(variables, batch, rng):
        _, _, attn = model.apply(variables, batch, r=1, train=False,
                                 prenet_dropout_on=True,
                                 rngs={'dropout': rng})
        return attn

    fn = jax.jit(run)
    rng = jax.random.PRNGKey(0)
    attn = fn(variables, batch, rng)
    jax.block_until_ready(attn)

    best = 1e9
    for _ in range(3):
        n = 4
        start = time.time()
        for _ in range(n):
            rng, sub = jax.random.split(rng)
            attn = fn(variables, batch, sub)
        jax.block_until_ready(attn)
        float(np.asarray(attn[0, 0, 0]))
        best = min(best, (time.time() - start) / n)
    per_item_a = best / bs
    total_a = per_item_a * LJSPEECH_ITEMS
    print(f'phase A (teacher attention, chip): {best * 1e3:.1f} ms/batch '
          f'(bs={bs}, T={t}, N={n_tok}) -> {per_item_a * 1e3:.2f} ms/item, '
          f'LJSpeech epoch ~{total_a:.0f} s', flush=True)

    # phase B: the C++ DP at full size (T=1250 p99 so the estimate is
    # conservative), single core; the pipeline runs a spawn pool
    from forwardtacotron_tpu.duration.extractor import DurationExtractor
    ex = DurationExtractor(silence_threshold=-11.0, silence_prob_shift=0.25)
    n_tok_b, t_b = 120, 1250
    x = rs.randint(1, 130, (n_tok_b,))
    mel = rs.randn(80, t_b).astype(np.float32) - 4.0
    att = rs.dirichlet(np.ones(n_tok_b) * 0.05, size=t_b).astype(np.float32)
    ex(x, mel, att)  # warm (builds/loads the native lib)
    start = time.time()
    n = 5
    for _ in range(n):
        ex(x, mel, att)
    per_item_b = (time.time() - start) / n
    for workers in (1, 8, 16):
        total_b = per_item_b * LJSPEECH_ITEMS / workers
        print(f'phase B (C++ DP, T={t_b}): {per_item_b * 1e3:.1f} ms/item -> '
              f'LJSpeech epoch ~{total_b:.0f} s @ {workers} workers',
              flush=True)
    print(f'TOTAL (A + B@16): ~{total_a + per_item_b * LJSPEECH_ITEMS / 16:.0f} s '
          f'for a full LJSpeech alignment pass', flush=True)


if __name__ == '__main__':
    main()
