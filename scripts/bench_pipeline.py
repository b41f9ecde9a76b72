"""Distinguish compute time from host<->device round-trip cost on the relay.

Times N back-to-back generate_fused dispatches with ONE readback at the end
(pipelined) vs a readback per call (bench.py style).
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import BENCH_SENTENCES  # noqa: E402


def main():
    import jax

    from forwardtacotron_tpu.models.registry import init_tts_model
    from forwardtacotron_tpu.models.synthesis import TTSInference
    from forwardtacotron_tpu.text.tokenizer import Tokenizer
    from forwardtacotron_tpu.utils.files import read_config

    config = read_config('configs/singlespeaker.yaml')
    model = init_tts_model(config)
    tok = Tokenizer()
    token_lists = [tok(s) for s in BENCH_SENTENCES]
    max_tokens = max(len(t) for t in token_lists)
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    x = np.zeros((B, max_tokens), np.int64)
    for i in range(B):
        toks = token_lists[i % len(token_lists)]
        x[i, :len(toks)] = toks

    init_batch = {
        'x': x[:1], 'dur': np.ones((1, max_tokens), np.float32),
        'mel_len': np.array([max_tokens]),
        'pitch': np.zeros((1, max_tokens), np.float32),
        'energy': np.zeros((1, max_tokens), np.float32),
        'mel': np.zeros((1, max_tokens, 80), np.float32),
    }
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           init_batch, train=False)
    inf = TTSInference(model, variables, multispeaker=False, dtype='bfloat16')

    import jax.numpy as jnp
    xd = jnp.asarray(x)  # device-resident input: no per-call upload
    out = inf.generate_fused(xd, max_len=256)
    np.asarray(out['mel_post'][0, 0, 0])

    out = None
    for n in (6, 24):
        t0 = time.time()
        for _ in range(n):
            out = inf.generate_fused(xd, max_len=256)  # old ref dropped
        np.asarray(out['mel_post'][0, 0, 0])
        piped = (time.time() - t0) / n
        print(f'B={B} pipelined n={n}: {piped*1000:.1f} ms/call')

    hop, sr = config['dsp']['hop_length'], config['dsp']['sample_rate']
    frames = int(np.sum(np.minimum(np.asarray(out['mel_len']), 256)))
    print(f'audio-s/s pipelined: {frames * hop / sr / piped:,.0f}')


if __name__ == '__main__':
    main()
