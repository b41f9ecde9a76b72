"""Sweep serving batch size / frame budget for the fused bf16 path."""

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
    hop = config['dsp']['hop_length']
    sr = config['dsp']['sample_rate']

    model = init_tts_model(config)
    tok = Tokenizer()
    token_lists = [tok(s) for s in BENCH_SENTENCES]
    max_tokens = max(len(t) for t in token_lists)

    init_batch = {
        'x': np.ones((1, max_tokens), np.int64),
        'dur': np.ones((1, max_tokens), np.float32),
        'mel_len': np.array([max_tokens]),
        'pitch': np.zeros((1, max_tokens), np.float32),
        'energy': np.zeros((1, max_tokens), np.float32),
        'mel': np.zeros((1, max_tokens, config['dsp']['num_mels']),
                        np.float32),
    }
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           init_batch, train=False)
    inference = TTSInference(model, variables, multispeaker=False,
                             dtype='bfloat16')

    for batch_size in (1024, 2048, 4096, 8192):
        x = np.zeros((batch_size, max_tokens), np.int64)
        for i in range(batch_size):
            toks = token_lists[i % len(token_lists)]
            x[i, :len(toks)] = toks
        max_len = 256
        out = inference.generate_fused(x, max_len=max_len)
        jax.block_until_ready(out['mel_post'])
        best = 0.0
        for _ in range(3):
            total = 0
            start = time.time()
            for _ in range(3):
                out = inference.generate_fused(x, max_len=max_len)
                total += int(np.sum(np.minimum(np.asarray(out['mel_len']),
                                               max_len)))
                np.asarray(out['mel_post'][0, 0, 0])
            dt = time.time() - start
            best = max(best, total * hop / sr / dt)
        print(f'batch {batch_size}: {best:,.0f} audio-s/s/chip')


if __name__ == '__main__':
    main()
