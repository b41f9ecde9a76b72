"""Serving throughput for ALL four acoustic model families on the chip.

bench.py reports the flagship (ForwardTacotron); this sweep measures the
same steady-state fused serving path (bf16, Pallas RNN kernels where
eligible, chained dispatches with one final readback — the only honest
timing through the pooled relay) for FastPitch and the multispeaker
variants too. Usage: python scripts/bench_models.py [model ...] with model
in {forward_tacotron, fast_pitch, multi_forward_tacotron, multi_fast_pitch}.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BATCH, MAX_LEN = 2048, 256


def main():
    import jax
    import jax.numpy as jnp

    from forwardtacotron_tpu.models.registry import init_tts_model
    from forwardtacotron_tpu.models.synthesis import TTSInference
    from forwardtacotron_tpu.text.tokenizer import Tokenizer
    from forwardtacotron_tpu.utils.files import read_config
    from bench import BENCH_SENTENCES

    names = sys.argv[1:] or ['forward_tacotron', 'fast_pitch',
                             'multi_forward_tacotron', 'multi_fast_pitch']

    tok = Tokenizer()
    token_lists = [tok(s) for s in BENCH_SENTENCES]
    max_tokens = max(len(t) for t in token_lists)

    for name in names:
        # the multispeaker fused graphs carry wider activations (speaker-emb
        # concat) — batch 2048 exceeds the 16G HBM
        batch = BATCH // 2 if name.startswith('multi') else BATCH
        x = np.zeros((batch, max_tokens), np.int64)
        for i in range(batch):
            toks = token_lists[i % len(token_lists)]
            x[i, :len(toks)] = toks
        cfg_file = ('configs/multispeaker.yaml' if name.startswith('multi')
                    else 'configs/singlespeaker.yaml')
        config = read_config(cfg_file)
        config['tts_model'] = name
        model = init_tts_model(config)
        multi = name.startswith('multi')
        hop = config['dsp']['hop_length']
        sr = config['dsp']['sample_rate']

        rs = np.random.RandomState(0)
        semb = None
        init_batch = {
            'x': x[:1], 'dur': np.ones((1, max_tokens), np.float32),
            'mel_len': np.array([max_tokens]),
            'pitch': np.zeros((1, max_tokens), np.float32),
            'energy': np.zeros((1, max_tokens), np.float32),
            'mel': np.zeros((1, max_tokens, config['dsp']['num_mels']),
                            np.float32),
        }
        if multi:
            dims = config[name]['model']['speaker_emb_dims']
            init_batch['speaker_emb'] = np.zeros((1, dims), np.float32)
            init_batch['pitch_cond'] = np.ones((1, max_tokens), np.int64)
            semb = jnp.asarray(rs.randn(batch, dims).astype(np.float32))
        variables = model.init({'params': jax.random.PRNGKey(0),
                                'dropout': jax.random.PRNGKey(1)},
                               init_batch, train=False)
        inference = TTSInference(model, variables, multispeaker=multi,
                                 dtype='bfloat16')
        xd = jnp.asarray(x)

        kwargs = {'speaker_emb': semb} if multi else {}
        out = inference.generate_fused(xd, max_len=MAX_LEN, **kwargs)
        jax.block_until_ready(out['mel_post'])
        frames = int(np.sum(np.minimum(np.asarray(out['mel_len']), MAX_LEN)))

        chain = jax.jit(lambda x, m: x + (m[0, 0, 0] * 0).astype(x.dtype))
        n_iters, best = 8, 0.0
        for _ in range(3):
            start = time.time()
            xi = xd
            for _ in range(n_iters):
                out = inference.generate_fused(xi, max_len=MAX_LEN, **kwargs)
                xi = chain(xd, out['mel_post'])
            float(np.asarray(out['mel_post'][0, 0, 0]))
            elapsed = time.time() - start
            best = max(best, n_iters * frames * hop / sr / elapsed)
        print(f'{name:24s} {best:10.1f} audio-s/s/chip '
              f'(batch {batch}, max_len {MAX_LEN})', flush=True)


if __name__ == '__main__':
    main()
