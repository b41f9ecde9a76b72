"""Honest per-stage timing of the fused serving path on the chip.

Chained data-dependent dispatches ending in one readback (the only timing
methodology that works through the pooled relay — block_until_ready does not
await execution there, see bench_readback_sanity.py). Times, at the bench
shapes (batch 4096, max_len 256, bf16, Pallas kernels on):

  * full fused generate (the bench.py dispatch)
  * token stage only (predict_series: 4 fused GRUs at token rate)
  * frame BiLSTM only at the decode shape
  * postnet CBHG only at the decode shape

to locate where the ~0.5 s dispatch goes before optimizing further.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BATCH, MAX_LEN = 4096, 256


def chained_ms(dispatch, chain_in, x0, n=12, warm=2):
    """dispatch(x) -> y; chain_in(x0, y) -> next x. Returns ms/call."""
    import jax.numpy as jnp

    def run(k):
        xi = x0
        t0 = time.time()
        for _ in range(k):
            y = dispatch(xi)
            xi = chain_in(x0, y)
        float(jnp.sum(y.astype(jnp.float32).ravel()[:1]))
        return time.time() - t0

    run(warm)
    t_small, t_big = run(4), run(n)
    return (t_big - t_small) / (n - 4) * 1000


def main():
    import jax
    import jax.numpy as jnp

    stages = set(sys.argv[1:]) or {'full', 'token', 'lstm', 'post', 'lr'}

    from forwardtacotron_tpu.models.registry import init_tts_model
    from forwardtacotron_tpu.models.synthesis import TTSInference
    from forwardtacotron_tpu.models.layers import BiLSTM, CBHG
    from forwardtacotron_tpu.ops.pallas.rnn import pallas_rnns
    from forwardtacotron_tpu.text.tokenizer import Tokenizer
    from forwardtacotron_tpu.utils.files import read_config
    from bench import BENCH_SENTENCES

    config = read_config('configs/singlespeaker.yaml')
    model = init_tts_model(config)
    tok = Tokenizer()
    token_lists = [tok(s) for s in BENCH_SENTENCES]
    max_tokens = max(len(t) for t in token_lists)
    x = np.zeros((BATCH, max_tokens), np.int64)
    for i in range(BATCH):
        toks = token_lists[i % len(token_lists)]
        x[i, :len(toks)] = toks

    init_batch = {
        'x': x[:1], 'dur': np.ones((1, max_tokens), np.float32),
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
    xd = jnp.asarray(x)

    # --- full fused dispatch (what bench.py measures)
    fused = inference._get_fused(MAX_LEN) if 'full' in stages else None
    chain_tok = jax.jit(
        lambda x0, y: x0 + (y[0, 0, 0] * 0).astype(x0.dtype))
    if 'full' in stages:
        ms = chained_ms(
            lambda xi: fused(inference.variables, xi, 1.0)['mel_post'],
            chain_tok, xd)
        print(f'full fused generate      {ms:8.2f} ms', flush=True)

    # --- token stage only
    if 'token' in stages:
        ms = chained_ms(
            lambda xi: inference._predict(
                inference.variables, xi, 1.0)['dur'],
            jax.jit(lambda x0, y: x0 + (y[0, 0] * 0).astype(x0.dtype)), xd)
        print(f'token stage (4 GRUs)     {ms:8.2f} ms', flush=True)

    rs = np.random.RandomState(0)
    chain_h = jax.jit(lambda x0, y: x0 + (y[0, 0, 0] * 0).astype(x0.dtype))

    # --- frame BiLSTM at decode shape
    if 'lstm' in stages:
        h = jnp.asarray(rs.randn(BATCH, MAX_LEN, 512), jnp.bfloat16)
        lstm = BiLSTM(512)
        lv = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                          lstm.init(jax.random.PRNGKey(0),
                                    np.zeros((1, 8, 512), np.float32)))

        def _lstm_traced(v, h):
            with pallas_rnns('on'):
                return lstm.apply(v, h)
        lstm_jit = jax.jit(_lstm_traced)
        ms = chained_ms(lambda hi: lstm_jit(lv, hi), chain_h, h)
        print(f'frame BiLSTM (H=512)     {ms:8.2f} ms', flush=True)

    # --- postnet CBHG at decode shape
    if 'post' in stages:
        mel = jnp.asarray(rs.randn(BATCH, MAX_LEN, 80), jnp.bfloat16)
        post = CBHG(K=8, channels=256, proj_channels=[256, 80],
                    num_highways=4, dropout=0.0)
        pv = post.init({'params': jax.random.PRNGKey(0)},
                       np.zeros((1, 8, 80), np.float32), train=False)
        pv = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                          if a.dtype == jnp.float32 else a, pv)

        def _post_traced(v, m):
            with pallas_rnns('on'):
                return post.apply(v, m, train=False)
        post_jit = jax.jit(_post_traced)
        ms = chained_ms(lambda mi: post_jit(pv, mi), chain_h, mel)
        print(f'postnet CBHG (K=8)       {ms:8.2f} ms', flush=True)

    # --- prenet CBHG pre_rnn at token rate (its GRU lives in multi_bigru)
    if 'prenet' in stages:
        tok_feat = jnp.asarray(rs.randn(BATCH, max_tokens, 256),
                               jnp.bfloat16)
        pre = CBHG(K=16, channels=256, proj_channels=[256, 256],
                   num_highways=4)
        prv = pre.init({'params': jax.random.PRNGKey(0)},
                       np.zeros((1, 8, 256), np.float32), train=False)
        prv = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                           if a.dtype == jnp.float32 else a, prv)

        def _pre_traced(v, m):
            with pallas_rnns('on'):
                return pre.apply(v, m, train=False,
                                 method=CBHG.pre_rnn)
        pre_jit = jax.jit(_pre_traced)
        ms = chained_ms(lambda mi: pre_jit(prv, mi), chain_h, tok_feat)
        print(f'prenet pre_rnn (K=16)    {ms:8.2f} ms', flush=True)

    # --- length regulator at decode shape
    if 'lr' in stages:
        from forwardtacotron_tpu.ops.length_regulator import \
            length_regulator_auto
        tok_h = jnp.asarray(rs.randn(BATCH, max_tokens, 512), jnp.bfloat16)
        dur = jnp.asarray(
            rs.uniform(1.0, 4.0, (BATCH, max_tokens)), jnp.float32)
        lr_jit = jax.jit(
            lambda h, d: length_regulator_auto(h, d, max_len=MAX_LEN))
        ms = chained_ms(lambda hi: lr_jit(hi, dur), chain_h, tok_h)
        print(f'length regulator         {ms:8.2f} ms', flush=True)


if __name__ == '__main__':
    main()
