"""Per-block fwd+bwd timing of the ForwardTacotron train step on the chip.

Times jitted value_and_grad of each sub-block in isolation (series
predictors, prenet CBHG, frame-rate BiLSTM, postnet CBHG) at the training
shapes (bs=32, N=104 tokens, T=832 frames), f32 and bf16, to locate where
the ~34ms step goes before optimizing.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timeit(fn, *args, n=10):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.time() - t0) / n)
    return best * 1000


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from forwardtacotron_tpu.models.layers import CBHG, BiGRU, BiLSTM
    from forwardtacotron_tpu.models.forward_tacotron import SeriesPredictor

    bs, n_tok, t = 32, 104, 832
    rs = np.random.RandomState(0)
    x_tok = jnp.asarray(rs.randint(1, 130, (bs, n_tok)))
    rows = []

    for dtype_name in ('float32', 'bfloat16'):
        dtype = jnp.float32 if dtype_name == 'float32' else jnp.bfloat16

        def bench_block(name, module, *args, train_kw=True, has_dropout=True):
            rngs = {'params': jax.random.PRNGKey(0)}
            if has_dropout:
                rngs['dropout'] = jax.random.PRNGKey(1)
            kw = {'train': True} if train_kw else {}
            variables = module.init(rngs, *args, **kw)
            params = variables['params']
            stats = variables.get('batch_stats')

            def loss(p, *a):
                v = {'params': jax.tree.map(
                    lambda q: q.astype(dtype)
                    if q.dtype == jnp.float32 else q, p)}
                if stats is not None:
                    v['batch_stats'] = stats
                out = module.apply(
                    v, *a, **kw,
                    rngs={'dropout': jax.random.PRNGKey(2)}
                    if has_dropout else {},
                    mutable=['batch_stats'] if stats is not None else False)
                if stats is not None:
                    out = out[0]
                return jnp.sum(out.astype(jnp.float32) ** 2)

            g = jax.jit(jax.grad(loss))
            args_c = tuple(a.astype(dtype)
                           if hasattr(a, 'dtype') and a.dtype == jnp.float32
                           else a for a in args)
            ms = timeit(g, params, *args_c)
            rows.append((dtype_name, name, ms))
            print(f'{dtype_name:9s} {name:28s} {ms:7.2f} ms', flush=True)

        h_frames = jnp.asarray(rs.randn(bs, t, 512), jnp.float32)
        mel_frames = jnp.asarray(rs.randn(bs, t, 80), jnp.float32)
        tok_feat = jnp.asarray(rs.randn(bs, n_tok, 256), jnp.float32)

        bench_block('series_pred (dur, H=64)',
                    SeriesPredictor(num_chars=135), x_tok)
        bench_block('prenet CBHG (K=16, N=104)',
                    CBHG(K=16, channels=256, proj_channels=[256, 256],
                         num_highways=4), tok_feat)
        bench_block('frame BiLSTM (H=512,T=832)', BiLSTM(512), h_frames,
                    train_kw=False, has_dropout=False)
        bench_block('postnet CBHG (K=8, T=832)',
                    CBHG(K=8, channels=256, proj_channels=[256, 80],
                         num_highways=4, dropout=0.0), mel_frames)
        bench_block('postnet BiGRU only (T=832)', BiGRU(256),
                    jnp.asarray(rs.randn(bs, t, 256), jnp.float32),
                    train_kw=False, has_dropout=False)


if __name__ == '__main__':
    main()
