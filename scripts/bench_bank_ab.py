"""A/B: CBHG conv bank fused (one K-tap conv) vs per-k dispatches, on chip.

Same process, interleaved trials, chained dispatches with one readback
(pooled-relay-safe methodology, see bench_readback_sanity.py). Times the
bank in isolation and the full postnet/prenet CBHG both ways.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BATCH, MAX_LEN, N_TOKENS = 4096, 256, 86


def chained_ms(dispatch, chain_in, x0, n=12, warm=2):
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

    from forwardtacotron_tpu.models.layers import CBHG
    from forwardtacotron_tpu.ops.pallas.rnn import pallas_rnns

    rs = np.random.RandomState(0)
    chain_h = jax.jit(lambda x0, y: x0 + (y[0, 0, 0] * 0).astype(x0.dtype))

    cases = [
        ('postnet K=8 in=80', 8, 256, [256, 80], 80, MAX_LEN),
        ('prenet K=16 in=256', 16, 256, [256, 256], 256, N_TOKENS),
    ]
    if len(sys.argv) > 1:
        keep = set(sys.argv[1:])
        cases = [c for c in cases if c[0].split()[0] in keep]
    for label, K, ch, proj, c_in, t_len in cases:
        # bank-only output is [B, T, K*C] (4.3 GB at B=4096, T=256) —
        # isolate the bank at a quarter batch and scale; pre_rnn runs full
        b_bank = BATCH // 4
        x = jnp.asarray(rs.randn(BATCH, t_len, c_in), jnp.bfloat16)
        xb = x[:b_bank]
        for fuse in (True, False):
            cb = CBHG(K=K, channels=ch, proj_channels=proj,
                      num_highways=4, dropout=0.0, fuse_bank=fuse)
            v = cb.init({'params': jax.random.PRNGKey(0)},
                        np.zeros((1, 8, c_in), np.float32), train=False)
            v = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                             if a.dtype == jnp.float32 else a, v)

            def _bank(vv, m, cb=cb):
                return (cb.apply(vv, m, method=CBHG._bank_fused)
                        if fuse else
                        cb.apply(vv, m, method=_unfused_bank))

            def _unfused_bank(mdl, m):
                t = m.shape[1]
                bank = [conv(m, False)[:, :t, :]
                        for conv in mdl.conv1d_bank]
                return jnp.concatenate(bank, axis=-1)

            bank_jit = jax.jit(lambda m, v=v: _bank(v, m))
            ms_bank = 4 * chained_ms(lambda mi: bank_jit(mi), chain_h, xb)

            def _full(vv, m, cb=cb):
                with pallas_rnns('on'):
                    return cb.apply(vv, m, train=False,
                                    method=CBHG.pre_rnn)
            full_jit = jax.jit(lambda m, v=v: _full(v, m))
            ms_full = chained_ms(lambda mi: full_jit(mi), chain_h, x)
            tag = 'fused  ' if fuse else 'unfused'
            print(f'{label:22s} {tag}  bank {ms_bank:7.2f} ms   '
                  f'pre_rnn {ms_full:7.2f} ms', flush=True)


if __name__ == '__main__':
    main()
