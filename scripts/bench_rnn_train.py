"""Scan vs fused-Pallas (custom VJP) RNN training-path timing on the chip.

Chained data-dependent grad calls (call k+1 consumes call k's output) so the
pooled relay cannot overlap or cache anything: the per-call number is true
device time for forward + backward.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def chained_ms(fn, params, x, n=40):
    """Chained data-dependent calls ending in a full readback — on the
    pooled relay block_until_ready does NOT await execution (see
    bench_readback_sanity.py), so only fetched values give true time.
    Subtracts the n=8 run to cancel fixed dispatch/readback overhead."""
    import jax.numpy as jnp

    def run(k):
        y = x
        t0 = time.time()
        for _ in range(k):
            y = fn(params, y)
        float(jnp.sum(y.astype(jnp.float32)))
        return time.time() - t0

    run(4)  # warm
    t_small, t_big = run(8), run(n)
    return (t_big - t_small) / (n - 8) * 1000


def main():
    import jax
    import jax.numpy as jnp
    from forwardtacotron_tpu.models.layers import BiGRU, BiLSTM
    from forwardtacotron_tpu.ops.pallas.rnn import pallas_rnns

    rs = np.random.RandomState(0)

    cases = [
        ('BiLSTM H=512 T=832', BiLSTM(512), (32, 832, 512), 1024),
        ('BiGRU  H=256 T=832', BiGRU(256), (32, 832, 256), 512),
    ]
    for name, mod, shape, _ in cases:
        x = jnp.asarray(rs.randn(*shape), jnp.bfloat16)
        variables = mod.init(jax.random.PRNGKey(0),
                             np.asarray(x, np.float32))
        params_bf16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                                   variables)['params']

        def loss(p, x):
            out = mod.apply({'params': p}, x).astype(jnp.float32)
            return jnp.sum(out ** 2)

        def make(mode):
            def g(p, x):
                with pallas_rnns(mode):
                    return jax.grad(loss, argnums=1)(p, x)
            return jax.jit(g)

        for mode in ('off', 'train'):
            ms = chained_ms(make(mode), params_bf16, x)
            print(f'{name}  mode={mode:5s}  fwd+bwd {ms:7.2f} ms', flush=True)


if __name__ == '__main__':
    main()
