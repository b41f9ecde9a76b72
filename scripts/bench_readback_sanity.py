"""Does block_until_ready actually await execution on the relay?

Chains n data-dependent grad calls and then FETCHES the result (np.asarray),
for several n. slope(total_time vs n) = true per-call device time; compare
against the block_until_ready-only numbers.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp
    from forwardtacotron_tpu.models.layers import BiLSTM

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(32, 832, 512), jnp.bfloat16)
    mod = BiLSTM(512)
    variables = mod.init(jax.random.PRNGKey(0), np.asarray(x, np.float32))
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                          variables)['params']

    def loss(p, x):
        return jnp.sum(mod.apply({'params': p}, x).astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss, argnums=1))
    y = g(params, x)
    _ = float(jnp.sum(y.astype(jnp.float32)))  # warm + fetch

    for n in (5, 20, 60):
        y = x
        t0 = time.time()
        for _ in range(n):
            y = g(params, y)
        s = float(jnp.sum(y.astype(jnp.float32)))  # full readback
        total = time.time() - t0
        print(f'n={n:3d}  total={total*1000:9.1f} ms  '
              f'per-call={total/n*1000:8.2f} ms  (checksum {s:.3e})',
              flush=True)


if __name__ == '__main__':
    main()
