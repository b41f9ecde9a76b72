"""Timing-methodology sanity check on the pooled-relay TPU.

Queues n identical dispatches back-to-back with ONE final block, at several
n, plus a no-op dispatch floor and a chained (data-dependent) variant where
call k+1 consumes call k's output — the chained number is the trustworthy
per-call device time (no overlap, no dedup possible).
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
    variables = mod.init(jax.random.PRNGKey(0), x.astype(jnp.float32))
    variables = jax.tree.map(lambda a: a.astype(jnp.bfloat16), variables)

    def loss(p, x):
        return jnp.sum(mod.apply({'params': p}, x).astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss))
    gx = jax.jit(jax.grad(loss, argnums=1))  # same-shape output as input

    noop = jax.jit(lambda a: a + 1.0)
    small = jnp.zeros((8, 128), jnp.float32)

    # warm
    jax.block_until_ready(g(variables['params'], x))
    jax.block_until_ready(gx(variables['params'], x))
    jax.block_until_ready(noop(small))

    for name, fn, args in (('noop', noop, (small,)),
                           ('bilstm_grad_params', g,
                            (variables['params'], x))):
        for n in (10, 100):
            t0 = time.time()
            out = None
            for _ in range(n):
                out = fn(*args)
            jax.block_until_ready(out)
            dt = (time.time() - t0) / n * 1000
            print(f'{name:22s} n={n:4d}  {dt:8.3f} ms/call', flush=True)

    # chained: each call's input is the previous call's output -> the device
    # cannot overlap or skip anything
    for n in (10, 50):
        y = x
        t0 = time.time()
        for _ in range(n):
            y = gx(variables['params'], y)
        jax.block_until_ready(y)
        dt = (time.time() - t0) / n * 1000
        print(f'bilstm_grad_chained    n={n:4d}  {dt:8.3f} ms/call',
              flush=True)


if __name__ == '__main__':
    main()
