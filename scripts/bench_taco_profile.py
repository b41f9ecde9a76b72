"""Decompose the Tacotron teacher train-step cost on the chip.

The headline bench (bench_taco_train.py) shows steps/s nearly independent
of the reduction factor r (168 vs 840 sequential decode steps) AND of
precision — i.e. the wall time is NOT dominated by the decoder scan math.
This script isolates where it goes:

  1. train step timed at chain depths 10 vs 40: separates the per-trial
     readback RTT (pooled relay ~170 ms) from real per-step cost;
  2. forward-only (no grad/opt) at r=1;
  3. encoder+postnet only (no decoder scan).

The TPU executes dispatches in order, so one readback at the end of a
chain bounds the whole chain's execution.
"""

import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from forwardtacotron_tpu.models.tacotron import Tacotron
    from forwardtacotron_tpu.train.state import (create_train_state,
                                                 make_optimizer)
    from forwardtacotron_tpu.utils.files import read_config

    bs, n_tok, t = 32, 104, 840
    r = 1
    rs = np.random.RandomState(0)
    batch = {
        'x': rs.randint(1, 130, (bs, n_tok)).astype(np.int64),
        'mel': (rs.randn(bs, t, 80).astype(np.float32) - 4.0),
    }
    config = read_config('configs/singlespeaker.yaml')
    model = Tacotron.from_config(config)
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           {'x': batch['x'][:1], 'mel': batch['mel'][:1]},
                           r=r, train=False)
    batch_d = jax.device_put(batch)
    tx = make_optimizer(1e-4, 1.0)

    def loss_fn(params, bstats, batch, rng):
        (mel_out, linear, _), _mut = model.apply(
            {'params': params, 'batch_stats': bstats}, batch, r=r,
            train=True, rngs={'dropout': rng}, mutable=['batch_stats'])
        return (jnp.mean(jnp.abs(mel_out - batch['mel']))
                + jnp.mean(jnp.abs(linear - batch['mel'])))

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch, rng):
        grads = jax.grad(loss_fn)(state.params, state.batch_stats,
                                  batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        return state.replace(params=params, opt_state=opt_state,
                             step=state.step + 1)

    def mk_state():
        return create_train_state(jax.tree.map(jnp.array, variables), tx)

    rng = jax.random.PRNGKey(0)

    # warm compile
    s = train_step(mk_state(), batch_d, rng)
    float(np.asarray(s.step))

    for n in (10, 40):
        best = 1e9
        for _ in range(2):
            state = mk_state()
            float(np.asarray(state.step))   # state fully materialized
            start = time.time()
            for _ in range(n):
                rng, sub = jax.random.split(rng)
                state = train_step(state, batch_d, sub)
            float(np.asarray(state.step))   # one readback bounds the chain
            best = min(best, (time.time() - start) / n)
        print(f'train step r={r} (chain n={n}): {best * 1e3:.1f} ms',
              flush=True)

    @jax.jit
    def fwd_only(variables, batch, rng):
        (mel_out, linear, _), _mut = model.apply(
            variables, batch, r=r, train=True, rngs={'dropout': rng},
            mutable=['batch_stats'])
        return jnp.mean(mel_out) + jnp.mean(linear)

    out = fwd_only(variables, batch_d, rng)
    float(np.asarray(out))
    for n in (20,):
        best = 1e9
        for _ in range(2):
            start = time.time()
            for _ in range(n):
                rng, sub = jax.random.split(rng)
                out = fwd_only(variables, batch_d, sub)
            float(np.asarray(out))          # in-order execution bounds chain
            best = min(best, (time.time() - start) / n)
        print(f'forward only r={r}: {best * 1e3:.1f} ms', flush=True)

    def enc_post(mdl, batch):
        pq, pj = mdl._encode(batch['x'], None, True)
        post = mdl.postnet(batch['mel'], True)
        lin = mdl.post_proj(post)
        return jnp.mean(pq) + jnp.mean(pj) + jnp.mean(lin)

    @jax.jit
    def enc_post_only(variables, batch, rng):
        out, _mut = model.apply(variables, batch, method=enc_post,
                                rngs={'dropout': rng},
                                mutable=['batch_stats'])
        return out

    out = enc_post_only(variables, batch_d, rng)
    float(np.asarray(out))
    best = 1e9
    for _ in range(2):
        start = time.time()
        for _ in range(20):
            rng, sub = jax.random.split(rng)
            out = enc_post_only(variables, batch_d, sub)
        float(np.asarray(out))
        best = min(best, (time.time() - start) / 20)
    print(f'encoder+postnet only: {best * 1e3:.1f} ms', flush=True)


if __name__ == '__main__':
    main()
