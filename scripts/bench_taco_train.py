"""Tacotron teacher training-step throughput on the chip.

The teacher is stage 2 of the reference workflow (train_tacotron.py) and the
alignment source for the forward models; its decoder is a sequential
`nn.scan` over T//r attention+RNN steps, so throughput depends strongly on
the reduction factor r (schedule goes r=5 -> r=1,
configs/singlespeaker.yaml:77-80). Chained steps through donated state +
one readback (see bench_readback_sanity.py). Prints min/median/max steps/s
over N_TRIALS per (r, precision) at the reference's bucket shapes and
writes scripts/results/taco_train_dispersion.json — the pooled chip
jitters, so round-over-round deltas need the spread to be judged signal.
"""

import json
import statistics
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_TRIALS = 5


def main():
    import jax
    import jax.numpy as jnp

    from forwardtacotron_tpu.dsp.dsp import DSP
    from forwardtacotron_tpu.models.tacotron import Tacotron
    from forwardtacotron_tpu.train.state import create_train_state
    from forwardtacotron_tpu.train.taco_trainer import TacoTrainer
    from forwardtacotron_tpu.utils.files import read_config
    from forwardtacotron_tpu.utils.paths import Paths

    bs, n_tok, t = 32, 104, 840      # t divisible by r in {5, 1}
    rs = np.random.RandomState(0)
    batch = {
        'x': rs.randint(1, 130, (bs, n_tok)).astype(np.int64),
        'mel': (rs.randn(bs, t, 80).astype(np.float32) - 4.0),
    }

    results = {}
    for precision in ('float32', 'bfloat16'):
        config = read_config('configs/singlespeaker.yaml')
        tmp = tempfile.mkdtemp(prefix='bench_taco_')
        config['data_path'] = f'{tmp}/data'
        config['checkpoint_path'] = f'{tmp}/ckpt'
        config['tacotron']['training']['precision'] = precision
        paths = Paths.from_config(config)

        model = Tacotron.from_config(config)
        variables = model.init({'params': jax.random.PRNGKey(0),
                                'dropout': jax.random.PRNGKey(1)},
                               {'x': batch['x'][:1], 'mel': batch['mel'][:1]},
                               r=5, train=False)
        trainer = TacoTrainer(paths, DSP.from_config(config), config)
        for r in (5, 1):
            # fresh device copy: the jitted step donates its state argument,
            # and that state aliases `variables` — without the copy the next
            # (precision, r) session would build a state from deleted buffers
            fresh = jax.tree.map(lambda a: jnp.array(a), variables)
            state = create_train_state(fresh, trainer.tx)
            step_fn = trainer._get_train_step(model, r)
            rng = jax.random.PRNGKey(0)

            state, m, _ = step_fn(state, batch, rng)
            float(m['loss'])          # forces compile + first step

            trials = []
            for _ in range(N_TRIALS):
                n = 10
                start = time.time()
                for _ in range(n):
                    rng, sub = jax.random.split(rng)
                    state, m, _ = step_fn(state, batch, sub)
                float(m['loss'])
                dt = time.time() - start
                trials.append(n / dt)
            trials.sort()
            med = statistics.median(trials)
            results[f'{precision}_r{r}'] = {
                'min': round(trials[0], 2), 'median': round(med, 2),
                'max': round(trials[-1], 2), 'trials': len(trials)}
            print(f'{precision:9s} r={r}: median {med:6.2f} steps/s '
                  f'[min {trials[0]:.2f}, max {trials[-1]:.2f}, '
                  f'n={len(trials)}] (bs={bs}, T={t}), '
                  f'loss={float(m["loss"]):.4f}', flush=True)

    out = Path(__file__).resolve().parent / 'results' / \
        'taco_train_dispersion.json'
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(results, indent=1))
    print(f'wrote {out}')


if __name__ == '__main__':
    main()
