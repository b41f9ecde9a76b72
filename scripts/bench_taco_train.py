"""Tacotron teacher training-step throughput on the chip.

The teacher is stage 2 of the reference workflow (train_tacotron.py) and the
alignment source for the forward models; its decoder is a sequential
`nn.scan` over T//r attention+RNN steps, so throughput depends strongly on
the reduction factor r (schedule goes r=5 -> r=1,
configs/singlespeaker.yaml:77-80). Chained steps through donated state +
one readback (see bench_readback_sanity.py). Prints steps/s per (r,
precision) at the reference's bucket shapes.
"""

import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


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

            best = 0.0
            for _ in range(3):
                n = 10
                start = time.time()
                for _ in range(n):
                    rng, sub = jax.random.split(rng)
                    state, m, _ = step_fn(state, batch, sub)
                float(m['loss'])
                dt = time.time() - start
                best = max(best, n / dt)
            print(f'{precision:9s} r={r}: {best:6.2f} steps/s '
                  f'(bs={bs}, T={t}), loss={float(m["loss"]):.4f}',
                  flush=True)


if __name__ == '__main__':
    main()
