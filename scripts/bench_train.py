"""Training-step throughput on the real chip: f32 vs bf16 mixed precision.

Full-size singlespeaker ForwardTacotron, synthetic batch (bs x T like the
LJSpeech bucket shapes). Prints median-of-trials steps/s with spread per
(precision, batch size) — the reference bs=32 plus the large-batch recipes
evaluated by scripts/exp_student_recipe.py (sqrt-LR scaling); samples/s is
the number that matters for wall-clock-to-convergence.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax

    from forwardtacotron_tpu.dsp.dsp import DSP
    from forwardtacotron_tpu.models.registry import init_tts_model
    from forwardtacotron_tpu.parallel.mesh import shard_batch
    from forwardtacotron_tpu.train.forward_trainer import ForwardTrainer
    from forwardtacotron_tpu.train.state import create_train_state
    from forwardtacotron_tpu.utils.files import read_config
    from forwardtacotron_tpu.utils.paths import Paths
    import tempfile

    n_tok, t = 104, 832
    rs = np.random.RandomState(0)

    def make_batch(bs):
        return {
            'x': rs.randint(1, 130, (bs, n_tok)).astype(np.int64),
            'dur': np.full((bs, n_tok), t // n_tok, np.float32),
            'x_len': np.full((bs,), n_tok, np.int64),
            'mel_len': np.full((bs,), t, np.int64),
            'pitch': rs.randn(bs, n_tok).astype(np.float32),
            'energy': rs.rand(bs, n_tok).astype(np.float32),
            'pitch_target': rs.randn(bs, n_tok).astype(np.float32),
            'energy_target': rs.rand(bs, n_tok).astype(np.float32),
            'mel': rs.randn(bs, t, 80).astype(np.float32) - 4.0,
        }

    sizes = [32, 128, 256]
    for precision, bs in [(p_, b_) for p_ in ('float32', 'bfloat16')
                          for b_ in sizes]:
        if precision == 'float32' and bs != 32:
            continue        # large-batch recipes train bf16
        batch = make_batch(bs)
        config = read_config('configs/singlespeaker.yaml')
        tmp = tempfile.mkdtemp(prefix='bench_train_')
        config['data_path'] = f'{tmp}/data'
        config['checkpoint_path'] = f'{tmp}/ckpt'
        config['forward_tacotron']['training']['precision'] = precision
        paths = Paths.from_config(config)
        model = init_tts_model(config)
        variables = model.init({'params': jax.random.PRNGKey(0),
                                'dropout': jax.random.PRNGKey(1)},
                               batch, train=False)
        trainer = ForwardTrainer(paths, DSP.from_config(config), config)
        state = create_train_state(variables, trainer.tx)
        step_fn = trainer._get_train_step(model)
        db = shard_batch(batch, trainer.mesh)
        rng = jax.random.PRNGKey(0)

        # warmup/compile (float() = real readback; block_until_ready does
        # not await execution on the pooled relay)
        state, m = step_fn(state, db, rng)
        float(m['loss'])

        # steps chain through the donated state, so fetching the last
        # step's loss forces the whole sequence to have executed
        trials = []
        for _ in range(5):
            n = 20
            start = time.time()
            for _ in range(n):
                rng, sub = jax.random.split(rng)
                state, m = step_fn(state, db, sub)
            float(m['loss'])
            dt = time.time() - start
            trials.append(n / dt)
        trials.sort()
        best = trials[len(trials) // 2]    # median

        from forwardtacotron_tpu.utils.flops import (
            forward_tacotron_activation_bytes, forward_tacotron_param_bytes,
            forward_tacotron_train_flops, roofline_report)
        dt_bytes = 2 if precision == 'bfloat16' else 4
        step_flops = forward_tacotron_train_flops(config, bs, n_tok, t)
        # fwd + bwd activations ~ 3x one pass; params read once + grads
        # written once per step
        step_bytes = (3 * forward_tacotron_activation_bytes(
            config, bs, n_tok, t, dtype_bytes=dt_bytes)
            + 2 * forward_tacotron_param_bytes(config, dtype_bytes=4))
        roof = roofline_report(step_flops * best, step_bytes * best, 1.0,
                               dtype='bf16')
        print(f'{precision} bs={bs}: median {best:.2f} steps/s '
              f'[{trials[0]:.2f}, {trials[-1]:.2f}] = '
              f'{best*bs:.0f} samples/s (T={t}), '
              f'loss={float(m["loss"]):.4f} | '
              f'{roof["achieved_tflops"]:.1f} TF/s on {roof["chip"]} = '
              f'{roof["mfu"]*100:.1f}% MFU, '
              f'~{roof["achieved_hbm_gbps"]:.0f} GB/s HBM '
              f'({roof["hbm_util"]*100:.0f}%), {roof["bound"]}-bound')


if __name__ == '__main__':
    main()
