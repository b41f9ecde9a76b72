"""Teacher batch-size recipe: convergence-per-SAMPLE evidence (VERDICT r2 #7).

The round-2 measurement showed bs=128 gives +80% teacher throughput in
samples/s, but steps/s alone says nothing about convergence. This
experiment trains the Tacotron teacher on a synthetic-but-structured
dataset (each token id maps to a fixed mel pattern repeated for its
duration, so monotonic attention alignment is genuinely learnable) with:

  A. bs=32,  lr=1e-3       (the reference recipe, singlespeaker.yaml:77)
  B. bs=128, lr=2e-3       (sqrt LR scaling)
  C. bs=128, lr=4e-3       (linear LR scaling)

for the SAME total sample budget, evaluating teacher-forced masked L1 and
attention alignment/sharpness (utils/metrics.py attention_score) on a
held-out batch at fixed sample intervals. Output: JSON curves +
recommendation to /tmp/teacher_recipe.json and stdout.
"""

import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

VOCAB, N_MELS = 20, 80
N_TOK, R = 16, 2
PAD_VALUE = -11.5129
SAMPLE_BUDGET = 32 * 1200          # total training samples per recipe
EVAL_EVERY = 32 * 100              # samples between eval points


def make_items(n_items, rs):
    """Token sequences + structured mels: token id -> fixed mel pattern,
    repeated dur frames (+ noise)."""
    patterns = rs.randn(VOCAB, N_MELS).astype(np.float32) * 1.5 - 4.0
    items = []
    for _ in range(n_items):
        n = rs.randint(8, N_TOK + 1)
        toks = rs.randint(1, VOCAB, n)
        durs = rs.randint(2, 6, n)
        mel = np.concatenate([
            np.tile(patterns[t][None, :], (d, 1))
            for t, d in zip(toks, durs)])
        mel = mel + rs.randn(*mel.shape).astype(np.float32) * 0.1
        mel = np.maximum(mel, PAD_VALUE)
        items.append((toks, mel))
    return items


def collate(items, idx, t_max):
    b = len(idx)
    x = np.zeros((b, N_TOK), np.int64)
    mel = np.full((b, t_max, N_MELS), PAD_VALUE, np.float32)
    mel_len = np.zeros(b, np.int64)
    for j, i in enumerate(idx):
        toks, m = items[i]
        x[j, :len(toks)] = toks
        t = min(len(m), t_max)
        mel[j, :t] = m[:t]
        mel_len[j] = t
    return {'x': x, 'mel': mel, 'mel_len': mel_len,
            'x_len': np.array([len(items[i][0]) for i in idx], np.int64)}


def main():
    import jax

    from forwardtacotron_tpu.dsp.dsp import DSP
    from forwardtacotron_tpu.models.tacotron import Tacotron
    from forwardtacotron_tpu.train.state import (create_train_state,
                                                 set_learning_rate)
    from forwardtacotron_tpu.train.taco_trainer import TacoTrainer
    from forwardtacotron_tpu.utils.files import read_config
    from forwardtacotron_tpu.utils.metrics import attention_score
    from forwardtacotron_tpu.utils.paths import Paths

    rs = np.random.RandomState(0)
    items = make_items(512, rs)
    eval_items = make_items(64, np.random.RandomState(99))
    t_max = ((max(len(m) for _, m in items + eval_items) + R - 1) // R) * R

    config = read_config('configs/singlespeaker.yaml')
    tmp = tempfile.mkdtemp(prefix='exp_teacher_')
    config['data_path'] = f'{tmp}/data'
    config['checkpoint_path'] = f'{tmp}/ckpt'
    config['tacotron']['training']['precision'] = 'float32'
    paths = Paths.from_config(config)

    eval_batch = collate(eval_items, np.arange(64), t_max)

    recipes = [('bs32_lr1e-3', 32, 1e-3),
               ('bs128_lr2e-3', 128, 2e-3),
               ('bs128_lr4e-3', 128, 4e-3)]
    results = {}
    for label, bs, lr in recipes:
        model = Tacotron.from_config(config)
        variables = model.init(
            {'params': jax.random.PRNGKey(0),
             'dropout': jax.random.PRNGKey(1)},
            {'x': eval_batch['x'][:1], 'mel': eval_batch['mel'][:1]},
            r=R, train=False)
        trainer = TacoTrainer(paths, DSP.from_config(config), config)
        state = set_learning_rate(
            create_train_state(variables, trainer.tx), lr)
        step_fn = trainer._get_train_step(model, R)

        @jax.jit
        def eval_fn(variables, batch, model=model):
            import jax.numpy as jnp
            mel_out, linear, attn = model.apply(variables, batch, r=R,
                                                train=False)
            loss = (jnp.mean(jnp.abs(mel_out - batch['mel']))
                    + jnp.mean(jnp.abs(linear - batch['mel'])))
            return loss, attn

        rng = jax.random.PRNGKey(7)
        order = rs.permutation(len(items))
        pos, seen, next_eval = 0, 0, 0
        curve = []
        t0 = time.time()
        while seen < SAMPLE_BUDGET:
            if seen >= next_eval:
                loss, attn = eval_fn(state.variables(), eval_batch)
                loc, sharp = attention_score(
                    np.asarray(attn), eval_batch['mel_len'], r=R)
                curve.append(dict(samples=int(seen),
                                  eval_loss=float(loss),
                                  align=float(np.mean(loc)),
                                  sharp=float(np.mean(sharp))))
                print(f'{label:14s} {seen:7d} samples  '
                      f'loss {float(loss):.4f}  align '
                      f'{np.mean(loc):.3f}  sharp {np.mean(sharp):.3f}',
                      flush=True)
                next_eval += EVAL_EVERY
            if pos + bs > len(order):
                order = rs.permutation(len(items))
                pos = 0
            batch = collate(items, order[pos:pos + bs], t_max)
            pos += bs
            rng, sub = jax.random.split(rng)
            state, metrics, _ = step_fn(state, batch, sub)
            seen += bs
        loss, attn = eval_fn(state.variables(), eval_batch)
        loc, sharp = attention_score(np.asarray(attn),
                                     eval_batch['mel_len'], r=R)
        curve.append(dict(samples=int(seen), eval_loss=float(loss),
                          align=float(np.mean(loc)),
                          sharp=float(np.mean(sharp))))
        results[label] = dict(bs=bs, lr=lr, curve=curve,
                              wall_s=round(time.time() - t0, 1))
        print(f'{label:14s} FINAL loss {float(loss):.4f} align '
              f'{np.mean(loc):.3f} sharp {np.mean(sharp):.3f} '
              f'({results[label]["wall_s"]} s)', flush=True)

    out = Path('/tmp/teacher_recipe.json')
    out.write_text(json.dumps(results, indent=1))
    print(f'wrote {out}')


if __name__ == '__main__':
    main()
