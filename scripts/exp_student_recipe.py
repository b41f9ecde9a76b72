"""Student (ForwardTacotron) batch-size recipe: convergence-per-SAMPLE
evidence (VERDICT r4 #5, mirroring exp_teacher_recipe.py).

The reference student schedule is lr=5e-5 at bs=32
(configs/singlespeaker.yaml:106-108) — at 30-40 steps/s a v5e is mostly
dispatch-bound at that batch size. This experiment trains the student on a
synthetic-but-structured dataset (token id -> fixed mel pattern repeated
for its known duration; pitch/energy are deterministic per-token values,
so every head has learnable signal) with:

  A. bs=32,  lr=5e-5        (the reference recipe)
  B. bs=128, lr=1e-4        (sqrt LR scaling)
  C. bs=128, lr=2e-4        (linear LR scaling)
  D. bs=256, lr=1.4e-4      (sqrt LR scaling)

for the SAME total sample budget, evaluating masked mel L1 (post) and the
dur/pitch/energy head L1s on a held-out batch at fixed sample intervals.
Output: JSON curves + recommendation to
scripts/results/student_recipe.json and stdout.
"""

import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

VOCAB, N_MELS = 20, 80
N_TOK = 16
PAD_VALUE = -11.5129
SAMPLE_BUDGET = 32 * 1200
EVAL_EVERY = 32 * 100
T_MAX = 96       # >= N_TOK * max dur


def make_items(n_items, rs):
    patterns = rs.randn(VOCAB, N_MELS).astype(np.float32) * 1.5 - 4.0
    pitches = (rs.rand(VOCAB).astype(np.float32) * 2.0 + 0.5)
    energies = (rs.rand(VOCAB).astype(np.float32) * 1.5 + 0.2)
    items = []
    for _ in range(n_items):
        n = rs.randint(8, N_TOK + 1)
        toks = rs.randint(1, VOCAB, n)
        durs = rs.randint(2, 6, n).astype(np.float32)
        mel = np.concatenate([
            np.tile(patterns[t][None, :], (int(d), 1))
            for t, d in zip(toks, durs)])
        mel = mel + rs.randn(*mel.shape).astype(np.float32) * 0.1
        mel = np.maximum(mel, PAD_VALUE)
        items.append((toks, durs, pitches[toks], energies[toks], mel))
    return items


def collate(items, idx):
    b = len(idx)
    x = np.zeros((b, N_TOK), np.int64)
    dur = np.zeros((b, N_TOK), np.float32)
    pitch = np.zeros((b, N_TOK), np.float32)
    energy = np.zeros((b, N_TOK), np.float32)
    mel = np.full((b, T_MAX, N_MELS), PAD_VALUE, np.float32)
    mel_len = np.zeros(b, np.int64)
    x_len = np.zeros(b, np.int64)
    for j, i in enumerate(idx):
        toks, d, p, e, m = items[i]
        n = len(toks)
        x[j, :n] = toks
        dur[j, :n] = d
        pitch[j, :n] = p
        energy[j, :n] = e
        t = min(len(m), T_MAX)
        mel[j, :t] = m[:t]
        mel_len[j] = t
        x_len[j] = n
    return {'x': x, 'dur': dur, 'pitch': pitch, 'energy': energy,
            'pitch_target': pitch.copy(), 'energy_target': energy.copy(),
            'mel': mel, 'mel_len': mel_len, 'x_len': x_len}


def main():
    import jax

    from forwardtacotron_tpu.dsp.dsp import DSP
    from forwardtacotron_tpu.models.forward_tacotron import ForwardTacotron
    from forwardtacotron_tpu.train.common import masked_l1
    from forwardtacotron_tpu.train.forward_trainer import ForwardTrainer
    from forwardtacotron_tpu.train.state import (create_train_state,
                                                 set_learning_rate)
    from forwardtacotron_tpu.utils.files import read_config
    from forwardtacotron_tpu.utils.paths import Paths

    rs = np.random.RandomState(0)
    items = make_items(512, rs)
    eval_items = make_items(64, np.random.RandomState(99))
    eval_batch = collate(eval_items, np.arange(64))

    config = read_config('configs/singlespeaker.yaml')
    tmp = tempfile.mkdtemp(prefix='exp_student_')
    config['data_path'] = f'{tmp}/data'
    config['checkpoint_path'] = f'{tmp}/ckpt'
    config['forward_tacotron']['training']['precision'] = 'float32'
    paths = Paths.from_config(config)

    recipes = [('bs32_lr5e-5', 32, 5e-5),
               ('bs128_lr1e-4', 128, 1e-4),
               ('bs128_lr2e-4', 128, 2e-4),
               ('bs256_lr1.4e-4', 256, 1.4e-4)]
    results = {}
    for label, bs, lr in recipes:
        model = ForwardTacotron.from_config(config)
        variables = model.init(
            {'params': jax.random.PRNGKey(0),
             'dropout': jax.random.PRNGKey(1)},
            {k: eval_batch[k][:1] for k in
             ('x', 'dur', 'pitch', 'energy', 'mel', 'mel_len', 'x_len')},
            train=False)
        trainer = ForwardTrainer(paths, DSP.from_config(config), config)
        state = set_learning_rate(
            create_train_state(variables, trainer.tx), lr)
        step_fn = trainer._get_train_step(model)

        @jax.jit
        def eval_fn(variables, batch, model=model):
            out = model.apply(variables, batch, train=False)
            return (masked_l1(out['mel_post'], batch['mel'],
                              batch['mel_len']),
                    masked_l1(out['dur'], batch['dur'], batch['x_len']),
                    masked_l1(out['pitch'], batch['pitch_target'],
                              batch['x_len']),
                    masked_l1(out['energy'], batch['energy_target'],
                              batch['x_len']))

        rng = jax.random.PRNGKey(7)
        order = rs.permutation(len(items))
        pos, seen, next_eval = 0, 0, 0
        curve = []
        t0 = time.time()

        def do_eval(seen):
            mel_l1, dur_l1, pitch_l1, energy_l1 = [
                float(v) for v in eval_fn(state.variables(), eval_batch)]
            curve.append(dict(samples=int(seen), mel_post_l1=mel_l1,
                              dur_l1=dur_l1, pitch_l1=pitch_l1,
                              energy_l1=energy_l1))
            print(f'{label:15s} {seen:7d} samples  mel {mel_l1:.4f}  '
                  f'dur {dur_l1:.4f}  pitch {pitch_l1:.4f}  '
                  f'energy {energy_l1:.4f}', flush=True)

        while seen < SAMPLE_BUDGET:
            if seen >= next_eval:
                do_eval(seen)
                next_eval += EVAL_EVERY
            if pos + bs > len(order):
                order = rs.permutation(len(items))
                pos = 0
            batch = collate(items, order[pos:pos + bs])
            pos += bs
            rng, sub = jax.random.split(rng)
            state, metrics = step_fn(state, batch, sub)[:2]
            seen += bs
        do_eval(seen)
        results[label] = dict(bs=bs, lr=lr, curve=curve,
                              wall_s=round(time.time() - t0, 1))

    finals = {k: v['curve'][-1] for k, v in results.items()}
    best = min(finals, key=lambda k: finals[k]['mel_post_l1'])
    results['recommendation'] = (
        f'best final mel_post L1: {best}; see STATUS.md for the analysis')
    out = Path(__file__).resolve().parent / 'results' / 'student_recipe.json'
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(results, indent=1))
    print(f'wrote {out}; best final mel_post L1: {best}')


if __name__ == '__main__':
    main()
