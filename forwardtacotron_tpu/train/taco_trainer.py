"""Tacotron teacher trainer (reference trainer/taco_trainer.py:34-187).

Schedule rows are (r, lr, max_step, batch_size); each session jits its own
train step because the reduction factor r is a static shape parameter.
Losses are plain (unmasked) L1 on mel + postnet-linear outputs, matching
the reference (:76-78). Attention location/sharpness scores are logged and
attention/mel plots + Griffin-Lim audio go to the writer.
"""

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from forwardtacotron_tpu.data.dataset import get_taco_dataloaders
from forwardtacotron_tpu.dsp.dsp import DSP
from forwardtacotron_tpu.parallel.mesh import (make_mesh,
                                               pad_batch_to_devices,
                                               shard_batch)
from forwardtacotron_tpu.train.common import (Averager, StepTimer, TTSSession,
                                              cast_floats)
from forwardtacotron_tpu.train.forward_trainer import make_writer
from forwardtacotron_tpu.train.state import (TrainState, create_train_state,
                                             make_optimizer,
                                             set_learning_rate)
from forwardtacotron_tpu.utils.checkpoints import save_checkpoint
from forwardtacotron_tpu.utils.display import (ignore_exception,
                                               plot_attention, plot_mel,
                                               simple_table, stream)
from forwardtacotron_tpu.utils.files import parse_schedule
from forwardtacotron_tpu.utils.metrics import attention_score
from forwardtacotron_tpu.utils.paths import Paths

BATCH_KEYS = ('x', 'mel', 'mel_len', 'x_len', 'speaker_emb')


class TacoTrainer:

    def __init__(self, paths: Paths, dsp: DSP, config: Dict[str, Any],
                 mesh=None) -> None:
        self.paths = paths
        self.dsp = dsp
        self.config = config
        self.train_cfg = config['tacotron']['training']
        self.mesh = mesh if mesh is not None else make_mesh()
        self.writer = make_writer(paths.taco_log)
        first_lr = parse_schedule(self.train_cfg['schedule'])[0][1]
        self.tx = make_optimizer(first_lr,
                                 self.train_cfg.get('clip_grad_norm', 1.0))
        self._step_fns: Dict[Any, Any] = {}

    def train(self, model, state: Optional[TrainState] = None,
              variables: Optional[Dict[str, Any]] = None,
              seed: int = 0) -> TrainState:
        schedule = parse_schedule(self.train_cfg['schedule'])
        if state is None:
            state = create_train_state(variables, self.tx, step=0)
        for i, (r, lr, max_step, bs) in enumerate(schedule, 1):
            if int(state.step) >= max_step:
                continue
            train_set, val_set = get_taco_dataloaders(
                paths=self.paths, batch_size=bs, r=r,
                bucket_multiple=self.train_cfg.get('bucket_multiple', 1) * r,
                process_index=jax.process_index(),
                process_count=jax.process_count(),
                **self.train_cfg['filter'])
            session = TTSSession(index=i, r=r, lr=lr, max_step=max_step,
                                 bs=bs, train_set=train_set, val_set=val_set)
            state = self.train_session(model, state, session, seed)
        return state

    def train_session(self, model, state: TrainState, session: TTSSession,
                      seed: int = 0) -> TrainState:
        current_step = int(state.step)
        training_steps = session.max_step - current_step
        total_iters = len(session.train_set)
        epochs = training_steps // max(total_iters, 1) + 1
        simple_table([('Steps', f'{training_steps // 1000}k Steps'),
                      ('Batch Size', session.bs),
                      ('Learning Rate', session.lr),
                      ('Outputs/Step (r)', session.r)])
        state = set_learning_rate(state, session.lr)

        train_step = self._get_train_step(model, session.r)
        rng = jax.random.PRNGKey(seed + current_step)
        loss_avg, timer = Averager(), StepTimer()

        # one-step-lag metric/attention processing (see ForwardTrainer): the
        # host consumes step N-1's outputs while step N runs on device
        step = current_step
        pending = None

        def flush(p):
            p_step, p_metrics, p_attn, p_mel_len, p_e, p_i = p
            loss_avg.add(float(p_metrics['loss']))
            loc_score, sharp_score = attention_score(
                np.asarray(p_attn), np.asarray(p_mel_len), r=session.r)
            self.writer.add_scalar('Attention_Score/loc', loc_score.mean(), p_step)
            self.writer.add_scalar('Attention_Score/sharpness', sharp_score.mean(), p_step)
            self.writer.add_scalar('Loss/train', float(p_metrics['loss']), p_step)
            self.writer.add_scalar('Params/batch_size', session.bs, p_step)
            self.writer.add_scalar('Params/reduction_factor', session.r, p_step)
            self.writer.add_scalar('Params/learning_rate', session.lr, p_step)
            stream(f'| Epoch: {p_e}/{epochs} ({p_i}/{total_iters}) '
                   f'| Loss: {loss_avg.get():#.4} '
                   f'| {timer.steps_per_second():#.2} steps/s '
                   f'| Step: {p_step // 1000}k | ')

        for e in range(1, epochs + 1):
            for i, batch in enumerate(session.train_set, 1):
                batch = pad_batch_to_devices(dict(batch), self.mesh)
                device_batch = shard_batch(
                    {k: batch[k] for k in BATCH_KEYS if k in batch},
                    self.mesh)
                rng, step_rng = jax.random.split(rng)
                state, metrics, attn = train_step(state, device_batch,
                                                  step_rng)
                step += 1
                if pending is not None:
                    flush(pending)
                pending = (step, metrics, attn, batch['mel_len'], e, i)
                timer.tick()

                if step % self.train_cfg.get('plot_every', 1000) == 0:
                    self.generate_plots(model, state, session)
                if step % self.train_cfg['checkpoint_every'] == 0:
                    self._save(state, f'taco_step{step // 1000}k.ckpt')
                if step >= session.max_step:
                    break

            if pending is not None:
                flush(pending)
                pending = None
            val_loss = self.evaluate(model, state, session.val_set, session.r)
            self.writer.add_scalar('Loss/val', val_loss, int(state.step))
            self._save(state, 'latest_model.ckpt')
            loss_avg.reset()
            timer.reset()
            print(' ')
            if int(state.step) >= session.max_step:
                break
        return state

    def _get_train_step(self, model, r: int):
        key = (id(model), r)
        if key not in self._step_fns:
            self._step_fns[key] = self._build_train_step(model, r)
        return self._step_fns[key]

    def _build_train_step(self, model, r: int):
        tx = self.tx
        # bf16 mixed precision (see ForwardTrainer._build_train_step)
        mp = self.train_cfg.get('precision', 'float32') == 'bfloat16'

        def loss_fn(params, batch_stats, batch, rng):
            variables = {'params': cast_floats(params, jnp.bfloat16)
                         if mp else params}
            if batch_stats is not None:
                variables['batch_stats'] = batch_stats
            apply_batch = cast_floats(batch, jnp.bfloat16) if mp else batch
            (mel_out, linear, attn), mutated = model.apply(
                variables, apply_batch, r=r, train=True,
                rngs={'dropout': rng}, mutable=['batch_stats'])
            if mp:
                mel_out, linear, attn = (a.astype(jnp.float32)
                                         for a in (mel_out, linear, attn))
            target = batch['mel']
            m1 = jnp.mean(jnp.abs(mel_out - target))
            m2 = jnp.mean(jnp.abs(linear - target))
            loss = m1 + m2
            return loss, (mutated.get('batch_stats'),
                          {'loss': loss, 'm1': m1, 'm2': m2}, attn)

        @partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, batch, rng):
            grads, (new_stats, metrics, attn) = jax.grad(
                loss_fn, has_aux=True)(state.params, state.batch_stats,
                                       batch, rng)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = jax.tree.map(lambda p, u: p + u, state.params, updates)
            return (state.replace(params=params, batch_stats=new_stats,
                                  opt_state=opt_state, step=state.step + 1),
                    metrics, attn)

        return train_step

    def _get_eval_step(self, model, r: int):
        key = ('eval', id(model), r)
        if key not in self._step_fns:
            @jax.jit
            def eval_step(variables, batch):
                mel_out, linear, _ = model.apply(variables, batch,
                                                 r=r, train=False)
                return (jnp.mean(jnp.abs(mel_out - batch['mel']))
                        + jnp.mean(jnp.abs(linear - batch['mel'])))
            self._step_fns[key] = eval_step
        return self._step_fns[key]

    def evaluate(self, model, state: TrainState, val_set, r: int) -> float:
        eval_step = self._get_eval_step(model, r)
        total, n = 0.0, 0
        for batch in val_set:
            batch = pad_batch_to_devices(dict(batch), self.mesh)
            device_batch = shard_batch(
                {k: batch[k] for k in BATCH_KEYS if k in batch}, self.mesh)
            if device_batch['mel'].shape[1] % r != 0:
                continue
            total += float(eval_step(state.variables(), device_batch))
            n += 1
        return total / max(n, 1)

    @ignore_exception
    def generate_plots(self, model, state: TrainState,
                       session: TTSSession) -> None:
        step = int(state.step)
        sample = {k: np.asarray(v[:1]) if isinstance(v, np.ndarray) else v
                  for k, v in session.val_sample.items()}
        batch = {k: jnp.asarray(sample[k]) for k in BATCH_KEYS
                 if k in sample}
        mel_out, linear, attn = model.apply(state.variables(), batch,
                                            r=session.r, train=False)
        mel_len = int(sample['mel_len'][0])
        self.writer.add_figure('Attention/teacher_forced',
                               plot_attention(np.asarray(attn)[0, :mel_len // session.r]),
                               step)
        self.writer.add_figure('Mel/teacher_forced',
                               plot_mel(np.asarray(mel_out)[0, :mel_len].T), step)
        self.writer.add_figure('Mel/target',
                               plot_mel(np.asarray(sample['mel'])[0, :mel_len].T), step)
        try:
            import torch
            wav = self.dsp.griffinlim(np.asarray(linear)[0, :mel_len].T)
            self.writer.add_audio('Generated/teacher_forced_audio',
                                  torch.tensor(wav)[None, :], step,
                                  sample_rate=self.dsp.sample_rate)
        except Exception:
            pass

    def _save(self, state: TrainState, name: str) -> None:
        if jax.process_index() != 0:
            return
        save_checkpoint(self.paths.taco_checkpoints / name,
                        variables=jax.device_get(state.variables()),
                        config=self.config,
                        opt_state=jax.device_get(state.opt_state),
                        step=int(state.step))
