"""Forward-model trainer: schedule sessions, pjit'd train step, eval, plots.

Parity with reference trainer/forward_trainer.py:35-231 and
trainer/multi_forward_trainer.py:42-243 (which this class also covers —
multispeaker models add the pitch_cond cross-entropy and accuracy, and
speaker embeddings travel in checkpoint meta).

TPU design: one jitted train step with the state donated and the batch
sharded over the mesh's data axis; gradients come out replicated because XLA
inserts the all-reduce. Collators bucket padded shapes so the step compiles
a bounded set of shapes per session.
"""

import time
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from forwardtacotron_tpu.data.dataset import get_forward_dataloaders
from forwardtacotron_tpu.dsp.dsp import DSP
from forwardtacotron_tpu.models.registry import is_multispeaker
from forwardtacotron_tpu.models.synthesis import TTSInference
from forwardtacotron_tpu.parallel.mesh import (make_mesh,
                                               pad_batch_to_devices,
                                               shard_batch)
from forwardtacotron_tpu.train.common import (Averager, StepTimer, TTSSession,
                                              cast_floats,
                                              classification_accuracy,
                                              masked_cross_entropy, masked_l1)
from forwardtacotron_tpu.train.state import (TrainState, create_train_state,
                                             make_optimizer,
                                             set_learning_rate)
from forwardtacotron_tpu.utils.checkpoints import save_checkpoint
from forwardtacotron_tpu.utils.display import (ignore_exception, plot_mel,
                                               plot_pitch, simple_table,
                                               stream)
from forwardtacotron_tpu.utils.files import parse_schedule
from forwardtacotron_tpu.utils.paths import Paths

BATCH_KEYS = ('x', 'mel', 'dur', 'mel_len', 'x_len', 'pitch', 'energy',
              'pitch_target', 'energy_target', 'pitch_cond', 'speaker_emb')


def make_writer(log_dir):
    """TensorBoard writer if available (torch's SummaryWriter), else a
    CSV-file fallback so metrics are never lost."""
    try:
        from torch.utils.tensorboard import SummaryWriter
        return SummaryWriter(log_dir=str(log_dir))
    except Exception:
        class CsvWriter:
            def __init__(self, path):
                self._f = open(path / 'metrics.csv', 'a')

            def add_scalar(self, tag, value, step):
                self._f.write(f'{step},{tag},{float(value)}\n')
                self._f.flush()

            def add_figure(self, *a, **k):
                pass

            def add_audio(self, *a, **k):
                pass
        return CsvWriter(log_dir)


class ForwardTrainer:

    def __init__(self, paths: Paths, dsp: DSP, config: Dict[str, Any],
                 mesh=None) -> None:
        self.paths = paths
        self.dsp = dsp
        self.config = config
        model_type = config.get('tts_model', 'forward_tacotron')
        self.model_type = model_type
        self.train_cfg = config[model_type]['training']
        self.multispeaker = is_multispeaker(config)
        self.mesh = mesh if mesh is not None else make_mesh()
        self.writer = make_writer(paths.forward_log)
        self.checkpoint_meta: Dict[str, Any] = {}
        self._step_fns: Dict[Any, Any] = {}
        first_lr = parse_schedule(self.train_cfg['schedule'])[0][0]
        self.tx = make_optimizer(first_lr,
                                 self.train_cfg.get('clip_grad_norm', 1.0))

    # --------------------------------------------------------------- training

    def train(self, model, state: Optional[TrainState] = None,
              variables: Optional[Dict[str, Any]] = None,
              seed: int = 0) -> TrainState:
        schedule = parse_schedule(self.train_cfg['schedule'])
        if state is None:
            state = create_train_state(variables, self.tx, step=0)

        for i, (lr, max_step, bs) in enumerate(schedule, 1):
            if int(state.step) >= max_step:
                continue
            filter_params = dict(self.train_cfg['filter'])
            train_set, val_set = get_forward_dataloaders(
                paths=self.paths, batch_size=bs,
                bucket_multiple=self.train_cfg.get('bucket_multiple', 32),
                process_index=jax.process_index(),
                process_count=jax.process_count(),
                **filter_params)
            session = TTSSession(index=i, r=1, lr=lr, max_step=max_step,
                                 bs=bs, train_set=train_set, val_set=val_set)
            state = self.train_session(model, state, session, seed)
        return state

    def train_session(self, model, state: TrainState,
                      session: TTSSession, seed: int = 0) -> TrainState:
        current_step = int(state.step)
        training_steps = session.max_step - current_step
        total_iters = len(session.train_set)
        epochs = training_steps // max(total_iters, 1) + 1
        simple_table([('Steps', f'{training_steps // 1000}k Steps'),
                      ('Batch Size', session.bs),
                      ('Learning Rate', session.lr),
                      ('Devices', self.mesh.devices.size)])
        state = set_learning_rate(state, session.lr)

        train_step = self._get_train_step(model)
        rng = jax.random.PRNGKey(seed + current_step)
        m_loss_avg, dur_loss_avg, pitch_loss_avg = Averager(), Averager(), Averager()
        timer = StepTimer()

        rs = np.random.RandomState(seed)
        pitch_zoneout = self.train_cfg.get('pitch_zoneout', 0.0)
        energy_zoneout = self.train_cfg.get('energy_zoneout', 0.0)

        # metrics are consumed with a one-step lag: fetching step N's scalars
        # blocks the host until the step finishes, so processing N-1's while
        # N runs keeps the device queue full (the step counter is tracked
        # host-side for the same reason — int(state.step) is a device sync)
        step = current_step
        pending = None

        def flush(p):
            p_step, p_metrics, p_e, p_i = p
            m_loss_avg.add(float(p_metrics['m1_loss'])
                           + float(p_metrics['m2_loss']))
            dur_loss_avg.add(float(p_metrics['dur_loss']))
            pitch_loss_avg.add(float(p_metrics['pitch_loss']))
            msg = (f'| Epoch: {p_e}/{epochs} ({p_i}/{total_iters}) '
                   f'| Mel Loss: {m_loss_avg.get():#.4} '
                   f'| Dur Loss: {dur_loss_avg.get():#.4} '
                   f'| Pitch Loss: {pitch_loss_avg.get():#.4} '
                   f'| {timer.steps_per_second():#.2} steps/s '
                   f'| Step: {p_step // 1000}k | ')
            for tag, val in (('Mel_Loss/train', m_loss_avg.get()),
                             ('Pitch_Loss/train', float(p_metrics['pitch_loss'])),
                             ('Energy_Loss/train', float(p_metrics['energy_loss'])),
                             ('Duration_Loss/train', float(p_metrics['dur_loss'])),
                             ('Params/batch_size', session.bs),
                             ('Params/learning_rate', session.lr)):
                self.writer.add_scalar(tag, val, p_step)
            if 'pitch_cond_loss' in p_metrics:
                self.writer.add_scalar('Pitch_Cond_Loss/train',
                                       float(p_metrics['pitch_cond_loss']),
                                       p_step)
            stream(msg)

        for e in range(1, epochs + 1):
            for i, batch in enumerate(session.train_set, 1):
                batch = dict(batch)
                # zoneout: mask conditioning inputs, keep clean loss targets
                # (reference trainer/forward_trainer.py:73-79)
                batch['pitch_target'] = batch['pitch'].copy()
                batch['energy_target'] = batch['energy'].copy()
                if pitch_zoneout > 0:
                    mask = rs.rand(*batch['pitch'].shape) > pitch_zoneout
                    batch['pitch'] = batch['pitch'] * mask
                if energy_zoneout > 0:
                    mask = rs.rand(*batch['energy'].shape) > energy_zoneout
                    batch['energy'] = batch['energy'] * mask

                batch = pad_batch_to_devices(batch, self.mesh)
                device_batch = shard_batch(
                    {k: batch[k] for k in BATCH_KEYS if k in batch}, self.mesh)

                rng, step_rng = jax.random.split(rng)
                state, metrics = train_step(state, device_batch, step_rng)
                step += 1
                if pending is not None:
                    flush(pending)
                pending = (step, metrics, e, i)
                timer.tick()

                if step % self.train_cfg['checkpoint_every'] == 0:
                    self._save(state, f'forward_step{step // 1000}k.ckpt')
                if step % self.train_cfg['plot_every'] == 0:
                    self.generate_plots(model, state, session)
                if step >= session.max_step:
                    break

            if pending is not None:
                flush(pending)
                pending = None
            val_out = self.evaluate(model, state, session.val_set)
            for tag, val in val_out.items():
                self.writer.add_scalar(f'{tag}/val', val, int(state.step))
            self._save(state, 'latest_model.ckpt')
            m_loss_avg.reset()
            pitch_loss_avg.reset()
            timer.reset()
            print(' ')
            if int(state.step) >= session.max_step:
                break
        return state

    # ------------------------------------------------------------------ steps

    def _get_train_step(self, model):
        key = id(model)
        if key not in self._step_fns:
            self._step_fns[key] = self._build_train_step(model)
        return self._step_fns[key]

    def _build_train_step(self, model):
        dur_w = self.train_cfg['dur_loss_factor']
        pitch_w = self.train_cfg['pitch_loss_factor']
        energy_w = self.train_cfg['energy_loss_factor']
        cond_w = self.train_cfg.get('pitch_cond_loss_factor', 0.1)
        multispeaker = self.multispeaker
        tx = self.tx

        # bf16 mixed precision: compute (matmuls/convs/scans) in bfloat16
        # with f32 master params, f32 Adam moments, f32 BatchNorm running
        # stats, and all losses reduced in f32. Gradients arrive f32 through
        # the cast. ~2x MXU rate + half the HBM traffic on TPU.
        mp = self.train_cfg.get('precision', 'float32') == 'bfloat16'
        # fused Pallas RNN kernels with custom VJP (ops/pallas/rnn_train.py)
        # replace the lax.scan recurrences inside jax.grad; on a >1-device
        # mesh the cores shard_map themselves over the 'data' axis (batch
        # split per device, weights replicated, weight-grad psum from the
        # shard_map transpose)
        use_pallas_train = mp and self.train_cfg.get('pallas_rnn', True)

        def loss_fn(params, batch_stats, batch, rng):
            from forwardtacotron_tpu.ops.pallas.rnn import pallas_rnns
            variables = {'params': cast_floats(params, jnp.bfloat16)
                         if mp else params}
            if batch_stats is not None:
                variables['batch_stats'] = batch_stats
            apply_batch = cast_floats(batch, jnp.bfloat16) if mp else batch
            with pallas_rnns('train' if use_pallas_train else 'off',
                             mesh=self.mesh):
                out, mutated = model.apply(
                    variables, apply_batch, train=True,
                    rngs={'dropout': rng}, mutable=['batch_stats'])
            if mp:  # losses and their targets reduce in f32
                out = cast_floats(out, jnp.float32)

            m1 = masked_l1(out['mel'], batch['mel'], batch['mel_len'])
            m2 = masked_l1(out['mel_post'], batch['mel'], batch['mel_len'])
            dur_loss = masked_l1(out['dur'], batch['dur'], batch['x_len'])
            pitch_loss = masked_l1(out['pitch'], batch['pitch_target'],
                                   batch['x_len'])
            energy_loss = masked_l1(out['energy'], batch['energy_target'],
                                    batch['x_len'])
            loss = (m1 + m2 + dur_w * dur_loss + pitch_w * pitch_loss
                    + energy_w * energy_loss)
            metrics = {'m1_loss': m1, 'm2_loss': m2, 'dur_loss': dur_loss,
                       'pitch_loss': pitch_loss, 'energy_loss': energy_loss}
            if multispeaker:
                ce = masked_cross_entropy(out['pitch_cond'],
                                          batch['pitch_cond'])
                loss = loss + cond_w * ce
                metrics['pitch_cond_loss'] = ce
                metrics['pitch_cond_acc'] = classification_accuracy(
                    out['pitch_cond'], batch['pitch_cond'])
            metrics['loss'] = loss
            return loss, (mutated.get('batch_stats'), metrics)

        @partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, batch, rng):
            grads, (new_stats, metrics) = jax.grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats, batch, rng)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = jax.tree.map(lambda p, u: p + u, state.params, updates)
            return state.replace(params=params, batch_stats=new_stats,
                                 opt_state=opt_state,
                                 step=state.step + 1), metrics

        return train_step

    def _get_eval_step(self, model):
        key = ('eval', id(model))
        if key not in self._step_fns:
            @jax.jit
            def eval_step(variables, batch):
                out = model.apply(variables, batch, train=False)
                return {
                    'Mel_Loss':
                        masked_l1(out['mel'], batch['mel'], batch['mel_len'])
                        + masked_l1(out['mel_post'], batch['mel'],
                                    batch['mel_len']),
                    'Duration_Loss': masked_l1(out['dur'], batch['dur'],
                                               batch['x_len']),
                    'Pitch_Loss': masked_l1(out['pitch'], batch['pitch'],
                                            batch['x_len']),
                    'Energy_Loss': masked_l1(out['energy'], batch['energy'],
                                             batch['x_len']),
                }
            self._step_fns[key] = eval_step
        return self._step_fns[key]

    def evaluate(self, model, state: TrainState, val_set) -> Dict[str, float]:
        eval_step = self._get_eval_step(model)
        sums: Dict[str, float] = {}
        n = 0
        for batch in val_set:
            batch = dict(batch)
            batch['pitch_target'] = batch['pitch']
            batch['energy_target'] = batch['energy']
            batch = pad_batch_to_devices(batch, self.mesh)
            device_batch = shard_batch(
                {k: batch[k] for k in BATCH_KEYS if k in batch}, self.mesh)
            metrics = eval_step(state.variables(), device_batch)
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            n += 1
        return {k: v / max(n, 1) for k, v in sums.items()}

    # ------------------------------------------------------------- artifacts

    @ignore_exception
    def generate_plots(self, model, state: TrainState,
                       session: TTSSession) -> None:
        step = int(state.step)
        sample = {k: np.asarray(v[:1]) if isinstance(v, np.ndarray) else v
                  for k, v in session.val_sample.items()}
        sample['pitch_target'] = sample['pitch']
        sample['energy_target'] = sample['energy']
        device_batch = {k: jnp.asarray(sample[k])
                        for k in BATCH_KEYS if k in sample}

        # ground-truth-aligned (teacher-forced) prediction
        out = model.apply(state.variables(), device_batch, train=False)
        mel_len = int(sample['mel_len'][0])
        gta_mel = np.asarray(out['mel_post'])[0, :mel_len].T
        target_mel = np.asarray(sample['mel'])[0, :mel_len].T
        self.writer.add_figure('Ground_Truth_Aligned/generated',
                               plot_mel(gta_mel), step)
        self.writer.add_figure('Ground_Truth_Aligned/target',
                               plot_mel(target_mel), step)

        # free-running generation
        inference = TTSInference(model, state.variables(),
                                 multispeaker=self.multispeaker)
        kwargs = {}
        if self.multispeaker:
            kwargs['speaker_emb'] = sample['speaker_emb'][:1]
        gen = inference.generate_cropped(sample['x'][0], **kwargs)
        self.writer.add_figure('Generated/mel', plot_mel(gen['mel_post']), step)
        self.writer.add_figure('Generated/pitch', plot_pitch(gen['pitch']), step)

        try:
            import torch
            gta_wav = self.dsp.griffinlim(gta_mel)
            gen_wav = self.dsp.griffinlim(gen['mel_post'])
            self.writer.add_audio('Ground_Truth_Aligned/audio',
                                  torch.tensor(gta_wav)[None, :], step,
                                  sample_rate=self.dsp.sample_rate)
            self.writer.add_audio('Generated/audio',
                                  torch.tensor(gen_wav)[None, :], step,
                                  sample_rate=self.dsp.sample_rate)
        except Exception:
            pass

    def _save(self, state: TrainState, name: str) -> None:
        if jax.process_index() != 0:
            return
        save_checkpoint(self.paths.forward_checkpoints / name,
                        variables=jax.device_get(state.variables()),
                        config=self.config,
                        opt_state=jax.device_get(state.opt_state),
                        step=int(state.step),
                        meta=self.checkpoint_meta or None)


class MultiForwardTrainer(ForwardTrainer):
    """Multispeaker trainer: loads the speaker table and embeds the mean
    per-speaker embeddings in checkpoint meta
    (reference trainer/multi_forward_trainer.py:35-40,116-119)."""

    def __init__(self, paths: Paths, dsp: DSP, config: Dict[str, Any],
                 mesh=None) -> None:
        super().__init__(paths, dsp, config, mesh)
        from forwardtacotron_tpu.utils.files import unpickle_binary
        try:
            speaker_dict = unpickle_binary(paths.speaker_dict)
            speakers = sorted(set(speaker_dict.values()))
            embeddings = {}
            for speaker in speakers:
                emb_path = paths.mean_speaker_emb / f'{speaker}.npy'
                if emb_path.is_file():
                    embeddings[speaker] = np.load(str(emb_path))
            self.checkpoint_meta = {'speaker_embeddings': embeddings}
        except FileNotFoundError:
            self.checkpoint_meta = {}

    @ignore_exception
    def generate_plots(self, model, state, session) -> None:
        """Adds per-speaker free-running generations on top of the base plots
        (reference trainer/multi_forward_trainer.py:217-243)."""
        super().generate_plots(model, state, session)
        embeddings = self.checkpoint_meta.get('speaker_embeddings', {})
        if not embeddings:
            return
        wanted = list(self.train_cfg.get('plot_speakers', []))
        n_extra = int(self.train_cfg.get('plot_n_speakers', 0))
        for speaker in embeddings:
            if len(wanted) >= len(set(wanted)) + n_extra:
                break
            if speaker not in wanted:
                wanted.append(speaker)

        step = int(state.step)
        sample = session.val_sample
        x = np.asarray(sample['x'][0])
        inference = TTSInference(model, state.variables(), multispeaker=True)
        for speaker in wanted:
            if speaker not in embeddings:
                continue
            gen = inference.generate_cropped(
                x, speaker_emb=np.asarray(embeddings[speaker]))
            self.writer.add_figure(f'Generated_Speakers/{speaker}',
                                   plot_mel(gen['mel_post']), step)
