"""Training smoke tests: run real train steps on a tiny synthetic dataset on
an 8-device CPU mesh, check losses are finite, checkpoints save/resume."""

import pickle
from pathlib import Path

import numpy as np
import pytest

from forwardtacotron_tpu.data.dataset import get_forward_dataloaders
from forwardtacotron_tpu.dsp.dsp import DSP
from forwardtacotron_tpu.models.registry import init_tts_model
from forwardtacotron_tpu.text.symbols import phonemes
from forwardtacotron_tpu.train.common import TTSSession
from forwardtacotron_tpu.train.forward_trainer import ForwardTrainer
from forwardtacotron_tpu.train.state import create_train_state
from forwardtacotron_tpu.utils.checkpoints import (load_checkpoint,
                                                   restore_checkpoint)
from forwardtacotron_tpu.utils.files import read_config
from forwardtacotron_tpu.utils.paths import Paths

CONFIG_PATH = Path(__file__).parent / 'resources' / 'test_config.yaml'


@pytest.fixture
def training_setup(tmp_path):
    config = read_config(CONFIG_PATH)
    config['data_path'] = str(tmp_path / 'data')
    config['checkpoint_path'] = str(tmp_path / 'ckpt')
    paths = Paths.from_config(config)
    n_mels = config['dsp']['num_mels']

    rs = np.random.RandomState(0)
    text_dict, speaker_dict, dataset = {}, {}, []
    for i in range(8):
        item_id = f'item{i}'
        n_tok = 4 + i % 3
        text = ''.join(phonemes[20 + j] for j in range(n_tok))
        dur = rs.randint(1, 4, n_tok).astype(np.float32)
        mel_len = int(dur.sum())
        np.save(paths.mel / f'{item_id}.npy',
                rs.randn(n_mels, mel_len).astype(np.float32))
        np.save(paths.speaker_emb / f'{item_id}.npy', np.zeros(256, np.float32))
        np.save(paths.alg / f'{item_id}.npy', dur)
        np.save(paths.phon_pitch / f'{item_id}.npy',
                rs.randn(n_tok).astype(np.float32))
        np.save(paths.phon_energy / f'{item_id}.npy',
                rs.rand(n_tok).astype(np.float32))
        text_dict[item_id] = text
        speaker_dict[item_id] = 'spk'
        dataset.append((item_id, mel_len))
    for path, obj in ((paths.text_dict, text_dict),
                      (paths.speaker_dict, speaker_dict),
                      (paths.train_dataset, dataset[:6]),
                      (paths.val_dataset, dataset[6:])):
        with open(path, 'wb') as f:
            pickle.dump(obj, f)
    return config, paths


def test_forward_training_runs_and_resumes(training_setup):
    import jax
    config, paths = training_setup
    dsp = DSP.from_config(config)
    model = init_tts_model(config)
    trainer = ForwardTrainer(paths, dsp, config)

    # init variables with a dummy batch
    loader, _ = get_forward_dataloaders(paths=paths, batch_size=2,
                                        **config['forward_tacotron']['training']['filter'])
    batch = next(iter(loader))
    jb = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           jb, train=False)

    state = trainer.train(model, variables=variables)
    assert int(state.step) >= 6  # schedule max_step

    ckpt = restore_checkpoint(paths.forward_checkpoints)
    assert ckpt is not None
    assert ckpt['step'] == int(state.step)
    assert ckpt['config']['tts_model'] == 'forward_tacotron'

    # resume: training again is a no-op (schedule completed)
    state2 = create_train_state(ckpt['variables'], trainer.tx,
                                step=ckpt['step'])
    state3 = trainer.train(model, state=state2)
    assert int(state3.step) == int(state2.step)


@pytest.mark.slow  # compile-dominated (~95s); runs-and-resumes covers the
# trainer integration in the default suite
def test_train_step_loss_decreases(training_setup):
    import jax
    config, paths = training_setup
    dsp = DSP.from_config(config)
    model = init_tts_model(config)
    trainer = ForwardTrainer(paths, dsp, config)

    loader, _ = get_forward_dataloaders(paths=paths, batch_size=4,
                                        **config['forward_tacotron']['training']['filter'])
    batch = next(iter(loader))
    batch = dict(batch)
    batch['pitch_target'] = batch['pitch']
    batch['energy_target'] = batch['energy']
    jb = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           jb, train=False)
    state = create_train_state(variables, trainer.tx)
    step_fn = trainer._get_train_step(model)

    from forwardtacotron_tpu.parallel.mesh import (pad_batch_to_devices,
                                                   shard_batch)
    jb = pad_batch_to_devices(jb, trainer.mesh)
    device_batch = shard_batch(jb, trainer.mesh)
    losses = []
    rng = jax.random.PRNGKey(0)
    for i in range(8):
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, device_batch, sub)
        losses.append(float(metrics['loss']))
    assert all(np.isfinite(losses))
    # same batch repeatedly: loss should drop substantially
    assert losses[-1] < losses[0]


@pytest.mark.slow  # compile-dominated (~95s)
def test_train_step_bf16_mixed_precision(training_setup):
    """precision=bfloat16: finite decreasing loss, f32 master params, f32
    BatchNorm running stats, f32 Adam moments."""
    import jax
    import jax.numpy as jnp
    config, paths = training_setup
    config['forward_tacotron']['training']['precision'] = 'bfloat16'
    dsp = DSP.from_config(config)
    model = init_tts_model(config)
    trainer = ForwardTrainer(paths, dsp, config)

    loader, _ = get_forward_dataloaders(paths=paths, batch_size=4,
                                        **config['forward_tacotron']['training']['filter'])
    batch = dict(next(iter(loader)))
    batch['pitch_target'] = batch['pitch']
    batch['energy_target'] = batch['energy']
    jb = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           jb, train=False)
    state = create_train_state(variables, trainer.tx)
    step_fn = trainer._get_train_step(model)

    from forwardtacotron_tpu.parallel.mesh import (pad_batch_to_devices,
                                                   shard_batch)
    jb = pad_batch_to_devices(jb, trainer.mesh)
    device_batch = shard_batch(jb, trainer.mesh)
    losses = []
    rng = jax.random.PRNGKey(0)
    for _ in range(6):
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, device_batch, sub)
        losses.append(float(metrics['loss']))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]

    # master state must remain float32 throughout
    for leaf in jax.tree.leaves(state.params):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32
    for leaf in jax.tree.leaves(state.batch_stats):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree.leaves(state.opt_state):
        if hasattr(leaf, 'dtype') and jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32
