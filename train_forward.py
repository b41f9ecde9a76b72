"""CLI: train a forward acoustic model (mirrors reference train_forward.py:54-92).

Dispatches on the config's ``tts_model`` key to the single- or multispeaker
trainer; --force_gta exports mel_post features for vocoder training.
"""

import argparse
import subprocess

import jax
import numpy as np


def main():
    parser = argparse.ArgumentParser(description='Train forward TTS model')
    parser.add_argument('--config', default='configs/singlespeaker.yaml')
    parser.add_argument('--force_gta', action='store_true')
    args = parser.parse_args()

    from forwardtacotron_tpu.dsp.dsp import DSP
    from forwardtacotron_tpu.models.registry import (init_tts_model,
                                                     is_multispeaker)
    from forwardtacotron_tpu.parallel.mesh import initialize_distributed
    from forwardtacotron_tpu.train.forward_trainer import (ForwardTrainer,
                                                           MultiForwardTrainer)
    from forwardtacotron_tpu.train.state import create_train_state
    from forwardtacotron_tpu.utils.checkpoints import (restore_checkpoint,
                                                       restore_opt_state)
    from forwardtacotron_tpu.utils.files import read_config
    from forwardtacotron_tpu.utils.paths import Paths

    initialize_distributed()
    config = read_config(args.config)
    try:  # record provenance like the reference (train_forward.py:25-30)
        config['git_hash'] = subprocess.check_output(
            ['git', 'describe', '--always']).decode().strip()
    except Exception:
        pass

    paths = Paths.from_config(config)
    dsp = DSP.from_config(config)

    alg_files = list(paths.alg.glob('*.npy'))
    assert len(alg_files) > 0, \
        f'No alignment files found in {paths.alg}. Run train_tacotron.py first!'

    model = init_tts_model(config)
    trainer_cls = MultiForwardTrainer if is_multispeaker(config) \
        else ForwardTrainer
    trainer = trainer_cls(paths, dsp, config)

    ckpt = restore_checkpoint(paths.forward_checkpoints)
    if ckpt is not None:
        print(f'Restored checkpoint at step {ckpt["step"]}')
        state = create_train_state(ckpt['variables'], trainer.tx,
                                   step=ckpt['step'])
        state = state.replace(
            opt_state=restore_opt_state(ckpt, state.opt_state))
    else:
        state = _init_state(model, trainer, config)

    if args.force_gta:
        _export_gta(model, state, paths, config, trainer)
        return
    trainer.train(model, state=state)


def _init_state(model, trainer, config):
    from forwardtacotron_tpu.train.state import create_train_state
    n_mels = config['dsp']['num_mels']
    n = 8
    batch = {'x': np.ones((1, n), np.int64),
             'dur': np.ones((1, n), np.float32),
             'mel_len': np.array([n]), 'x_len': np.array([n]),
             'pitch': np.zeros((1, n), np.float32),
             'energy': np.zeros((1, n), np.float32),
             'pitch_cond': np.ones((1, n), np.int64),
             'speaker_emb': np.zeros((1, 256), np.float32),
             'mel': np.zeros((1, n, n_mels), np.float32)}
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           batch, train=False)
    return create_train_state(variables, trainer.tx)


def _export_gta(model, state, paths, config, trainer):
    """GTA mel export for vocoder training (reference train_forward.py:33-51)."""
    from forwardtacotron_tpu.data.dataset import get_forward_dataloaders
    model_type = config.get('tts_model', 'forward_tacotron')
    filter_params = config[model_type]['training']['filter']
    train_set, val_set = get_forward_dataloaders(paths=paths, batch_size=8,
                                                 **filter_params)
    print('Exporting GTA features...')
    for loader in (train_set, val_set):
        for batch in loader:
            device_batch = {k: v for k, v in batch.items()
                            if isinstance(v, np.ndarray)}
            out = model.apply(state.variables(), device_batch, train=False)
            mel_post = np.asarray(out['mel_post'])
            for j, item_id in enumerate(batch['item_id']):
                mel_len = int(batch['mel_len'][j])
                np.save(str(paths.gta / f'{item_id}.npy'),
                        mel_post[j, :mel_len].T, allow_pickle=False)


if __name__ == '__main__':
    main()
