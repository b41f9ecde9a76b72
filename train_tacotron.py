"""CLI: train the Tacotron teacher and extract alignment features
(mirrors reference train_tacotron.py:146-196).

Modes: default = train then auto-extract durations + pitch/energy targets;
--force_align = skip training, redo extraction; --force_gta = export
ground-truth-aligned features; --extract_pitch = redo target extraction only.
"""

import argparse

import jax
import numpy as np


def main():
    parser = argparse.ArgumentParser(description='Train Tacotron teacher')
    parser.add_argument('--config', default='configs/singlespeaker.yaml')
    parser.add_argument('--force_align', action='store_true')
    parser.add_argument('--force_gta', action='store_true')
    parser.add_argument('--extract_pitch', action='store_true')
    args = parser.parse_args()

    from forwardtacotron_tpu.dsp.dsp import DSP
    from forwardtacotron_tpu.models.tacotron import Tacotron
    from forwardtacotron_tpu.parallel.mesh import initialize_distributed
    from forwardtacotron_tpu.train.state import create_train_state
    from forwardtacotron_tpu.train.taco_trainer import TacoTrainer
    from forwardtacotron_tpu.utils.checkpoints import (restore_checkpoint,
                                                       restore_opt_state)
    from forwardtacotron_tpu.utils.files import read_config
    from forwardtacotron_tpu.utils.paths import Paths

    initialize_distributed()
    config = read_config(args.config)
    paths = Paths.from_config(config)
    dsp = DSP.from_config(config)

    model = Tacotron.from_config(config)
    trainer = TacoTrainer(paths, dsp, config)

    ckpt = restore_checkpoint(paths.taco_checkpoints)
    if ckpt is not None:
        print(f'Restored checkpoint at step {ckpt["step"]}')
        state = create_train_state(ckpt['variables'], trainer.tx,
                                   step=ckpt['step'])
        state = state.replace(opt_state=restore_opt_state(ckpt, state.opt_state))
    else:
        state = _init_state(model, trainer, config)

    if args.extract_pitch:
        _extract_pitch(paths, config)
        return
    if args.force_gta:
        _export_gta(model, state, paths, config)
        return
    if not args.force_align:
        state = trainer.train(model, state=state)
    _create_align_features(model, state, paths, config)
    _extract_pitch(paths, config)


def _init_state(model, trainer, config):
    from forwardtacotron_tpu.train.state import create_train_state
    n_mels = config['dsp']['num_mels']
    batch = {'x': np.ones((1, 8), np.int64),
             'mel': np.zeros((1, 20, n_mels), np.float32),
             'speaker_emb': np.zeros((1, 256), np.float32)}
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           batch, r=2, train=False)
    return create_train_state(variables, trainer.tx)


def _create_align_features(model, state, paths, config):
    from forwardtacotron_tpu.duration.extractor import DurationExtractor
    from forwardtacotron_tpu.duration.pipeline import \
        DurationExtractionPipeline
    from forwardtacotron_tpu.utils.files import pickle_binary

    cfg = config['duration_extraction']
    extractor = DurationExtractor(
        silence_threshold=cfg['silence_threshold'],
        silence_prob_shift=cfg['silence_prob_shift'])
    pipe = DurationExtractionPipeline(paths, config, extractor)
    print('Extracting attention matrices from tacotron...')
    score = pipe.extract_attentions(model, state.variables(),
                                    max_batch_size=cfg['max_batch_size'])
    print(f'Avg attention sharpness: {score:.4f}')
    n_workers = cfg.get('num_workers', 0)
    print(f'Extracting durations (num workers={n_workers})...')
    stats = pipe.extract_durations(num_workers=n_workers)
    pickle_binary(stats, paths.duration_stats)


def _extract_pitch(paths, config):
    from forwardtacotron_tpu.duration.targets import extract_pitch_energy
    print('Extracting pitch/energy targets...')
    extract_pitch_energy(paths,
                         pitch_min_freq=config['preprocessing']['pitch_min_freq'],
                         pitch_max_freq=config['preprocessing']['pitch_max_freq'])


def _export_gta(model, state, paths, config):
    from forwardtacotron_tpu.data.dataset import get_taco_dataloaders
    train_set, val_set = get_taco_dataloaders(
        paths=paths, batch_size=8, r=1, **config['tacotron']['training']['filter'])
    print('Exporting ground-truth-aligned features...')
    for loader in (train_set, val_set):
        for batch in loader:
            _, linear, _ = model.apply(
                state.variables(),
                {'x': batch['x'], 'mel': batch['mel'],
                 'speaker_emb': batch['speaker_emb']},
                r=1, train=False)
            linear = np.asarray(linear)
            for j, item_id in enumerate(batch['item_id']):
                mel_len = int(batch['mel_len'][j])
                np.save(str(paths.gta / f'{item_id}.npy'),
                        linear[j, :mel_len].T, allow_pickle=False)


if __name__ == '__main__':
    main()
