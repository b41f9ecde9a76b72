"""Multispeaker training smoke: MultiForwardTacotron through the
MultiForwardTrainer (CE pitch-cond loss, speaker-embedding meta) on the
8-device CPU mesh with a tiny synthetic multispeaker dataset."""

import pickle

import numpy as np
import pytest

from forwardtacotron_tpu.data.dataset import get_forward_dataloaders
from forwardtacotron_tpu.dsp.dsp import DSP
from forwardtacotron_tpu.models.registry import init_tts_model
from forwardtacotron_tpu.text.symbols import phonemes
from forwardtacotron_tpu.train.forward_trainer import MultiForwardTrainer
from forwardtacotron_tpu.utils.checkpoints import restore_checkpoint
from forwardtacotron_tpu.utils.files import read_config
from forwardtacotron_tpu.utils.paths import Paths

TINY_MULTI_MODEL = dict(
    speaker_emb_dims=8, embed_dims=16, series_embed_dims=8,
    durpred_conv_dims=8, durpred_rnn_dims=4, durpred_dropout=0.5,
    pitch_conv_dims=8, pitch_rnn_dims=4, pitch_dropout=0.5, pitch_strength=1.0,
    energy_conv_dims=8, energy_rnn_dims=4, energy_dropout=0.5,
    energy_strength=1.0,
    pitch_cond_conv_dims=8, pitch_cond_rnn_dims=4, pitch_cond_dropout=0.5,
    pitch_cond_emb_dims=4, pitch_cond_categorical_dims=3,
    prenet_dims=8, prenet_k=4, prenet_dropout=0.5, prenet_num_highways=2,
    rnn_dims=16, postnet_dims=8, postnet_k=4, postnet_num_highways=2,
    postnet_dropout=0.0)


@pytest.fixture
def multi_setup(tmp_path):
    config = read_config('tests/resources/test_config.yaml')
    config['tts_model'] = 'multi_forward_tacotron'
    config['data_path'] = str(tmp_path / 'data')
    config['checkpoint_path'] = str(tmp_path / 'ckpt')
    config['multi_forward_tacotron'] = {
        'model': TINY_MULTI_MODEL,
        'training': dict(config['forward_tacotron']['training'],
                         pitch_cond_loss_factor=0.1),
    }
    paths = Paths.from_config(config)
    n_mels = config['dsp']['num_mels']

    rs = np.random.RandomState(0)
    text_dict, speaker_dict, dataset = {}, {}, []
    for i in range(8):
        item_id = f'item{i}'
        speaker = f'spk{i % 2}'
        n_tok = 4 + i % 3
        dur = rs.randint(1, 4, n_tok).astype(np.float32)
        mel_len = int(dur.sum())
        np.save(paths.mel / f'{item_id}.npy',
                rs.randn(n_mels, mel_len).astype(np.float32))
        np.save(paths.speaker_emb / f'{item_id}.npy',
                rs.randn(8).astype(np.float32))
        np.save(paths.alg / f'{item_id}.npy', dur)
        pitch = rs.randn(n_tok).astype(np.float32)
        pitch[0] = 0.0  # an unvoiced phoneme -> pitch_cond class 1
        np.save(paths.phon_pitch / f'{item_id}.npy', pitch)
        np.save(paths.phon_energy / f'{item_id}.npy',
                rs.rand(n_tok).astype(np.float32))
        text_dict[item_id] = ''.join(phonemes[20 + j] for j in range(n_tok))
        speaker_dict[item_id] = speaker
        dataset.append((item_id, mel_len))
    for speaker in ('spk0', 'spk1'):
        np.save(paths.mean_speaker_emb / f'{speaker}.npy',
                rs.randn(8).astype(np.float32))
    for path, obj in ((paths.text_dict, text_dict),
                      (paths.speaker_dict, speaker_dict),
                      (paths.train_dataset, dataset[:6]),
                      (paths.val_dataset, dataset[6:])):
        with open(path, 'wb') as f:
            pickle.dump(obj, f)
    return config, paths


@pytest.mark.slow  # compile-dominated (~95s) full multispeaker session
def test_multi_training_runs(multi_setup):
    import jax
    config, paths = multi_setup
    model = init_tts_model(config)
    trainer = MultiForwardTrainer(paths, DSP.from_config(config), config)
    assert 'speaker_embeddings' in trainer.checkpoint_meta
    assert set(trainer.checkpoint_meta['speaker_embeddings']) == {'spk0', 'spk1'}

    loader, _ = get_forward_dataloaders(
        paths=paths, batch_size=2,
        **config['multi_forward_tacotron']['training']['filter'])
    batch = next(iter(loader))
    jb = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           jb, train=False)
    state = trainer.train(model, variables=variables)
    assert int(state.step) >= 6

    ckpt = restore_checkpoint(paths.forward_checkpoints)
    assert ckpt is not None
    assert 'speaker_embeddings' in ckpt.get('meta', {})
    # generate from the trained state with a speaker embedding
    from forwardtacotron_tpu.models.synthesis import TTSInference
    inference = TTSInference(model, ckpt['variables'], multispeaker=True)
    out = inference.generate_cropped(
        np.arange(20, 26), speaker_emb=np.zeros(8, np.float32))
    assert out['mel_post'].shape[0] == config['dsp']['num_mels']
