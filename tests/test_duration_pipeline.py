"""Duration extraction pipeline phase B with synthetic attention files
(the reference's fake-model pattern, tests/test_duration_extraction_pipe.py):
perfect diagonal attentions -> exact durations, stats, and files."""

import pickle

import numpy as np
import pytest

from forwardtacotron_tpu.duration.extractor import DurationExtractor
from forwardtacotron_tpu.duration.pipeline import (DurationExtractionPipeline,
                                                   max_consecutive_ones)
from forwardtacotron_tpu.duration.targets import (extract_pitch_energy,
                                                  normalize_values)
from forwardtacotron_tpu.text.symbols import phonemes
from forwardtacotron_tpu.utils.files import unpickle_binary
from forwardtacotron_tpu.utils.paths import Paths


def test_max_consecutive_ones():
    assert max_consecutive_ones(np.array([1, 1, 2, 1, 1, 1])) == 3
    assert max_consecutive_ones(np.array([2, 3, 4])) == 0
    assert max_consecutive_ones(np.array([1])) == 1


def test_normalize_values_preserves_zeros():
    a = np.array([0.0, 100.0, 200.0], np.float32)
    b = np.array([300.0, 0.0, 400.0], np.float32)
    mean, std = normalize_values([('a', a), ('b', b)])
    assert abs(mean - 250.0) < 1e-4
    assert a[0] == 0.0 and b[1] == 0.0
    assert abs(a[1:].mean() + b[[0, 2]].mean()) < 1.0  # roughly centered


@pytest.fixture
def attention_setup(tmp_path):
    paths = Paths(data_path=tmp_path / 'data', tts_id='t',
                  checkpoint_path=tmp_path / 'ckpt')
    rs = np.random.RandomState(0)
    text_dict, dataset = {}, {}
    items = []
    n_mels = 4
    for i in range(4):
        item_id = f'item{i}'
        n_tok = 3 + i
        fpt = 2  # frames per token
        mel_len = n_tok * fpt
        text = ''.join(phonemes[30 + j] for j in range(n_tok))
        att = np.full((mel_len, n_tok), 0.01, np.float32)
        for f in range(mel_len):
            att[f, f // fpt] = 0.97
        np.save(paths.att_pred / f'{item_id}.npy', att)
        np.save(paths.mel / f'{item_id}.npy',
                rs.randn(n_mels, mel_len).astype(np.float32))
        np.save(paths.raw_pitch / f'{item_id}.npy',
                np.full(mel_len, 120.0, np.float32))
        text_dict[item_id] = text
        items.append((item_id, mel_len))
    with open(paths.text_dict, 'wb') as f:
        pickle.dump(text_dict, f)
    with open(paths.train_dataset, 'wb') as f:
        pickle.dump(items[:3], f)
    with open(paths.val_dataset, 'wb') as f:
        pickle.dump(items[3:], f)
    with open(paths.speaker_dict, 'wb') as f:
        pickle.dump({i: 'spk' for i, _ in items}, f)
    return paths, items


def test_extract_durations_and_targets(attention_setup):
    paths, items = attention_setup
    pipe = DurationExtractionPipeline(
        paths, config={},
        duration_extractor=DurationExtractor(silence_threshold=-11,
                                             silence_prob_shift=0.25))
    stats = pipe.extract_durations(num_workers=0)
    assert set(stats) == {i for i, _ in items}
    for item_id, mel_len in items:
        dur = np.load(paths.alg / f'{item_id}.npy')
        assert dur.dtype == np.int64
        assert dur.sum() == mel_len
        np.testing.assert_array_equal(dur, 2)  # perfect diagonal, fpt=2
        s = stats[item_id]
        assert s.att_align_score > 0.9
        assert s.att_sharpness_score > 0.9
        assert s.max_duration == 2
        assert s.max_consecutive_ones == 0

    # phoneme pitch/energy targets from the extracted durations
    mean, std = extract_pitch_energy(paths, pitch_min_freq=30,
                                     pitch_max_freq=600)
    for item_id, mel_len in items:
        pitch = np.load(paths.phon_pitch / f'{item_id}.npy')
        energy = np.load(paths.phon_energy / f'{item_id}.npy')
        n_tok = mel_len // 2
        assert pitch.shape == energy.shape == (n_tok,)
        # constant 120 Hz everywhere -> normalized pitch is 0 with huge std
        assert np.all(energy > 0)
    assert abs(mean - 120.0) < 1e-3


def test_extract_durations_parallel(attention_setup):
    paths, items = attention_setup
    pipe = DurationExtractionPipeline(
        paths, config={},
        duration_extractor=DurationExtractor(silence_threshold=-11,
                                             silence_prob_shift=0.25))
    stats = pipe.extract_durations(num_workers=2)
    assert len(stats) == len(items)
