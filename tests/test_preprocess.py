"""Preprocessing memory behavior + artifact contract (data/preprocess.py).

The embedding pass streams: with the mel-stats fallback encoder, workers
never return waveforms (peak memory O(pool chunk), not O(dataset) — the
reference holds every 16 kHz resemblyzer wav until the end,
/root/reference/preprocess.py:80,172-182); embeddings are written as pool
results arrive and the DataPoint's wav slot is released either way.
"""

from pathlib import Path

import numpy as np
import pytest
from scipy.io import wavfile

from forwardtacotron_tpu.data.preprocess import (Preprocessor,
                                                 run_preprocessing)
from forwardtacotron_tpu.utils.files import read_config, unpickle_binary
from forwardtacotron_tpu.utils.paths import Paths


@pytest.fixture
def dataset(tmp_path):
    config = read_config('tests/resources/test_config.yaml')
    config['data_path'] = str(tmp_path / 'data')
    config['checkpoint_path'] = str(tmp_path / 'ckpt')
    sr = config['dsp']['sample_rate']
    root = tmp_path / 'corpus'
    (root / 'wavs').mkdir(parents=True)
    lines = []
    for i in range(8):
        t = np.arange(int(sr * (0.3 + 0.05 * i))) / sr
        wav = (0.4 * np.sin(2 * np.pi * (140 + 20 * i) * t)).astype(np.float32)
        wavfile.write(str(root / 'wavs' / f'item{i}.wav'), sr,
                      (wav * 32767).astype(np.int16))
        lines.append(f'item{i}|synthetic utterance {i} aeiou')
    (root / 'metadata.csv').write_text('\n'.join(lines))
    return config, root


def test_worker_drops_wav_by_default(dataset):
    config, root = dataset
    paths = Paths.from_config(config)
    text_dict = {f'item{i}': 'aeiou' for i in range(8)}
    p = Preprocessor(paths, config, text_dict)(root / 'wavs' / 'item0.wav')
    assert p is not None and p.wav is None
    keeper = Preprocessor(paths, config, text_dict, keep_wav=True)
    p2 = keeper(root / 'wavs' / 'item1.wav')
    assert p2 is not None and p2.wav is not None and p2.wav.ndim == 1


def test_run_preprocessing_streams_and_writes_artifacts(dataset):
    config, root = dataset
    config['preprocessing']['n_val'] = 2
    paths = run_preprocessing(config, root, n_workers=1)

    train = unpickle_binary(paths.train_dataset)
    val = unpickle_binary(paths.val_dataset)
    assert len(train) + len(val) == 8 and len(val) == 2
    # val sorted longest-first (reference preprocess.py:211)
    assert val[0][1] >= val[1][1]
    for item_id, mel_len in train + val:
        mel = np.load(str(paths.mel / f'{item_id}.npy'))
        assert mel.shape == (config['dsp']['num_mels'], mel_len)
        pitch = np.load(str(paths.raw_pitch / f'{item_id}.npy'))
        # pitch frame-aligned with mel (same hop grid; trimming may shave
        # one frame of slack)
        assert abs(len(pitch) - mel_len) <= 1
        emb = np.load(str(paths.speaker_emb / f'{item_id}.npy'))
        assert emb.shape == (256,) and np.isfinite(emb).all()
    # single speaker -> one mean embedding, L2-normalized
    means = list(Path(paths.mean_speaker_emb).glob('*.npy'))
    assert len(means) == 1
    mean = np.load(str(means[0]))
    np.testing.assert_allclose(np.linalg.norm(mean), 1.0, rtol=1e-5)
