"""Foundation tests: schedule parsing, config round-trip, paths layout."""

import tempfile
from pathlib import Path

from forwardtacotron_tpu.utils.files import (parse_schedule, pickle_binary,
                                             read_config, save_config,
                                             unpickle_binary)
from forwardtacotron_tpu.utils.paths import Paths


def test_parse_schedule_taco_rows():
    rows = ['5,  1e-3,  10_000,  32', '1,   1e-4,  40_000,  8']
    assert parse_schedule(rows) == [(5, 1e-3, 10000, 32), (1, 1e-4, 40000, 8)]


def test_parse_schedule_forward_rows():
    rows = ['5e-5,  150_000,  32', '1e-5,  300_000,  32']
    assert parse_schedule(rows) == [(5e-5, 150000, 32), (1e-5, 300000, 32)]


def test_config_round_trip():
    with tempfile.TemporaryDirectory() as tmp:
        cfg = {'dsp': {'sample_rate': 22050}, 'tts_model': 'forward_tacotron'}
        path = Path(tmp) / 'c.yaml'
        save_config(cfg, path)
        assert read_config(path) == cfg


def test_pickle_round_trip():
    with tempfile.TemporaryDirectory() as tmp:
        path = Path(tmp) / 'd.pkl'
        pickle_binary({'a': [1, 2]}, path)
        assert unpickle_binary(path) == {'a': [1, 2]}


def test_paths_created():
    with tempfile.TemporaryDirectory() as tmp:
        paths = Paths(data_path=Path(tmp) / 'data', tts_id='test_tts',
                      checkpoint_path=Path(tmp) / 'ckpt')
        for sub in Paths.DATA_SUBDIRS:
            assert getattr(paths, sub).is_dir()
        assert paths.taco_checkpoints.is_dir()
        assert paths.forward_checkpoints.is_dir()
        assert paths.taco_log.is_dir()
        assert paths.train_dataset.name == 'train_dataset.pkl'
