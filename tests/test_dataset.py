"""Data layer tests: collators (exact padding semantics), samplers, datasets,
binned loader invariants — mirroring the reference test strategy
(tests/test_collator.py, test_dataset_filter.py, test_taco_binned_dataloader.py)."""

import pickle
from pathlib import Path

import numpy as np
import pytest

from forwardtacotron_tpu.data.dataset import (PAD_VALUE, BinnedLengthSampler,
                                              BinnedTacoDataLoader,
                                              DataFilter, DataLoader,
                                              DurationStats, ForwardCollator,
                                              ForwardDataset, TacoCollator,
                                              TacoDataset, shard_for_host)
from forwardtacotron_tpu.text.symbols import phonemes
from forwardtacotron_tpu.text.tokenizer import Tokenizer
from forwardtacotron_tpu.utils.paths import Paths


def _make_item(x_len, mel_len, n_mels=4):
    return {'x': np.arange(1, x_len + 1, dtype=np.int64), 'x_len': x_len,
            'mel': np.full((n_mels, mel_len), 2.0, np.float32),
            'mel_len': mel_len, 'item_id': f'i{x_len}',
            'speaker_emb': np.zeros(8, np.float32), 'speaker_name': 's',
            'dur': np.ones(x_len, np.float32),
            'pitch': np.ones(x_len, np.float32),
            'energy': np.ones(x_len, np.float32),
            'pitch_cond': np.ones(x_len, np.float32)}


def test_taco_collator_padding():
    collator = TacoCollator(r=3)
    batch = collator([_make_item(3, 10), _make_item(5, 7)])
    assert batch['x'].shape == (2, 5)
    np.testing.assert_array_equal(batch['x'][0], [1, 2, 3, 0, 0])
    # mel padded to max+1=11 rounded up to multiple of r=3 -> 12
    assert batch['mel'].shape == (2, 12, 4)
    np.testing.assert_array_equal(batch['mel_len'], [10, 7])
    # padding value at padded frames
    np.testing.assert_allclose(batch['mel'][0, 10:], PAD_VALUE)
    np.testing.assert_allclose(batch['mel'][1, 7:], PAD_VALUE)
    np.testing.assert_allclose(batch['mel'][0, :10], 2.0)


def test_taco_collator_bucketing():
    collator = TacoCollator(r=1, bucket_multiple=32)
    batch = collator([_make_item(3, 10)])
    assert batch['x'].shape[1] == 32
    assert batch['mel'].shape[1] == 32


def test_forward_collator():
    collator = ForwardCollator(TacoCollator(r=1))
    batch = collator([_make_item(3, 10), _make_item(5, 7)])
    assert batch['dur'].shape == (2, 5)
    np.testing.assert_array_equal(batch['dur'][0], [1, 1, 1, 0, 0])
    assert batch['pitch_cond'].dtype == np.int64


def test_data_filter():
    stats = {'a': DurationStats(0.9, 0.99, 2, 10),
             'b': DurationStats(0.4, 0.99, 2, 10),
             'c': DurationStats(0.9, 0.80, 2, 10),
             'd': DurationStats(0.9, 0.99, 9, 10),
             'e': DurationStats(0.9, 0.99, 2, 99)}
    f = DataFilter(stats, min_attention_alignment=0.95,
                   min_attention_sharpness=0.5,
                   max_consecutive_duration_ones=6, max_duration=40)
    data = [(k, 100) for k in 'abcde']
    assert f(data) == [('a', 100)]


def test_binned_length_sampler_covers_all():
    lengths = np.arange(100)[::-1]
    sampler = BinnedLengthSampler(lengths, batch_size=4, bin_size=12, seed=0)
    order = list(iter(sampler))
    assert sorted(order) == list(range(100))


def test_shard_for_host():
    data = [(f'i{k}', k) for k in range(10)]
    shards = [shard_for_host(data, p, 4) for p in range(4)]
    assert sum(len(s) for s in shards) == 10
    merged = sorted(i for s in shards for i in s)
    assert merged == sorted(data)


@pytest.fixture
def tiny_dataset(tmp_path):
    paths = Paths(data_path=tmp_path / 'data', tts_id='t',
                  checkpoint_path=tmp_path / 'ckpt')
    tok = Tokenizer()
    text_dict, speaker_dict, dataset = {}, {}, []
    rs = np.random.RandomState(0)
    for i in range(6):
        item_id = f'item{i}'
        n_tok = 3 + i % 3
        text = ''.join(phonemes[20 + j] for j in range(n_tok))
        mel_len = 10 + 2 * i
        np.save(paths.mel / f'{item_id}.npy',
                rs.randn(4, mel_len).astype(np.float32))
        np.save(paths.speaker_emb / f'{item_id}.npy',
                np.zeros(8, np.float32))
        np.save(paths.alg / f'{item_id}.npy',
                np.full(n_tok, mel_len // n_tok, np.float32))
        np.save(paths.phon_pitch / f'{item_id}.npy',
                rs.randn(n_tok).astype(np.float32))
        np.save(paths.phon_energy / f'{item_id}.npy',
                rs.rand(n_tok).astype(np.float32))
        text_dict[item_id] = text
        speaker_dict[item_id] = 'spk'
        dataset.append((item_id, mel_len))
    with open(paths.text_dict, 'wb') as f:
        pickle.dump(text_dict, f)
    with open(paths.speaker_dict, 'wb') as f:
        pickle.dump(speaker_dict, f)
    with open(paths.train_dataset, 'wb') as f:
        pickle.dump(dataset[:4], f)
    with open(paths.val_dataset, 'wb') as f:
        pickle.dump(dataset[4:], f)
    return paths, text_dict, speaker_dict, dataset


def test_forward_dataset_fields(tiny_dataset):
    paths, text_dict, speaker_dict, dataset = tiny_dataset
    ds = ForwardDataset(paths, [i for i, _ in dataset], text_dict,
                        speaker_dict, Tokenizer())
    item = ds[0]
    assert set(item) >= {'x', 'mel', 'dur', 'pitch', 'energy', 'pitch_cond',
                         'speaker_emb', 'mel_len', 'x_len'}
    assert item['mel'].shape[-1] == item['mel_len']
    # pitch_cond is 1 where pitch==0 else 2
    expected = np.where(item['pitch'] != 0, 2, 1)
    np.testing.assert_array_equal(item['pitch_cond'], expected)


def test_dataloader_iterates_all(tiny_dataset):
    paths, text_dict, speaker_dict, dataset = tiny_dataset
    ds = TacoDataset(paths, [i for i, _ in dataset], text_dict,
                     speaker_dict, Tokenizer())
    loader = DataLoader(ds, TacoCollator(r=1), batch_size=4)
    seen = [i for b in loader for i in b['item_id']]
    assert len(seen) == 6
    assert len(loader) == 2


def test_binned_taco_dataloader_equal_lengths(tiny_dataset):
    paths, *_ = tiny_dataset
    loader = BinnedTacoDataLoader(paths, dataset=(
        pickle.loads(paths.train_dataset.read_bytes())
        + pickle.loads(paths.val_dataset.read_bytes())), max_batch_size=32)
    seen = 0
    for batch in loader:
        # all items in a batch share one token length (no padding)
        assert (batch['x'] != 0).all()
        seen += batch['x'].shape[0]
    assert seen == 6


def test_shard_for_host_balances_skewed_frame_totals():
    """Multi-host sharding must balance duration-expanded frame totals, not
    item counts: with an LJSpeech-like log-normal mel-length distribution
    (heavy right tail, clipped at max_mel_len=1250), per-host frame totals
    must agree within 10% (the serpentine deal bounds the spread by one
    max-length item) and the shards must partition the dataset exactly."""
    from forwardtacotron_tpu.data.dataset import shard_for_host

    rs = np.random.RandomState(0)
    lens = np.clip(np.exp(rs.normal(6.2, 0.55, 13100)), 40, 1250)
    data = [(f'item{i:05d}', int(t)) for i, t in enumerate(lens)]

    for n_hosts in (2, 4, 8):
        shards = [shard_for_host(data, h, n_hosts) for h in range(n_hosts)]
        # exact partition
        all_ids = sorted(i for s in shards for i, _ in s)
        assert all_ids == sorted(i for i, _ in data)
        totals = [sum(t for _, t in s) for s in shards]
        spread = (max(totals) - min(totals)) / min(totals)
        assert spread < 0.10, (n_hosts, totals)
        # serpentine is much tighter than the 10% requirement in practice
        assert spread < 0.002, (n_hosts, totals)


def test_shard_for_host_single_process_passthrough():
    from forwardtacotron_tpu.data.dataset import shard_for_host
    data = [('a', 3), ('b', 5)]
    assert shard_for_host(data, 0, 1) == data
