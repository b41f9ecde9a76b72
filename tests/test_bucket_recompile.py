"""Recompile-bound guarantee of bucket_multiple (SURVEY.md hard-part #5).

Training sees variable-length batches; XLA compiles once per distinct padded
shape. The collator's ``bucket_multiple`` rounds padded token/frame lengths
up to bucket boundaries, so a whole training session compiles a small,
bounded set of step shapes. This test runs epochs of a synthetic
varied-length dataset through the real sampler + collator and counts actual
jit cache entries.
"""

import jax
import jax.numpy as jnp
import numpy as np

from forwardtacotron_tpu.data.dataset import (BinnedLengthSampler,
                                              DataLoader, ForwardCollator,
                                              TacoCollator)

N_ITEMS = 64
BUCKET = 16
BATCH = 8


class _SyntheticDataset:
    """Items with token lengths 3..40 and mel lengths ~3x tokens."""

    def __init__(self, n_mels: int = 8):
        rs = np.random.RandomState(0)
        self.items = []
        for i in range(N_ITEMS):
            n = int(rs.randint(3, 41))
            t = 3 * n + int(rs.randint(0, 5))
            self.items.append({
                'item_id': f'i{i}', 'x': rs.randint(1, 50, n),
                'x_len': n, 'mel': rs.randn(n_mels, t).astype(np.float32),
                'mel_len': t, 'dur': rs.rand(n).astype(np.float32),
                'pitch': rs.randn(n).astype(np.float32),
                'energy': rs.rand(n).astype(np.float32),
                'pitch_cond': np.ones(n),
                'speaker_emb': np.zeros(4, np.float32),
                'speaker_name': 'spk0',
            })
        self.lens = [it['mel_len'] for it in self.items]

    def __len__(self):
        return N_ITEMS

    def __getitem__(self, i):
        return self.items[i]


def test_bucketed_session_compiles_bounded_shapes():
    data = _SyntheticDataset()
    collator = ForwardCollator(TacoCollator(r=1, bucket_multiple=BUCKET))
    loader = DataLoader(data, collate_fn=collator, batch_size=BATCH,
                        sampler=BinnedLengthSampler(data.lens, BATCH,
                                                    BATCH * 3))

    @jax.jit
    def fake_step(x, mel):
        return jnp.sum(x) + jnp.sum(mel)

    shapes = set()
    n_batches = 0
    for _ in range(6):  # several epochs, reshuffled bins each time
        for batch in loader:
            assert batch['x'].shape[1] % BUCKET == 0
            assert batch['mel'].shape[1] % BUCKET == 0
            # conditioning series padded to the token length
            for key in ('dur', 'pitch', 'energy'):
                assert batch[key].shape == batch['x'].shape
            shapes.add((batch['x'].shape, batch['mel'].shape))
            fake_step(batch['x'], batch['mel'])
            n_batches += 1

    # worst case: every (token-bucket, frame-bucket) pair that lengths 3..40
    # with ~3x expansion can produce — tokens <= 48 (3 buckets), frames <=
    # 3*40+5+1 -> 128 (8 buckets); in practice binned batching correlates
    # them tightly
    assert n_batches == 6 * (N_ITEMS // BATCH)
    assert len(shapes) <= 10, sorted(shapes)
    # the jit cache saw exactly one compile per distinct shape — compiles
    # are bounded by buckets, not by batch count
    assert fake_step._cache_size() == len(shapes)
    assert fake_step._cache_size() < n_batches // 3


def test_no_bucketing_recompiles_more():
    """Control: bucket_multiple=1 produces strictly more distinct shapes on
    the same data order (the bucketing is what bounds compiles)."""
    data = _SyntheticDataset()

    def distinct_shapes(bucket):
        collator = ForwardCollator(TacoCollator(r=1, bucket_multiple=bucket))
        loader = DataLoader(data, collate_fn=collator, batch_size=BATCH,
                            sampler=BinnedLengthSampler(data.lens, BATCH,
                                                        BATCH * 3))
        shapes = set()
        for _ in range(4):
            for batch in loader:
                shapes.add((batch['x'].shape, batch['mel'].shape))
        return shapes

    assert len(distinct_shapes(1)) > len(distinct_shapes(BUCKET))
