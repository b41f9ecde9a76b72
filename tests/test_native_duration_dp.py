"""Native C++ duration DP vs the numpy DP and the scipy-Dijkstra oracle.

The native path must match the numpy DP node-for-node (same algorithm, same
tie-breaking), and both must give the same durations as the reference-style
Dijkstra (test pattern from reference tests/test_duration_extractor.py).
"""

import numpy as np
import pytest

from forwardtacotron_tpu.duration.extractor import (
    DurationExtractor, _shortest_monotonic_path_dp,
    _shortest_monotonic_path_native)
from forwardtacotron_tpu.native import load_library


def _random_weights(rng, rows, cols):
    return rng.rand(rows, cols)


def test_native_library_builds():
    assert load_library('duration_dp') is not None, \
        'native duration_dp failed to build (g++ expected in image)'


@pytest.mark.parametrize('rows,cols', [(1, 1), (1, 7), (7, 1), (2, 2),
                                       (5, 3), (3, 5), (40, 13), (250, 80)])
def test_native_matches_numpy_dp(rows, cols):
    rng = np.random.RandomState(rows * 1000 + cols)
    for _ in range(3):
        w = _random_weights(rng, rows, cols)
        native = _shortest_monotonic_path_native(w)
        assert native is not None
        assert native == _shortest_monotonic_path_dp(w)


def test_native_matches_numpy_with_ties():
    # quantized weights force many exact ties -> exercises tie-breaking
    rng = np.random.RandomState(0)
    for _ in range(5):
        w = np.round(rng.rand(30, 12) * 3) / 3.0
        assert (_shortest_monotonic_path_native(w)
                == _shortest_monotonic_path_dp(w))


def test_extractor_end_to_end_native_vs_dijkstra():
    rng = np.random.RandomState(42)
    n_mels, t, n = 8, 60, 20
    x = rng.randint(1, 100, n)
    mel = rng.randn(n_mels, t).astype(np.float32) - 4.0
    # sharp-ish diagonal attention with noise
    att = np.zeros((t, n))
    for i in range(t):
        j = min(int(i * n / t), n - 1)
        att[i, j] = 0.9
    att += rng.rand(t, n) * 0.05

    dp = DurationExtractor(silence_threshold=-11.0, silence_prob_shift=0.25,
                           method='dp')
    dijkstra = DurationExtractor(silence_threshold=-11.0,
                                 silence_prob_shift=0.25, method='dijkstra')
    dur_dp, score_dp = dp(x, mel, att)
    dur_dj, score_dj = dijkstra(x, mel, att)
    assert dur_dp.sum() == t
    np.testing.assert_array_equal(dur_dp, dur_dj)
    assert abs(score_dp - score_dj) < 1e-9
