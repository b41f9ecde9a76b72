"""Duration extractor: exact durations on synthetic attention, DP==Dijkstra,
and cross-validation against the reference implementation as oracle."""

import sys

import numpy as np
import pytest

from forwardtacotron_tpu.duration.extractor import DurationExtractor
from tests.conftest import REFERENCE_ROOT, reference_available


def _diagonal_attention(n_tokens, frames_per_token):
    t = n_tokens * frames_per_token
    att = np.full((t, n_tokens), 0.01)
    for i in range(t):
        att[i, i // frames_per_token] = 0.99
    return att


def test_perfect_diagonal():
    n, fpt = 5, 2
    att = _diagonal_attention(n, fpt)
    mel = np.zeros((4, n * fpt))  # all rows non-silent (mean 0 > -11)
    x = np.arange(20, 20 + n)
    extractor = DurationExtractor(silence_threshold=-11,
                                  silence_prob_shift=0.25)
    durations, att_score = extractor(x, mel, att)
    np.testing.assert_array_equal(durations, [fpt] * n)
    assert att_score > 0.9


def test_silence_prob_shift_fixes_leakage():
    """Fuzzy attention during a silent gap: the prob shift should assign the
    silent frames to the punctuation token (id 1 = '!')."""
    n, fpt = 5, 2
    att = _diagonal_attention(n, fpt)
    t = n * fpt
    # middle token (index 2) is punctuation; rows 4..5 silent + fuzzy
    x = np.array([20, 21, 1, 22, 23])
    mel = np.zeros((4, t))
    mel[:, 4:6] = -12.0  # silent rows
    att[4:6] = 0.2  # fuzzy attention in the silence
    extractor = DurationExtractor(silence_threshold=-11,
                                  silence_prob_shift=0.25)
    durations, _ = extractor(x, mel, att)
    assert durations.sum() == t
    assert durations[2] >= fpt  # silence lands on the punctuation token


def test_dp_equals_dijkstra():
    rs = np.random.RandomState(0)
    for _ in range(5):
        t, n = rs.randint(10, 40), rs.randint(4, 12)
        att = rs.dirichlet(np.ones(n) * 0.3, size=t)
        mel = rs.randn(4, t) * 2 - 6
        x = rs.randint(1, 100, n)
        dp = DurationExtractor(-11, 0.25, method='dp')
        dj = DurationExtractor(-11, 0.25, method='dijkstra')
        d1, s1 = dp(x, mel, att)
        d2, s2 = dj(x, mel, att)
        assert d1.sum() == d2.sum() == t
        np.testing.assert_array_equal(d1, d2)
        assert abs(s1 - s2) < 1e-9


@pytest.mark.skipif(not reference_available(),
                    reason='reference repo not mounted')
def test_matches_reference_extractor():
    sys.path.insert(0, str(REFERENCE_ROOT))
    import torch
    from duration_extraction.duration_extractor import \
        DurationExtractor as RefExtractor

    rs = np.random.RandomState(1)
    ours = DurationExtractor(-11, 0.25)
    theirs = RefExtractor(silence_threshold=-11, silence_prob_shift=0.25)
    for _ in range(4):
        t, n = rs.randint(12, 50), rs.randint(5, 14)
        att = rs.dirichlet(np.ones(n) * 0.2, size=t)
        mel = rs.randn(4, t) * 3 - 8
        x = rs.randint(1, 100, n)
        d_ours, s_ours = ours(x, mel, att.copy())
        d_ref, s_ref = theirs(torch.tensor(x), torch.tensor(mel),
                              torch.tensor(att.copy()))
        np.testing.assert_array_equal(d_ours, d_ref.numpy())
        assert abs(s_ours - float(s_ref)) < 1e-6
