"""VoiceEncoder (published Resemblyzer architecture) parity vs a torch
oracle built from the same published design (3-layer LSTM(40->256) ->
Linear -> ReLU -> L2 norm of the last layer's final hidden state), with
shared random weights — so the published pretrained.pt loads correctly the
moment it is available (reference preprocess.py:172-182 is the behavior
being replicated)."""

import numpy as np
import pytest
import torch

from forwardtacotron_tpu.models.speaker_encoder import (
    MEL_N_CHANNELS, MODEL_EMB, PARTIAL_N_FRAMES, VoiceEncoder,
    compute_partial_slices, init_voice_encoder_params)


class _TorchOracle(torch.nn.Module):
    """resemblyzer/voice_encoder.py VoiceEncoder, forward only."""

    def __init__(self):
        super().__init__()
        self.lstm = torch.nn.LSTM(MEL_N_CHANNELS, 256, num_layers=3,
                                  batch_first=True)
        self.linear = torch.nn.Linear(256, MODEL_EMB)
        self.relu = torch.nn.ReLU()

    def forward(self, mels):
        _, (hidden, _) = self.lstm(mels)
        embeds_raw = self.relu(self.linear(hidden[-1]))
        return embeds_raw / torch.norm(embeds_raw, dim=1, keepdim=True)


def test_forward_matches_torch_oracle():
    params = init_voice_encoder_params(seed=3)
    oracle = _TorchOracle()
    with torch.no_grad():
        for name, tensor in oracle.state_dict().items():
            tensor.copy_(torch.from_numpy(params[name]))
    oracle.eval()

    rs = np.random.RandomState(0)
    mels = rs.rand(4, PARTIAL_N_FRAMES, MEL_N_CHANNELS).astype(np.float32)

    enc = VoiceEncoder(params)
    got = enc.embed_frames_batch(mels)
    with torch.no_grad():
        want = oracle(torch.from_numpy(mels)).numpy()
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.linalg.norm(got, axis=1), 1.0, atol=1e-5)


def test_state_dict_key_compatibility():
    """init params use exactly the torch state_dict key names, so the
    published pretrained.pt state dict is a drop-in."""
    oracle_keys = set(_TorchOracle().state_dict().keys())
    assert set(init_voice_encoder_params().keys()) == oracle_keys


@pytest.mark.parametrize('n_samples,expect_partials', [
    (160 * 160, 1),        # second 50%-coverage slice trimmed (<0.75)
    (160 * 240, 2),        # 1.5 partials at 50% overlap, tail fully covered
    (160 * 80, 1),         # shorter than one partial: single padded slice
])
def test_partial_slices_published_semantics(n_samples, expect_partials):
    wav_slices, mel_slices = compute_partial_slices(n_samples)
    assert len(wav_slices) == len(mel_slices) == expect_partials
    for ws, ms in zip(wav_slices, mel_slices):
        assert ws.stop - ws.start == PARTIAL_N_FRAMES * 160
        assert ms.stop - ms.start == PARTIAL_N_FRAMES
    # last slice covers >= 75% of the audio or was trimmed
    last = wav_slices[-1]
    assert (n_samples - last.start) / (last.stop - last.start) >= 0.75 \
        or len(wav_slices) == 1


def test_embed_utterance_end_to_end():
    rs = np.random.RandomState(1)
    wav = (rs.randn(22050 * 2) * 0.1).astype(np.float32)  # 2 s @ 22.05 kHz
    enc = VoiceEncoder(init_voice_encoder_params(seed=0))
    emb = enc.embed_utterance(wav, source_sr=22050)
    assert emb.shape == (MODEL_EMB,)
    np.testing.assert_allclose(np.linalg.norm(emb), 1.0, atol=1e-5)
    # deterministic
    emb2 = enc.embed_utterance(wav, source_sr=22050)
    np.testing.assert_allclose(emb, emb2, atol=1e-6)


def test_load_weights_rejects_unrelated_checkpoint(tmp_path):
    """An arbitrary .pt named like Resemblyzer weights must raise (so
    preprocessing falls back to the mel-stats encoder instead of crashing
    with a KeyError mid-run)."""
    from forwardtacotron_tpu.models.speaker_encoder import \
        load_resemblyzer_weights
    bogus = tmp_path / 'pretrained.pt'
    torch.save({'model': {'some.layer': torch.zeros(3)}}, str(bogus))
    with pytest.raises(ValueError):
        load_resemblyzer_weights(str(bogus))
    # wrong shapes under the right key names also rejected
    bad = {k: torch.zeros(1) for k in init_voice_encoder_params()}
    torch.save(bad, str(bogus))
    with pytest.raises(ValueError):
        load_resemblyzer_weights(str(bogus))
    # a correctly-shaped state dict loads
    good = {k: torch.from_numpy(v)
            for k, v in init_voice_encoder_params(seed=5).items()}
    torch.save(good, str(bogus))
    params = load_resemblyzer_weights(str(bogus))
    assert set(params) == set(init_voice_encoder_params())


def test_preprocess_for_embedding_matches_resemblyzer_semantics():
    """Volume normalization to -30 dBFS (increase only) + VAD trim at
    16 kHz, mirroring resemblyzer's preprocess_wav (reference
    preprocess.py:80,181)."""
    from forwardtacotron_tpu.models.speaker_encoder import (
        AUDIO_NORM_TARGET_DBFS, normalize_volume, preprocess_for_embedding)
    rs = np.random.RandomState(2)
    quiet = (rs.randn(16000) * 0.001).astype(np.float32)
    boosted = normalize_volume(quiet, increase_only=True)
    got_dbfs = 10.0 * np.log10(np.mean(boosted ** 2))
    np.testing.assert_allclose(got_dbfs, AUDIO_NORM_TARGET_DBFS, atol=1e-3)
    # increase_only: already-loud audio is untouched
    loud = (rs.randn(16000) * 0.5).astype(np.float32)
    np.testing.assert_array_equal(normalize_volume(loud, increase_only=True),
                                  loud)

    # silence gap between two voiced spans is shortened by the VAD trim
    t = np.arange(16000) / 16000.0
    tone = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    wav = np.concatenate([tone, np.zeros(16000 * 2, np.float32), tone])
    out = preprocess_for_embedding(wav, source_sr=16000)
    assert len(out) < len(wav)
    assert len(out) >= len(tone)  # voiced content retained
