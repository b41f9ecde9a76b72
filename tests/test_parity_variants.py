"""Numerical parity for FastPitch, MultiForwardTacotron and MultiFastPitch
against the reference PyTorch implementations (same oracle pattern as
test_parity_forward_tacotron.py)."""

import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE_ROOT, reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason='reference repo not mounted')

if reference_available():
    sys.path.insert(0, str(REFERENCE_ROOT))

SEMB_DIMS = 256


def _make_pair(name):
    import torch
    from forwardtacotron_tpu.models.registry import init_tts_model
    from forwardtacotron_tpu.utils.convert import convert_state_dict
    from forwardtacotron_tpu.utils.files import read_config

    if name == 'fast_pitch':
        from models.fast_pitch import FastPitch as TorchModel
        config = read_config(str(REFERENCE_ROOT / 'configs' / 'singlespeaker.yaml'))
    elif name == 'multi_forward_tacotron':
        from models.multi_forward_tacotron import \
            MultiForwardTacotron as TorchModel
        config = read_config(str(REFERENCE_ROOT / 'configs' / 'multispeaker.yaml'))
    else:
        from models.multi_fast_pitch import MultiFastPitch as TorchModel
        config = read_config(str(REFERENCE_ROOT / 'configs' / 'multispeaker.yaml'))
    config['tts_model'] = name

    torch.manual_seed(0)
    torch_model = TorchModel.from_config(config).eval()
    jax_model = init_tts_model(config)
    variables, _ = convert_state_dict(torch_model.state_dict())
    return torch_model, jax_model, variables


def _series_inputs(rs, b=2, n=9):
    x = rs.randint(1, 100, (b, n)).astype(np.int64)
    dur = rs.randint(1, 4, (b, n)).astype(np.float32)
    mel_lens = dur.sum(axis=1).astype(np.int64)
    t = int(mel_lens.max()) + 1
    pitch = rs.randn(b, n).astype(np.float32)
    energy = rs.randn(b, n).astype(np.float32)
    mel = rs.randn(b, 80, t).astype(np.float32)
    pitch_cond = rs.randint(1, 3, (b, n)).astype(np.int64)
    semb = rs.randn(b, SEMB_DIMS).astype(np.float32)
    return x, dur, mel_lens, pitch, energy, mel, pitch_cond, semb


@pytest.mark.parametrize('name', ['fast_pitch', 'multi_forward_tacotron',
                                  'multi_fast_pitch'])
def test_generate_parity(name):
    import torch
    from forwardtacotron_tpu.models.synthesis import TTSInference

    torch_model, jax_model, variables = _make_pair(name)
    rs = np.random.RandomState(3)
    x = rs.randint(1, 100, (1, 14)).astype(np.int64)
    semb = rs.randn(1, SEMB_DIMS).astype(np.float32)

    multispeaker = name.startswith('multi')
    with torch.no_grad():
        if multispeaker:
            ref = torch_model.generate(torch.tensor(x), torch.tensor(semb))
        else:
            ref = torch_model.generate(torch.tensor(x))

    inference = TTSInference(jax_model, variables, multispeaker=multispeaker)
    out = inference.generate(x, speaker_emb=semb if multispeaker else None)

    np.testing.assert_allclose(np.asarray(out['dur']), ref['dur'].numpy(),
                               rtol=1e-4, atol=1e-4)
    ref_mel = ref['mel'].numpy()
    L = ref_mel.shape[-1]
    got_mel = np.asarray(out['mel'])[:, :L, :].transpose(0, 2, 1)
    assert int(out['mel_len'][0]) == L
    np.testing.assert_allclose(got_mel, ref_mel, rtol=1e-3, atol=1e-3)

    ref_post = ref['mel_post'].numpy()
    got_post = np.asarray(out['mel_post'])[:, :L, :].transpose(0, 2, 1)
    np.testing.assert_allclose(got_post, ref_post, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize('name', ['fast_pitch', 'multi_forward_tacotron',
                                  'multi_fast_pitch'])
def test_training_forward_parity(name):
    import torch

    import jax.numpy as jnp

    torch_model, jax_model, variables = _make_pair(name)
    rs = np.random.RandomState(4)
    x, dur, mel_lens, pitch, energy, mel, pitch_cond, semb = _series_inputs(rs)

    tbatch = {'x': torch.tensor(x), 'dur': torch.tensor(dur),
              'mel_len': torch.tensor(mel_lens),
              'pitch': torch.tensor(pitch), 'energy': torch.tensor(energy),
              'mel': torch.tensor(mel),
              'pitch_cond': torch.tensor(pitch_cond),
              'speaker_emb': torch.tensor(semb)}
    with torch.no_grad():
        ref = torch_model(tbatch)

    jbatch = {'x': jnp.asarray(x), 'dur': jnp.asarray(dur),
              'mel_len': jnp.asarray(mel_lens), 'pitch': jnp.asarray(pitch),
              'energy': jnp.asarray(energy),
              'mel': jnp.asarray(mel.transpose(0, 2, 1)),
              'pitch_cond': jnp.asarray(pitch_cond),
              'speaker_emb': jnp.asarray(semb)}
    out = jax_model.apply(variables, jbatch, train=False)

    np.testing.assert_allclose(np.asarray(out['dur']), ref['dur'].numpy(),
                               rtol=1e-4, atol=1e-4)
    if 'pitch_cond' in ref:
        np.testing.assert_allclose(np.asarray(out['pitch_cond']),
                                   ref['pitch_cond'].numpy(),
                                   rtol=1e-4, atol=1e-4)

    got_mel = np.asarray(out['mel']).transpose(0, 2, 1)
    got_post = np.asarray(out['mel_post']).transpose(0, 2, 1)
    ref_mel = ref['mel'].numpy()
    ref_post = ref['mel_post'].numpy()
    for i, ml in enumerate(mel_lens):
        np.testing.assert_allclose(got_mel[i, :, :ml], ref_mel[i, :, :ml],
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(got_post[i, :, :ml], ref_post[i, :, :ml],
                                   rtol=1e-3, atol=1e-3)
