"""Numerical parity: JAX ForwardTacotron vs the reference PyTorch model.

The reference repo (read-only mount) is imported as a test oracle: we build
its torch model with the real singlespeaker config, convert the randomly
initialized state_dict with utils/convert.py, and require allclose outputs
on both the generate path (the checkpoint-parity gate of BASELINE.md) and
the teacher-forced training path.
"""

import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE_ROOT, reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason='reference repo not mounted')

if reference_available():
    sys.path.insert(0, str(REFERENCE_ROOT))


@pytest.fixture(scope='module')
def models_and_vars():
    import torch
    from models.forward_tacotron import ForwardTacotron as TorchFT

    import jax
    from forwardtacotron_tpu.models.forward_tacotron import ForwardTacotron
    from forwardtacotron_tpu.utils.convert import (convert_state_dict,
                                                   validate_against)
    from forwardtacotron_tpu.utils.files import read_config

    config = read_config(str(REFERENCE_ROOT / 'configs' / 'singlespeaker.yaml'))
    torch.manual_seed(0)
    torch_model = TorchFT.from_config(config).eval()

    jax_model = ForwardTacotron.from_config(config)

    variables, aux = convert_state_dict(torch_model.state_dict())

    # structural validation against a fresh init
    batch = _jax_batch(np.random.RandomState(0))
    init_vars = jax_model.init({'params': jax.random.PRNGKey(0),
                                'dropout': jax.random.PRNGKey(1)},
                               batch, train=False)
    validate_against(variables, init_vars)
    return torch_model, jax_model, variables


def _np_inputs(rs, b=2, n=11):
    x = rs.randint(1, 100, (b, n)).astype(np.int64)
    dur = rs.randint(1, 5, (b, n)).astype(np.float32)
    mel_lens = dur.sum(axis=1).astype(np.int64)
    t = int(mel_lens.max()) + 1
    pitch = rs.randn(b, n).astype(np.float32)
    energy = rs.randn(b, n).astype(np.float32)
    mel = rs.randn(b, 80, t).astype(np.float32)
    return x, dur, mel_lens, pitch, energy, mel


def _jax_batch(rs):
    import jax.numpy as jnp
    x, dur, mel_lens, pitch, energy, mel = _np_inputs(rs)
    return {'x': jnp.asarray(x), 'dur': jnp.asarray(dur),
            'mel_len': jnp.asarray(mel_lens), 'pitch': jnp.asarray(pitch),
            'energy': jnp.asarray(energy),
            'mel': jnp.asarray(mel.transpose(0, 2, 1))}


def test_param_count_matches(models_and_vars):
    import jax
    torch_model, _, variables = models_and_vars
    n_torch = sum(p.numel() for p in torch_model.parameters())
    n_jax = sum(x.size for x in jax.tree.leaves(variables['params']))
    assert n_jax == n_torch


def test_generate_parity(models_and_vars):
    import torch
    from forwardtacotron_tpu.models.forward_tacotron import \
        ForwardTacotronInference

    torch_model, jax_model, variables = models_and_vars
    rs = np.random.RandomState(1)
    x = rs.randint(1, 100, (1, 30)).astype(np.int64)

    with torch.no_grad():
        ref = torch_model.generate(torch.tensor(x))

    inference = ForwardTacotronInference(jax_model, variables)
    out = inference.generate(np.asarray(x))

    np.testing.assert_allclose(np.asarray(out['dur']),
                               ref['dur'].numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out['pitch'])[:, None, :],
                               ref['pitch'].numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out['energy'])[:, None, :],
                               ref['energy'].numpy(), rtol=1e-4, atol=1e-4)

    ref_mel = ref['mel'].numpy()          # [1, 80, L]
    ref_post = ref['mel_post'].numpy()
    L = ref_mel.shape[-1]
    got_mel = np.asarray(out['mel'])[:, :L, :].transpose(0, 2, 1)
    got_post = np.asarray(out['mel_post'])[:, :L, :].transpose(0, 2, 1)
    assert int(out['mel_len'][0]) == L
    np.testing.assert_allclose(got_mel, ref_mel, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(got_post, ref_post, rtol=1e-3, atol=1e-3)


def test_generate_parity_with_trained_batchnorm_stats():
    """Random-init BN stats (mean 0, var 1) make BN(0)=0 and hide padded-tail
    leakage through conv look-ahead taps; perturb the running stats to
    simulate a trained checkpoint and require generate parity to hold."""
    import torch
    from models.forward_tacotron import ForwardTacotron as TorchFT

    from forwardtacotron_tpu.models.forward_tacotron import (
        ForwardTacotron, ForwardTacotronInference)
    from forwardtacotron_tpu.utils.convert import convert_state_dict
    from forwardtacotron_tpu.utils.files import read_config

    config = read_config(str(REFERENCE_ROOT / 'configs' / 'singlespeaker.yaml'))
    torch.manual_seed(3)
    torch_model = TorchFT.from_config(config).eval()
    with torch.no_grad():
        for mod in torch_model.modules():
            if isinstance(mod, torch.nn.BatchNorm1d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 2.0)

    jax_model = ForwardTacotron.from_config(config)
    variables, _ = convert_state_dict(torch_model.state_dict())

    rs = np.random.RandomState(7)
    x = rs.randint(1, 100, (1, 21)).astype(np.int64)
    with torch.no_grad():
        ref = torch_model.generate(torch.tensor(x))
    out = ForwardTacotronInference(jax_model, variables).generate(x)

    ref_post = ref['mel_post'].numpy()
    L = ref_post.shape[-1]
    got_post = np.asarray(out['mel_post'])[:, :L, :].transpose(0, 2, 1)
    np.testing.assert_allclose(got_post, ref_post, rtol=1e-3, atol=1e-3)


def test_training_forward_parity(models_and_vars):
    import torch
    torch_model, jax_model, variables = models_and_vars
    rs = np.random.RandomState(2)
    x, dur, mel_lens, pitch, energy, mel = _np_inputs(rs)

    tbatch = {'x': torch.tensor(x), 'dur': torch.tensor(dur),
              'mel_len': torch.tensor(mel_lens),
              'pitch': torch.tensor(pitch), 'energy': torch.tensor(energy),
              'mel': torch.tensor(mel)}
    with torch.no_grad():
        ref = torch_model(tbatch)  # eval mode: deterministic

    import jax.numpy as jnp
    jbatch = {'x': jnp.asarray(x), 'dur': jnp.asarray(dur),
              'mel_len': jnp.asarray(mel_lens), 'pitch': jnp.asarray(pitch),
              'energy': jnp.asarray(energy),
              'mel': jnp.asarray(mel.transpose(0, 2, 1))}
    out = jax_model.apply(variables, jbatch, train=False)

    np.testing.assert_allclose(np.asarray(out['dur']), ref['dur'].numpy(),
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
    # padded region reproduces the reference's _pad constant
    t_total = got_mel.shape[-1]
    l_max = int(mel_lens.max())
    if t_total > l_max:
        np.testing.assert_allclose(got_mel[:, :, l_max:], -11.5129)
        np.testing.assert_allclose(got_post[:, :, l_max:], -11.5129)
