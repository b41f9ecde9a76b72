"""Numerical parity: JAX Tacotron teacher vs the reference PyTorch model
(teacher-forced forward and free-running generate, eval mode)."""

import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE_ROOT, reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason='reference repo not mounted')

if reference_available():
    sys.path.insert(0, str(REFERENCE_ROOT))


@pytest.fixture(scope='module')
def pair():
    import torch
    from models.tacotron import Tacotron as TorchTaco

    import jax
    from forwardtacotron_tpu.models.tacotron import Tacotron
    from forwardtacotron_tpu.utils.convert import (convert_state_dict,
                                                   validate_against)
    from forwardtacotron_tpu.utils.files import read_config

    config = read_config(str(REFERENCE_ROOT / 'configs' / 'singlespeaker.yaml'))
    torch.manual_seed(0)
    torch_model = TorchTaco.from_config(config).eval()
    jax_model = Tacotron.from_config(config)
    variables, aux = convert_state_dict(torch_model.state_dict())

    rs = np.random.RandomState(0)
    batch = _batch(rs, r=2)
    init_vars = jax_model.init({'params': jax.random.PRNGKey(0),
                                'dropout': jax.random.PRNGKey(1)},
                               batch, r=2, train=False)
    validate_against(variables, init_vars)
    assert 'stop_threshold' in aux and 'decoder.r' in aux
    return torch_model, jax_model, variables


def _batch(rs, b=2, n=9, r=2, steps=6):
    import jax.numpy as jnp
    t = r * steps
    return {'x': jnp.asarray(rs.randint(1, 100, (b, n))),
            'mel': jnp.asarray(rs.randn(b, t, 80).astype(np.float32)),
            'speaker_emb': None}


def test_param_count(pair):
    import jax
    torch_model, _, variables = pair
    n_torch = sum(p.numel() for p in torch_model.parameters())
    n_jax = sum(x.size for x in jax.tree.leaves(variables['params']))
    assert n_jax == n_torch


def test_teacher_forced_forward_parity(pair):
    import torch
    torch_model, jax_model, variables = pair
    rs = np.random.RandomState(1)
    r = 2
    batch = _batch(rs, r=r)
    mel_t = np.asarray(batch['mel']).transpose(0, 2, 1)

    torch_model.r = r
    with torch.no_grad():
        ref_mel, ref_lin, ref_attn = torch_model(
            {'x': torch.tensor(np.asarray(batch['x'])),
             'mel': torch.tensor(mel_t),
             'speaker_emb': torch.zeros(2, 1)})

    got_mel, got_lin, got_attn = jax_model.apply(
        variables, batch, r=r, train=False)

    np.testing.assert_allclose(np.asarray(got_attn), ref_attn.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_mel).transpose(0, 2, 1),
                               ref_mel.numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_lin).transpose(0, 2, 1),
                               ref_lin.numpy(), rtol=1e-3, atol=1e-3)


def test_generate_parity(pair):
    import torch
    torch_model, jax_model, variables = pair
    rs = np.random.RandomState(2)
    x = rs.randint(1, 100, (1, 7)).astype(np.int64)

    torch_model.r = 1
    with torch.no_grad():
        ref_mel, ref_lin, ref_attn = torch_model.generate(
            torch.tensor(x), steps=40)
    ref_frames = ref_mel.shape[-1]

    got_mel, got_lin, got_attn, n_valid = jax_model.apply(
        variables, np.asarray(x), steps=40, r=1,
        method=type(jax_model).generate)
    n = int(n_valid[0])
    assert n == ref_frames
    np.testing.assert_allclose(
        np.asarray(got_mel)[0, :n].T, ref_mel, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(got_attn)[0, :n], ref_attn, rtol=1e-3, atol=1e-4)
