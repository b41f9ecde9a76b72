"""Reference .pt checkpoint ingestion: save a real torch checkpoint in the
reference's format and load it through the framework's checkpoint API, then
synthesize and compare against the torch model (the forward_step90k.pt
workflow, end to end)."""

import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE_ROOT, reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason='reference repo not mounted')

if reference_available():
    sys.path.insert(0, str(REFERENCE_ROOT))


def test_pt_checkpoint_load_and_generate(tmp_path):
    import torch
    from models.forward_tacotron import ForwardTacotron as TorchFT

    from forwardtacotron_tpu.models.synthesis import TTSInference
    from forwardtacotron_tpu.utils.checkpoints import (
        init_tts_model_from_checkpoint, load_checkpoint)
    from forwardtacotron_tpu.utils.files import read_config

    config = read_config(str(REFERENCE_ROOT / 'configs' / 'singlespeaker.yaml'))
    torch.manual_seed(5)
    torch_model = TorchFT.from_config(config).eval()

    # reference checkpoint format (utils/checkpoints.py:13-23)
    pt_path = tmp_path / 'forward_step90k.pt'
    torch.save({'model': torch_model.state_dict(),
                'config': config}, str(pt_path))

    checkpoint = load_checkpoint(pt_path)
    assert checkpoint['config']['tts_model'] == 'forward_tacotron'

    model, variables, checkpoint = init_tts_model_from_checkpoint(pt_path)
    inference = TTSInference(model, variables, multispeaker=False)

    rs = np.random.RandomState(0)
    x = rs.randint(1, 100, (1, 17)).astype(np.int64)
    with torch.no_grad():
        ref = torch_model.generate(torch.tensor(x))
    out = inference.generate_cropped(x[0])

    ref_post = ref['mel_post'].numpy()[0]
    np.testing.assert_allclose(out['mel_post'], ref_post,
                               rtol=1e-3, atol=1e-3)
