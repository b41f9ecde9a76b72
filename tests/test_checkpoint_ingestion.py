"""Reference .pt checkpoint ingestion: save a real torch checkpoint in the
reference's format and load it through the framework's checkpoint API, then
synthesize and compare against the torch model (the forward_step90k.pt
workflow, end to end)."""

import sys
from pathlib import Path

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


def test_pinned_schema_matches_reference_and_converter(tmp_path):
    """The pinned state_dict schema (tests/resources/
    reference_state_dict_schema.json, the documented contract of
    utils/convert.py for the published checkpoints) must (a) still match
    what the reference models emit and (b) convert onto each flax model's
    init tree structure+shapes exactly."""
    import json
    from pathlib import Path

    import jax
    import torch
    from models.fast_pitch import FastPitch
    from models.forward_tacotron import ForwardTacotron
    from models.multi_fast_pitch import MultiFastPitch
    from models.multi_forward_tacotron import MultiForwardTacotron

    from forwardtacotron_tpu.models.registry import init_tts_model
    from forwardtacotron_tpu.utils.convert import (convert_state_dict,
                                                   validate_against)
    from forwardtacotron_tpu.utils.files import read_config

    doc = json.loads(Path('tests/resources/'
                          'reference_state_dict_schema.json').read_text())
    schema = doc['models']

    single = read_config(str(REFERENCE_ROOT / 'configs'
                             / 'singlespeaker.yaml'))
    multi = read_config(str(REFERENCE_ROOT / 'configs'
                            / 'multispeaker.yaml'))
    cases = {
        'forward_tacotron': (ForwardTacotron, single, False),
        'fast_pitch': (FastPitch, single, False),
        'multi_forward_tacotron': (MultiForwardTacotron, multi, True),
        'multi_fast_pitch': (MultiFastPitch, multi, True),
    }
    for name, (torch_cls, config, is_multi) in cases.items():
        # (a) reference still emits the pinned schema
        got = {k: list(v.shape)
               for k, v in torch_cls.from_config(config).state_dict().items()}
        assert got == schema[name], f'{name}: reference schema drifted'

        # (b) a synthetic state_dict with exactly the pinned keys/shapes
        # converts onto the flax init tree
        state_dict = {k: torch.zeros(shape)
                      for k, shape in schema[name].items()}
        variables, _aux = convert_state_dict(state_dict)

        cfg = dict(config)
        cfg['tts_model'] = name
        model = init_tts_model(cfg)
        n = 8
        batch = {'x': np.ones((1, n), np.int64),
                 'dur': np.ones((1, n), np.float32),
                 'mel_len': np.array([2 * n]),
                 'pitch': np.zeros((1, n), np.float32),
                 'energy': np.zeros((1, n), np.float32),
                 'mel': np.zeros((1, 2 * n, config['dsp']['num_mels']),
                                 np.float32)}
        if is_multi:
            batch['speaker_emb'] = np.zeros(
                (1, config[name]['model']['speaker_emb_dims']), np.float32)
            batch['pitch_cond'] = np.ones((1, n), np.int64)
        ref_vars = model.init({'params': jax.random.PRNGKey(0),
                               'dropout': jax.random.PRNGKey(1)},
                              batch, train=False)
        validate_against(variables, ref_vars)


@pytest.mark.slow
def test_verify_reference_checkpoint_gate(tmp_path):
    """The armed published-checkpoint gate (scripts/
    verify_reference_checkpoint.py) must exit 2 with instructions when no
    checkpoint exists and PASS end-to-end on a reference-format checkpoint
    (reference torch model as oracle)."""
    import os
    import subprocess

    import torch
    from models.forward_tacotron import ForwardTacotron as TorchFT

    from forwardtacotron_tpu.utils.files import read_config

    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env.pop('PYTHONPATH', None)

    r = subprocess.run(
        [sys.executable, 'scripts/verify_reference_checkpoint.py',
         str(tmp_path / 'missing.pt')], capture_output=True, text=True,
        env=env, timeout=120)
    assert r.returncode == 2 and 'forward_step90k.pt' in r.stdout

    config = read_config(str(REFERENCE_ROOT / 'configs'
                             / 'singlespeaker.yaml'))
    torch.manual_seed(11)
    model = TorchFT.from_config(config).eval()
    pt = tmp_path / 'forward_step90k.pt'
    torch.save({'model': model.state_dict(), 'config': config}, str(pt))
    r = subprocess.run(
        [sys.executable, 'scripts/verify_reference_checkpoint.py', str(pt)],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-1000:]
    assert 'GATE PASSED' in r.stdout


def test_gate_fails_on_corrupt_checkpoint(tmp_path):
    """A corrupt/truncated .pt (e.g. a partial download of a PUBLISHED
    file) must FAIL the gate loudly, not print 'skipping' and pass
    (round-4 advisor finding)."""
    import os
    import subprocess

    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env.pop('PYTHONPATH', None)

    bad = tmp_path / 'forward_step90k.pt'
    bad.write_bytes(b'PK\x03\x04 definitely not a torch checkpoint')
    r = subprocess.run(
        [sys.executable, 'scripts/verify_reference_checkpoint.py',
         str(bad)], capture_output=True, text=True, env=env, timeout=120)
    assert r.returncode == 1, (r.returncode, r.stdout[-500:])
    assert 'GATE FAILED' in r.stdout
    assert 'torch.load failed' in r.stdout


@pytest.mark.slow
def test_gate_covers_all_families_and_vocoders(tmp_path):
    """The widened gate (VERDICT r3 item 8) dispatches on checkpoint
    content: teacher, both multispeaker students, and the two vocoder
    loaders are all verified from synthetic reference-format files in ONE
    gate invocation."""
    import importlib.util
    import json
    import os
    import subprocess

    import numpy as np
    import torch
    from models.multi_fast_pitch import MultiFastPitch as TorchMFP
    from models.multi_forward_tacotron import \
        MultiForwardTacotron as TorchMFT
    from models.tacotron import Tacotron as TorchTaco

    from forwardtacotron_tpu.utils.files import read_config

    torch.manual_seed(7)
    cfg = read_config(str(REFERENCE_ROOT / 'configs/singlespeaker.yaml'))
    mcfg = read_config(str(REFERENCE_ROOT / 'configs/multispeaker.yaml'))

    taco = TorchTaco.from_config(cfg).eval()
    torch.save({'model': taco.state_dict(), 'config': cfg},
               str(tmp_path / 'taco_step10k.pt'))

    dims = mcfg['multi_forward_tacotron']['model']['speaker_emb_dims']
    emb = {'spk0': np.random.RandomState(0).randn(dims).astype(np.float32)}
    mft = TorchMFT.from_config(mcfg).eval()
    torch.save({'model': mft.state_dict(), 'config': mcfg,
                'speaker_embeddings': emb},
               str(tmp_path / 'multi_forward_latest.pt'))
    mcfg2 = dict(mcfg)
    mcfg2['tts_model'] = 'multi_fast_pitch'
    mfp = TorchMFP.from_config(mcfg2).eval()
    torch.save({'model': mfp.state_dict(), 'config': mcfg2,
                'speaker_embeddings': emb},
               str(tmp_path / 'multi_fastpitch_latest.pt'))

    spec = importlib.util.spec_from_file_location(
        '_vo', str(Path(__file__).parent / 'test_vocoder.py'))
    vo = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(vo)
    hcfg = dict(upsample_initial_channel=64, resblock_kernel_sizes=[3],
                resblock_dilation_sizes=[[1, 3, 5]])
    hg = vo.TorchHiFiGAN(
        **{k: tuple(tuple(i) if isinstance(i, list) else i for i in v)
           if isinstance(v, list) else v for k, v in hcfg.items()}).eval()
    torch.save({'generator': hg.state_dict()},
               str(tmp_path / 'hifigan_g.pt'))
    (tmp_path / 'config.json').write_text(json.dumps(hcfg))
    mg = vo.TorchMelGAN().eval()
    torch.save({'model_g': mg.state_dict()},
               str(tmp_path / 'melgan_nvidia.pt'))

    env = dict(os.environ)
    env.pop('PYTHONPATH', None)
    names = ['taco_step10k.pt', 'multi_forward_latest.pt',
             'multi_fastpitch_latest.pt', 'hifigan_g.pt',
             'melgan_nvidia.pt']
    r = subprocess.run(
        [sys.executable, 'scripts/verify_reference_checkpoint.py']
        + [str(tmp_path / n) for n in names],
        capture_output=True, text=True, env=env, timeout=900)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-1500:]
    assert 'GATE PASSED' in r.stdout
    assert r.stdout.count('[PASS]') >= 8  # 2 students x3 + teacher + 2 voc
    assert '(teacher)' in r.stdout
    assert '(hifigan)' in r.stdout and '(melgan)' in r.stdout
