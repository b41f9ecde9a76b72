"""Neural vocoder parity: flax HiFi-GAN / MelGAN generators vs torch oracles.

The reference never implements these vocoders (it exports mels for them,
reference gen_forward.py:108-116), so the oracle here is a minimal torch
re-statement of the PUBLIC checkpoint architectures (jik876/hifigan
Generator, seungwonpark/melgan Generator) built in this file with
torch.nn.utils.weight_norm — exactly the state-dict format the published
checkpoints use. The torch mirror's state_dict goes through
utils/vocoder_checkpoints.py and the flax output must match allclose, which
gates both the architecture translation (transposed-conv/padding semantics)
and the weight-norm folding + layout conversion.
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


def _wn(m):
    return tnn.utils.weight_norm(m)


def _pad(k, d=1):
    return (k * d - d) // 2


# ---------------------------------------------------------------- torch side

class TorchResBlock1(tnn.Module):
    def __init__(self, ch, k=3, dilation=(1, 3, 5)):
        super().__init__()
        self.convs1 = tnn.ModuleList([
            _wn(tnn.Conv1d(ch, ch, k, 1, dilation=d, padding=_pad(k, d)))
            for d in dilation])
        self.convs2 = tnn.ModuleList([
            _wn(tnn.Conv1d(ch, ch, k, 1, dilation=1, padding=_pad(k, 1)))
            for _ in dilation])

    def forward(self, x):
        for c1, c2 in zip(self.convs1, self.convs2):
            xt = c1(F.leaky_relu(x, 0.1))
            xt = c2(F.leaky_relu(xt, 0.1))
            x = x + xt
        return x


class TorchResBlock2(tnn.Module):
    def __init__(self, ch, k=3, dilation=(1, 3)):
        super().__init__()
        self.convs = tnn.ModuleList([
            _wn(tnn.Conv1d(ch, ch, k, 1, dilation=d, padding=_pad(k, d)))
            for d in dilation])

    def forward(self, x):
        for c in self.convs:
            x = x + c(F.leaky_relu(x, 0.1))
        return x


class TorchHiFiGAN(tnn.Module):
    """Mirror of jik876/hifigan models.Generator (inference graph)."""

    def __init__(self, resblock='1', upsample_rates=(8, 8, 2, 2),
                 upsample_kernel_sizes=(16, 16, 4, 4),
                 upsample_initial_channel=512,
                 resblock_kernel_sizes=(3, 7, 11),
                 resblock_dilation_sizes=((1, 3, 5),) * 3, num_mels=80):
        super().__init__()
        self.num_kernels = len(resblock_kernel_sizes)
        self.conv_pre = _wn(tnn.Conv1d(num_mels, upsample_initial_channel,
                                       7, 1, padding=3))
        block = TorchResBlock1 if resblock == '1' else TorchResBlock2
        self.ups = tnn.ModuleList()
        self.resblocks = tnn.ModuleList()
        ch = upsample_initial_channel
        for u, k in zip(upsample_rates, upsample_kernel_sizes):
            self.ups.append(_wn(tnn.ConvTranspose1d(
                ch, ch // 2, k, u, padding=(k - u) // 2)))
            ch //= 2
            for kr, dr in zip(resblock_kernel_sizes,
                              resblock_dilation_sizes):
                self.resblocks.append(block(ch, kr, dr))
        self.conv_post = _wn(tnn.Conv1d(ch, 1, 7, 1, padding=3))

    def forward(self, x):
        x = self.conv_pre(x)
        for i, up in enumerate(self.ups):
            x = up(F.leaky_relu(x, 0.1))
            xs = None
            for j in range(self.num_kernels):
                xb = self.resblocks[i * self.num_kernels + j](x)
                xs = xb if xs is None else xs + xb
            x = xs / self.num_kernels
        x = F.leaky_relu(x)  # official code: bare default 0.01 slope here
        return torch.tanh(self.conv_post(x))


class TorchMelGANResStack(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.blocks = tnn.ModuleList([
            tnn.Sequential(
                tnn.LeakyReLU(0.2), tnn.ReflectionPad1d(3 ** i),
                _wn(tnn.Conv1d(ch, ch, 3, dilation=3 ** i)),
                tnn.LeakyReLU(0.2), _wn(tnn.Conv1d(ch, ch, 1)))
            for i in range(3)])
        self.shortcuts = tnn.ModuleList(
            [_wn(tnn.Conv1d(ch, ch, 1)) for _ in range(3)])

    def forward(self, x):
        for block, shortcut in zip(self.blocks, self.shortcuts):
            x = shortcut(x) + block(x)
        return x


class TorchMelGAN(tnn.Module):
    """Mirror of seungwonpark/melgan models.generator.Generator."""

    def __init__(self, mel_channels=80):
        super().__init__()
        self.generator = tnn.Sequential(
            tnn.ReflectionPad1d(3),
            _wn(tnn.Conv1d(mel_channels, 512, 7)),
            tnn.LeakyReLU(0.2),
            _wn(tnn.ConvTranspose1d(512, 256, 16, 8, padding=4)),
            TorchMelGANResStack(256),
            tnn.LeakyReLU(0.2),
            _wn(tnn.ConvTranspose1d(256, 128, 16, 8, padding=4)),
            TorchMelGANResStack(128),
            tnn.LeakyReLU(0.2),
            _wn(tnn.ConvTranspose1d(128, 64, 4, 2, padding=1)),
            TorchMelGANResStack(64),
            tnn.LeakyReLU(0.2),
            _wn(tnn.ConvTranspose1d(64, 32, 4, 2, padding=1)),
            TorchMelGANResStack(32),
            tnn.LeakyReLU(0.2),
            tnn.ReflectionPad1d(3),
            _wn(tnn.Conv1d(32, 1, 7)),
            tnn.Tanh(),
        )

    def forward(self, x):
        return self.generator(x)


# ------------------------------------------------------------------- parity

HIFI_V3ISH = dict(resblock='2', upsample_rates=(8, 8, 4),
                  upsample_kernel_sizes=(16, 16, 8),
                  upsample_initial_channel=64,
                  resblock_kernel_sizes=(3, 5, 7),
                  resblock_dilation_sizes=((1, 2), (2, 6), (3, 12)))


@pytest.mark.parametrize('cfg', [
    dict(upsample_initial_channel=64),  # v1-shaped, narrow for test speed
    HIFI_V3ISH,
])
def test_hifigan_parity(cfg):
    from forwardtacotron_tpu.models.vocoder import HiFiGANGenerator
    from forwardtacotron_tpu.utils.vocoder_checkpoints import (
        convert_hifigan_state_dict)

    torch.manual_seed(0)
    oracle = TorchHiFiGAN(**cfg).eval()
    mel = np.random.RandomState(1).randn(2, 80, 17).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(mel)).squeeze(1).numpy()

    model = HiFiGANGenerator.from_config(cfg)
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    params = convert_hifigan_state_dict(sd)
    got = np.asarray(model.apply({'params': params},
                                 mel.transpose(0, 2, 1)))
    hop = int(np.prod(cfg.get('upsample_rates', (8, 8, 2, 2))))
    assert got.shape == (2, 17 * hop)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_melgan_parity():
    from forwardtacotron_tpu.models.vocoder import MelGANGenerator
    from forwardtacotron_tpu.utils.vocoder_checkpoints import (
        convert_melgan_state_dict)

    torch.manual_seed(0)
    oracle = TorchMelGAN().eval()
    mel = np.random.RandomState(2).randn(1, 80, 13).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(mel)).squeeze(1).numpy()

    model = MelGANGenerator()
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    params = convert_melgan_state_dict(sd)
    got = np.asarray(model.apply({'params': params},
                                 mel.transpose(0, 2, 1)))
    assert got.shape == (1, 13 * 256)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_melgan_inference_pads_and_crops():
    import jax
    from forwardtacotron_tpu.models.vocoder import MelGANGenerator

    model = MelGANGenerator(base_channels=64)
    mel = np.random.RandomState(3).randn(1, 9, 80).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), mel)
    wav = model.apply(variables, mel, method=model.inference)
    assert wav.shape == (1, 9 * 256)


def test_hifigan_checkpoint_roundtrip(tmp_path):
    """torch.save'd {'generator': state_dict} loads via load_hifigan."""
    from forwardtacotron_tpu.utils.vocoder_checkpoints import load_hifigan

    cfg = dict(upsample_initial_channel=32, resblock_kernel_sizes=(3,),
               resblock_dilation_sizes=((1, 3, 5),))
    oracle = TorchHiFiGAN(**cfg).eval()
    path = tmp_path / 'g_02500000'
    torch.save({'generator': oracle.state_dict()}, str(path))

    model, variables = load_hifigan(str(path), config=cfg)
    mel = np.random.RandomState(4).randn(1, 80, 11).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(mel)).squeeze(1).numpy()
    got = np.asarray(model.apply(variables, mel.transpose(0, 2, 1)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_gen_forward_cli_neural_vocoder(tmp_path):
    """gen_forward.py with --vocoder_checkpoint writes a .wav vocoded by the
    on-device HiFi-GAN generator (instead of the reference's mel export)."""
    import json
    import os
    import subprocess
    import sys
    from pathlib import Path

    import jax
    import yaml

    from forwardtacotron_tpu.models.registry import init_tts_model
    from forwardtacotron_tpu.utils.checkpoints import save_checkpoint

    repo = Path(__file__).resolve().parent.parent
    config = yaml.safe_load(
        (repo / 'tests' / 'resources' / 'test_config.yaml').read_text())
    model = init_tts_model(config)
    x = np.zeros((1, 8), np.int64)
    mel = np.zeros((1, 16, config['dsp']['num_mels']), np.float32)
    variables = model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        {'x': x, 'mel': mel, 'dur': np.ones((1, 8), np.float32),
         'pitch': np.zeros((1, 8), np.float32),
         'energy': np.zeros((1, 8), np.float32),
         'x_len': np.array([8]), 'mel_len': np.array([16])}, train=False)
    ckpt = tmp_path / 'latest_model.ckpt'
    save_checkpoint(ckpt, variables, config, step=1000)

    voc_cfg = dict(upsample_rates=[8, 8, 2, 2],
                   upsample_kernel_sizes=[16, 16, 4, 4],
                   upsample_initial_channel=32,
                   resblock_kernel_sizes=[3],
                   resblock_dilation_sizes=[[1, 3, 5]],
                   num_mels=config['dsp']['num_mels'])
    oracle = TorchHiFiGAN(**{k: tuple(v) if isinstance(v, list) else v
                             for k, v in voc_cfg.items()})
    voc_path = tmp_path / 'g_tiny'
    torch.save({'generator': oracle.state_dict()}, str(voc_path))
    voc_cfg_path = tmp_path / 'config.json'
    voc_cfg_path.write_text(json.dumps(voc_cfg))

    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env.pop('PYTHONPATH', None)
    env['PYTHONPATH'] = str(repo)
    out_dir = tmp_path / 'out'
    result = subprocess.run(
        [sys.executable, 'gen_forward.py', '--checkpoint', str(ckpt),
         '--input_text', 'aeio stra', '--output', str(out_dir),
         '--vocoder_checkpoint', str(voc_path),
         '--vocoder_config', str(voc_cfg_path), 'hifigan'],
        cwd=str(repo), env=env, capture_output=True, text=True, timeout=900)
    assert result.returncode == 0, result.stderr[-4000:]
    wavs = list(out_dir.glob('*.wav'))
    assert len(wavs) == 1 and wavs[0].stat().st_size > 1000
    assert not list(out_dir.glob('*.npy'))  # vocoded, not exported


@pytest.mark.parametrize('poly', [True, False])
@pytest.mark.parametrize('k,s,p', [(16, 8, 4), (4, 2, 1), (8, 4, 2)])
def test_polyphase_matches_input_dilated(k, s, p, poly):
    """Both transposed-conv formulations (polyphase and input-dilated) equal
    torch.ConvTranspose1d for every upsampler geometry in these models."""
    import jax

    from forwardtacotron_tpu.models import vocoder as vocoder_mod
    from forwardtacotron_tpu.models.vocoder import TransposedConv1d

    rs = np.random.RandomState(0)
    x = rs.randn(2, 11, 6).astype(np.float32)
    m = TransposedConv1d(features=5, kernel_size=k, stride=s, padding=p)
    variables = m.init(jax.random.PRNGKey(0), x)
    old = vocoder_mod.POLYPHASE
    try:
        vocoder_mod.POLYPHASE = poly
        got = np.asarray(m.apply(variables, x))
    finally:
        vocoder_mod.POLYPHASE = old

    kern = np.asarray(variables['params']['kernel'])  # pre-flipped [K,I,O]
    tconv = tnn.ConvTranspose1d(6, 5, k, s, padding=p)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(
            np.ascontiguousarray(kern[::-1].transpose(1, 2, 0))))
        tconv.bias.copy_(torch.from_numpy(
            np.asarray(variables['params']['bias'])))
        want = tconv(torch.from_numpy(x.transpose(0, 2, 1))).numpy()
    np.testing.assert_allclose(got, want.transpose(0, 2, 1),
                               atol=1e-5, rtol=1e-5)


def test_generate_routed_with_vocoder():
    """vocoder= hook in generate_routed: each frame-bucket group is vocoded
    at its own static length; outputs carry 'wav' (padded to the batch max)
    and 'wav_len' = mel_len * hop, and each request's wav equals vocoding
    its own bucket-cropped mel directly."""
    import jax
    import yaml
    from pathlib import Path

    from forwardtacotron_tpu.models.registry import init_tts_model
    from forwardtacotron_tpu.models.synthesis import (JittedVocoder,
                                                      TTSInference)
    from forwardtacotron_tpu.models.vocoder import HiFiGANGenerator

    repo = Path(__file__).resolve().parent.parent
    config = yaml.safe_load(
        (repo / 'tests' / 'resources' / 'test_config.yaml').read_text())
    model = init_tts_model(config)
    rs = np.random.RandomState(3)
    b, n = 3, 9
    x = rs.randint(1, 100, (b, n)).astype(np.int64)
    batch = {'x': x,
             'dur': np.full((b, n), 3.0, np.float32),
             'mel_len': np.full((b,), 3 * n, np.int64),
             'pitch': rs.randn(b, n).astype(np.float32),
             'energy': rs.rand(b, n).astype(np.float32),
             'mel': np.zeros((b, 3 * n, config['dsp']['num_mels']),
                             np.float32)}
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           batch, train=False)
    inf = TTSInference(model, variables, multispeaker=False)

    import jax.numpy as jnp
    orig_predict = inf._predict
    scale = jnp.asarray([[0.5], [1.5], [4.0]])

    def scaled_predict(v, xq, alpha):
        out = dict(orig_predict(v, xq, alpha))
        out['dur'] = out['dur'] * scale[:xq.shape[0]]
        return out

    inf._predict = scaled_predict

    voc_model = HiFiGANGenerator.from_config(
        dict(upsample_rates=[4, 2], upsample_kernel_sizes=[8, 4],
             upsample_initial_channel=16, resblock_kernel_sizes=[3],
             resblock_dilation_sizes=[[1, 2]], resblock='2',
             num_mels=config['dsp']['num_mels']))
    voc_vars = voc_model.init(
        jax.random.PRNGKey(1),
        np.zeros((1, 8, config['dsp']['num_mels']), np.float32))
    vocoder = JittedVocoder(voc_model, voc_vars, dtype='float32')
    assert vocoder.hop_length == 8

    out = inf.generate_routed(x, frame_bucket=16, vocoder=vocoder)
    lens = np.asarray(out['mel_len'])
    buckets = [int(-(-max(int(v), 1) // 16)) * 16 for v in lens]
    assert len(set(buckets)) > 1, 'requests must span multiple buckets'
    assert out['wav'].shape == (b, max(buckets) * 8)
    np.testing.assert_array_equal(np.asarray(out['wav_len']), lens * 8)
    wav = np.asarray(out['wav'])
    assert np.isfinite(wav).all()
    mel_post = np.asarray(out['mel_post'])
    for i in range(b):
        direct = np.asarray(vocoder(
            jnp.asarray(mel_post[i:i + 1, :buckets[i]])))[0]
        np.testing.assert_allclose(wav[i, :buckets[i] * 8], direct,
                                   rtol=0, atol=1e-5, err_msg=f'wav[{i}]')


def test_weight_norm_fold_matches_torch():
    from forwardtacotron_tpu.utils.vocoder_checkpoints import \
        fold_weight_norm

    conv = _wn(tnn.Conv1d(8, 16, 5))
    sd = {f'c.{k}': v.numpy() for k, v in conv.state_dict().items()}
    folded = fold_weight_norm(sd)
    with torch.no_grad():
        want = tnn.utils.remove_weight_norm(conv).weight.numpy()
    np.testing.assert_allclose(folded['c.weight'], want, atol=1e-6)
