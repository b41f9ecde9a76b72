"""End-to-end CLI integration: preprocess -> train_tacotron (teacher +
duration extraction + pitch/energy targets) -> train_forward -> gen_forward,
on a tiny synthetic dataset through the real command-line surface."""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

REPO = Path(__file__).resolve().parent.parent
CONFIG_PATH = REPO / 'tests' / 'resources' / 'test_config.yaml'


def _make_dataset(root: Path, n_items=6, sr=22050):
    """Synthetic 'speech': harmonic tones with envelopes + metadata.csv."""
    wav_dir = root / 'wavs'
    wav_dir.mkdir(parents=True)
    rs = np.random.RandomState(0)
    lines = []
    phon = 'aeioust rlmn'
    for i in range(n_items):
        n_sec = 0.4 + 0.15 * i
        t = np.arange(int(sr * n_sec)) / sr
        f0 = 120 + 30 * (i % 3)
        wav = np.zeros_like(t, dtype=np.float32)
        for h in (1, 2, 3):
            wav += np.sin(2 * np.pi * f0 * h * t).astype(np.float32) / h
        env = 0.3 * (0.6 + 0.4 * np.sin(2 * np.pi * 2.5 * t))
        wav = (wav * env).astype(np.float32)
        from scipy.io import wavfile
        wavfile.write(str(wav_dir / f'item{i:03d}.wav'), sr,
                      (wav * 32767).astype(np.int16))
        n_char = 4 + i
        text = ''.join(rs.choice(list(phon)) for _ in range(n_char)).strip()
        text = text if len(text) >= 2 else 'ae'
        lines.append(f'item{i:03d}|{text}')
    (root / 'metadata.csv').write_text('\n'.join(lines), encoding='utf-8')
    return root


def _run(cmd, cwd, env):
    result = subprocess.run([sys.executable] + cmd, cwd=str(cwd), env=env,
                            capture_output=True, text=True, timeout=900)
    if result.returncode != 0:
        raise AssertionError(
            f'command {cmd} failed:\nSTDOUT:\n{result.stdout[-4000:]}\n'
            f'STDERR:\n{result.stderr[-4000:]}')
    return result


@pytest.mark.slow
def test_full_pipeline(tmp_path):
    dataset = _make_dataset(tmp_path / 'dataset')

    config = yaml.safe_load(CONFIG_PATH.read_text())
    config['data_path'] = str(tmp_path / 'data')
    config['checkpoint_path'] = str(tmp_path / 'ckpt')
    config['preprocessing']['n_val'] = 2
    config_path = tmp_path / 'config.yaml'
    config_path.write_text(yaml.dump(config))

    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env.pop('PYTHONPATH', None)  # drop the axon sitecustomize (forces TPU)
    env['PYTHONPATH'] = str(REPO)

    # 1. preprocess
    _run(['preprocess.py', '--path', str(dataset), '--config',
          str(config_path), '--num_workers', '0'], REPO, env)
    data = tmp_path / 'data'
    n_mels = len(list((data / 'mel').glob('*.npy')))
    assert n_mels == 6
    assert len(list((data / 'raw_pitch').glob('*.npy'))) == 6
    assert len(list((data / 'speaker_emb').glob('*.npy'))) == 6
    assert (data / 'train_dataset.pkl').is_file()

    # 2. teacher + alignment extraction
    _run(['train_tacotron.py', '--config', str(config_path)], REPO, env)
    assert len(list((data / 'alg').glob('*.npy'))) == 6
    assert len(list((data / 'att_pred').glob('*.npy'))) == 6
    assert len(list((data / 'phon_pitch').glob('*.npy'))) == 6
    assert len(list((data / 'phon_energy').glob('*.npy'))) == 6
    assert (data / 'duration_stats.pkl').is_file()
    taco_ckpt = tmp_path / 'ckpt' / 'test_tts.tacotron' / 'latest_model.ckpt'
    assert taco_ckpt.is_file()
    # durations must sum to mel lengths
    for alg in (data / 'alg').glob('*.npy'):
        dur = np.load(alg)
        mel = np.load(data / 'mel' / alg.name)
        assert dur.sum() == mel.shape[-1]

    # 3. forward model training
    _run(['train_forward.py', '--config', str(config_path)], REPO, env)
    fwd_ckpt = tmp_path / 'ckpt' / 'test_tts.forward' / 'latest_model.ckpt'
    assert fwd_ckpt.is_file()

    # 4. GTA export
    _run(['train_forward.py', '--config', str(config_path), '--force_gta'],
         REPO, env)
    assert len(list((data / 'gta').glob('*.npy'))) == 6

    # 5. synthesis via gen_forward (griffinlim + hifigan export)
    out_dir = tmp_path / 'out'
    _run(['gen_forward.py', '--checkpoint', str(fwd_ckpt),
          '--input_text', 'aeio stra', '--output', str(out_dir),
          'griffinlim'], REPO, env)
    wavs = list(out_dir.glob('*.wav'))
    assert len(wavs) == 1 and wavs[0].stat().st_size > 1000

    _run(['gen_forward.py', '--checkpoint', str(fwd_ckpt),
          '--input_text', 'aeio stra', '--output', str(out_dir),
          'hifigan'], REPO, env)
    npys = list(out_dir.glob('*.npy'))
    assert len(npys) == 1
    mel = np.load(npys[0])
    assert mel.shape[0] == config['dsp']['num_mels']
