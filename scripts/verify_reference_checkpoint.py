"""Armed gate for the published-checkpoint allclose target (BASELINE.md).

The north-star parity gate is: converted published weights
(`forward_step90k.pt` / `thorsten_fastpitch_50k.pt`,
/root/reference/README.md:145-146) must produce mels allclose to the
reference PyTorch implementation on real sentences. This environment has
zero egress, so the checkpoints cannot be downloaded here — this script is
the gate ARMED: the moment a checkpoint file appears on disk it converts,
validates the tree, runs BOTH implementations and asserts allclose.

The gate dispatches on checkpoint CONTENT, so any reference-format .pt is
verified, not just the two published names:
  * student acoustic models — all four families (forward_tacotron,
    fast_pitch, multi_forward_tacotron, multi_fast_pitch; multispeaker
    checkpoints use their embedded speaker table, reference
    gen_forward.py:50-57)
  * the Tacotron teacher (taco_step*.pt) — teacher-forced forward parity
  * vocoder generators — HiFi-GAN (official 'generator' format, with a
    config.json beside the file or the v1 default) and MelGAN
    (seungwonpark 'model_g' format)

Usage:
  python scripts/verify_reference_checkpoint.py [checkpoint.pt ...]
  python scripts/verify_reference_checkpoint.py --watch [interval_s]

With no args it searches the default locations (repo root, ./checkpoints,
~/checkpoints) for ANY .pt file. ``--watch`` polls those directories and
verifies each new/changed .pt the moment it appears (no operator action
beyond dropping the file). Exit codes:
  0 = gate ran and PASSED for every checkpoint found
  1 = gate ran and FAILED (mismatch)
  2 = skipped: no checkpoint present (prints how to supply one)

Converter expectations (key names / shapes) are documented and pinned in
tests/resources/reference_state_dict_schema.json — regenerate with
`python scripts/dump_reference_schema.py` (see that script's docstring).
"""

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

PUBLISHED = {
    'forward_step90k.pt':
        'https://github.com/as-ideas/ForwardTacotron/releases '
        '(tag v3.1, LJSpeech ForwardTacotron, 90k steps)',
    'thorsten_fastpitch_50k.pt':
        'https://github.com/as-ideas/ForwardTacotron/releases '
        '(tag v3.1, Thorsten German FastPitch, 50k steps)',
}
SEARCH_DIRS = [REPO, REPO / 'checkpoints', Path.home() / 'checkpoints']

SENTENCES = [
    'The quick brown fox jumps over the lazy dog.',
    'Scientists at the CERN laboratory say they have discovered a new '
    'particle.',
    'In a hole in the ground there lived a hobbit.',
]

# fallback when espeak is unavailable: pre-phonemized IPA of the above —
# both implementations consume the SAME token ids, so the parity
# comparison is unchanged (phonemization quality is not what's gated here)
SENTENCES_IPA = [
    'ðə kwɪk bɹaʊn fɑks dʒʌmps oʊvɚ ðə leɪzi dɔɡ.',
    'saɪəntɪsts æt ðə sɝn læbɹətɔɹi seɪ ðeɪ hæv dɪskʌvɚd ə nu pɑɹtɪkəl.',
    'ɪn ə hoʊl ɪn ðə ɡɹaʊnd ðɛɹ lɪvd ə hɑbɪt.',
]


def find_checkpoints():
    found = []
    for d in SEARCH_DIRS:
        if d.is_dir():
            for p in sorted(d.glob('*.pt')):
                if p.is_file():
                    found.append(p)
    return found


def classify(path: Path) -> str:
    """Dispatch on checkpoint content: 'student' | 'teacher' | 'hifigan' |
    'melgan' | 'load-error' | 'unknown'. 'load-error' means the file could
    not be torch.load-ed at all (corrupt/truncated) — distinct from a
    readable-but-unrecognized format so the gate can fail loudly on it."""
    import torch
    try:
        ckpt = torch.load(str(path), map_location='cpu', weights_only=False)
    except Exception:
        return 'load-error'
    if not isinstance(ckpt, dict):
        return 'unknown'
    if 'model_g' in ckpt:
        return 'melgan'
    if 'generator' in ckpt:
        return 'hifigan'
    state = ckpt.get('model')
    if isinstance(state, dict):
        if any(k.startswith('decoder.attn_rnn') for k in state):
            return 'teacher'
        if 'config' in ckpt:
            return 'student'
    # bare HiFi-GAN generator state dicts (some releases save them flat)
    if all(hasattr(v, 'shape') for v in ckpt.values()) \
            and any(k.startswith('ups.') for k in ckpt):
        return 'hifigan'
    return 'unknown'


def verify(path: Path) -> bool:
    """Convert `path`, drive reference torch + TPU build on SENTENCES,
    assert mel allclose. Returns True on pass."""
    import jax
    import torch

    sys.path.insert(0, '/root/reference')
    from models.fast_pitch import FastPitch as TorchFastPitch
    from models.forward_tacotron import ForwardTacotron as TorchForward
    from models.multi_fast_pitch import MultiFastPitch as TorchMultiFP
    from models.multi_forward_tacotron import \
        MultiForwardTacotron as TorchMultiFT

    from forwardtacotron_tpu.models.registry import init_tts_model
    from forwardtacotron_tpu.models.synthesis import TTSInference
    from forwardtacotron_tpu.text.cleaners import Cleaner
    from forwardtacotron_tpu.text.tokenizer import Tokenizer
    from forwardtacotron_tpu.utils.convert import (convert_state_dict,
                                                   load_torch_checkpoint,
                                                   validate_against)

    print(f'== {path}')
    ckpt = load_torch_checkpoint(str(path))
    config = ckpt['config']
    tts_model = config.get('tts_model', 'forward_tacotron')
    multispeaker = tts_model.startswith('multi_')

    # reference model (the oracle)
    torch_cls = {'forward_tacotron': TorchForward,
                 'fast_pitch': TorchFastPitch,
                 'multi_forward_tacotron': TorchMultiFT,
                 'multi_fast_pitch': TorchMultiFP}[tts_model]
    torch_model = torch_cls.from_config(config)
    torch_model.load_state_dict(ckpt['model'], strict=True)
    torch_model.eval()

    speaker_emb = None
    if multispeaker:
        table = ckpt.get('speaker_embeddings') or {}
        if table:
            name = sorted(table)[0]
            speaker_emb = np.asarray(table[name], np.float32)
            print(f'   multispeaker: using embedded speaker {name!r}')
        else:
            dims = config[tts_model]['model']['speaker_emb_dims']
            speaker_emb = np.zeros(dims, np.float32)
            print('   multispeaker: no embedded table; zero embedding')

    # TPU build with converted weights
    model = init_tts_model(config)
    variables, aux = convert_state_dict(ckpt['model'])
    n_tok = 16
    init_batch = {
        'x': np.ones((1, n_tok), np.int64),
        'dur': np.ones((1, n_tok), np.float32),
        'mel_len': np.array([2 * n_tok]),
        'pitch': np.zeros((1, n_tok), np.float32),
        'energy': np.zeros((1, n_tok), np.float32),
        'mel': np.zeros((1, 2 * n_tok, config['dsp']['num_mels']),
                        np.float32)}
    if multispeaker:
        init_batch['speaker_emb'] = speaker_emb[None, :]
        init_batch['pitch_cond'] = np.ones((1, n_tok), np.int64)
    ref_vars = model.init({'params': jax.random.PRNGKey(0),
                           'dropout': jax.random.PRNGKey(1)},
                          init_batch, train=False)
    validate_against(variables, ref_vars)
    print('   converted tree validates against model.init structure')
    inference = TTSInference(model, variables, multispeaker=multispeaker,
                             dtype='float32')

    tok = Tokenizer()
    try:
        cleaner = Cleaner.from_config(config)
        sentences = [cleaner(s) for s in SENTENCES]
    except RuntimeError:
        print('   (espeak unavailable: using pre-phonemized IPA sentences)')
        sentences = SENTENCES_IPA
    ok = True
    for sent in sentences:
        ids = tok(sent)
        x = torch.tensor(ids).long().unsqueeze(0)
        with torch.no_grad():
            if multispeaker:
                ref_out = torch_model.generate(
                    x, speaker_emb=torch.tensor(speaker_emb)[None, :])
            else:
                ref_out = torch_model.generate(x)
        ref_mel = ref_out['mel_post'].squeeze(0).numpy()  # [n_mels, T]

        kwargs = {'speaker_emb': speaker_emb[None, :]} if multispeaker else {}
        out = inference.generate_cropped(np.asarray(ids, np.int64), **kwargs)
        # compare the UNcropped frame count first: cropping before the
        # length check would hide over-generation (ADVICE r3)
        t_got = out['mel_post'].shape[1]
        len_match = t_got == ref_mel.shape[1]
        got_mel = out['mel_post'][:, :ref_mel.shape[1]]
        t = min(got_mel.shape[1], ref_mel.shape[1])
        mae = float(np.abs(got_mel[:, :t] - ref_mel[:, :t]).mean())
        close = np.allclose(got_mel[:, :t], ref_mel[:, :t], atol=1e-3)
        status = 'PASS' if (close and len_match) else 'FAIL'
        if status == 'FAIL':
            ok = False
        print(f'   [{status}] "{sent[:40]}..." mel MAE {mae:.2e} '
              f'T ref={ref_mel.shape[1]} got={t_got}')
    return ok


def verify_teacher(path: Path) -> bool:
    """Teacher (Tacotron) checkpoint: teacher-forced forward parity vs the
    reference torch model in eval mode (deterministic — the always-on
    PreNet dropout quirk only applies when duration extraction forces
    train mode, reference train_tacotron.py:120)."""
    import torch

    sys.path.insert(0, '/root/reference')
    from models.tacotron import Tacotron as TorchTaco

    from forwardtacotron_tpu.models.tacotron import Tacotron
    from forwardtacotron_tpu.utils.convert import (convert_state_dict,
                                                   load_torch_checkpoint)

    print(f'== {path} (teacher)')
    ckpt = load_torch_checkpoint(str(path))
    config = ckpt['config']
    torch_model = TorchTaco.from_config(config)
    torch_model.load_state_dict(ckpt['model'], strict=True)
    torch_model.eval()
    r = int(torch_model.r) or 1

    jax_model = Tacotron.from_config(config)
    variables, aux = convert_state_dict(ckpt['model'])

    rs = np.random.RandomState(0)
    b, n, steps = 2, 12, 8
    t = r * steps
    n_mels = config['dsp']['num_mels']
    x = rs.randint(1, 100, (b, n)).astype(np.int64)
    mel = (rs.randn(b, t, n_mels) - 4.0).astype(np.float32)

    torch_model.r = r
    with torch.no_grad():
        ref_mel, ref_lin, ref_attn = torch_model(
            {'x': torch.tensor(x),
             'mel': torch.tensor(mel.transpose(0, 2, 1)),
             'speaker_emb': torch.zeros(b, 1)})
    got_mel, got_lin, got_attn = jax_model.apply(
        variables, {'x': x, 'mel': mel, 'speaker_emb': None}, r=r,
        train=False)

    mel_mae = float(np.abs(np.asarray(got_mel).transpose(0, 2, 1)
                           - ref_mel.numpy()).mean())
    attn_mae = float(np.abs(np.asarray(got_attn) - ref_attn.numpy()).mean())
    ok = (np.allclose(np.asarray(got_mel).transpose(0, 2, 1),
                      ref_mel.numpy(), rtol=1e-3, atol=1e-3)
          and np.allclose(np.asarray(got_attn), ref_attn.numpy(),
                          rtol=1e-3, atol=1e-4))
    print(f'   [{"PASS" if ok else "FAIL"}] teacher-forced fwd r={r} '
          f'mel MAE {mel_mae:.2e} attn MAE {attn_mae:.2e}')
    return ok


def verify_vocoder(path: Path, kind: str) -> bool:
    """Vocoder generator checkpoint (HiFi-GAN official / seungwonpark
    MelGAN): load through utils/vocoder_checkpoints and assert waveform
    parity vs a torch oracle of the published architecture running the
    SAME weights."""
    import importlib.util
    import json

    import torch

    from forwardtacotron_tpu.utils.vocoder_checkpoints import (load_hifigan,
                                                               load_melgan)

    # load the torch oracles by file path: 'tests' as a package name is
    # shadowed by /root/reference/tests once the reference is on sys.path
    spec = importlib.util.spec_from_file_location(
        '_vocoder_oracles', REPO / 'tests' / 'test_vocoder.py')
    oracles = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(oracles)
    TorchHiFiGAN, TorchMelGAN = oracles.TorchHiFiGAN, oracles.TorchMelGAN

    print(f'== {path} ({kind})')
    rs = np.random.RandomState(0)
    mel = rs.randn(1, 77, 80).astype(np.float32) * 0.5 - 4.0

    if kind == 'hifigan':
        cfg_path = path.parent / 'config.json'
        config = json.loads(cfg_path.read_text()) if cfg_path.is_file() \
            else None
        model, variables = load_hifigan(str(path), config=config)
        oracle_cfg = {k: v for k, v in (config or {}).items()
                      if k in ('resblock', 'upsample_rates',
                               'upsample_kernel_sizes',
                               'upsample_initial_channel',
                               'resblock_kernel_sizes',
                               'resblock_dilation_sizes')}
        oracle = TorchHiFiGAN(**oracle_cfg)
        ckpt = torch.load(str(path), map_location='cpu', weights_only=False)
        state = ckpt.get('generator', ckpt)
    else:
        model, variables = load_melgan(str(path))
        oracle = TorchMelGAN()
        ckpt = torch.load(str(path), map_location='cpu', weights_only=False)
        state = ckpt['model_g']
    oracle.load_state_dict(state, strict=True)
    oracle.eval()
    if hasattr(oracle, 'remove_weight_norm'):
        oracle.remove_weight_norm()

    with torch.no_grad():
        want = oracle(torch.tensor(mel.transpose(0, 2, 1))).numpy()
    got = np.asarray(model.apply(variables, np.asarray(mel)))
    want = want.reshape(got.shape)
    mae = float(np.abs(got - want).mean())
    ok = np.allclose(got, want, rtol=1e-3, atol=1e-3)
    print(f'   [{"PASS" if ok else "FAIL"}] waveform MAE {mae:.2e} '
          f'({got.shape[-1]} samples)')
    return ok


def verify_any(path: Path) -> bool:
    kind = classify(path)
    if kind == 'student':
        return verify(path)
    if kind == 'teacher':
        return verify_teacher(path)
    if kind in ('hifigan', 'melgan'):
        return verify_vocoder(path, kind)
    if kind == 'load-error':
        # A corrupt/truncated .pt must fail the gate, not silently pass —
        # especially a partial copy of one of the PUBLISHED files.
        print(f'== {path}: torch.load failed (corrupt or truncated '
              'checkpoint) — gate failure')
        return False
    print(f'== {path}: unrecognized checkpoint format (skipping)')
    return True


def watch(interval: float) -> int:
    """Poll SEARCH_DIRS; verify every new or changed .pt as it appears."""
    print(f'watching {", ".join(str(d) for d in SEARCH_DIRS)} '
          f'every {interval:g}s — drop a .pt to verify it')
    seen = {}
    while True:
        for p in find_checkpoints():
            try:
                mtime = p.stat().st_mtime
            except OSError:
                continue
            if seen.get(p) == mtime:
                continue
            # wait until the file stops growing (partial copy guard);
            # the file may vanish mid-copy (delete/rename) — skip, it
            # will be picked up again when it reappears
            try:
                size = -1
                while size != p.stat().st_size:
                    size = p.stat().st_size
                    time.sleep(1.0)
                seen[p] = p.stat().st_mtime
            except OSError:
                continue
            try:
                ok = verify_any(p)
            except Exception as e:
                print(f'== {p}: verification error: {e}')
                ok = False
            print('GATE PASSED' if ok else 'GATE FAILED', f'for {p}')
        time.sleep(interval)


def main():
    # Parity gate runs on the CPU backend: the torch oracle is CPU f32, and
    # the TPU relay's default matmul precision (bf16-class accumulation on
    # f32 inputs) adds ~1e-3 noise that would mask/flag nothing useful.
    # NOTE env JAX_PLATFORMS=cpu is NOT enough in this container — the
    # preloaded TPU plugin wins; only jax.config.update before the first
    # computation works.
    import jax
    jax.config.update('jax_platforms', 'cpu')

    args = sys.argv[1:]
    if args and args[0] == '--watch':
        return watch(float(args[1]) if len(args) > 1 else 30.0)
    paths = [Path(p) for p in args] or find_checkpoints()
    paths = [p for p in paths if p.is_file()]
    if not paths:
        print('SKIPPED: no published checkpoint found. To run the real '
              'parity gate, place one of:')
        for name, src in PUBLISHED.items():
            print(f'  {name}   <- {src}')
        print(f'into one of: {", ".join(str(d) for d in SEARCH_DIRS)} '
              '(any reference-format .pt works: student acoustic models, '
              'taco_step*.pt teachers, HiFi-GAN/MelGAN generators), or run '
              'with --watch to verify files the moment they appear')
        return 2
    ok = all([verify_any(p) for p in paths])
    print('GATE PASSED' if ok else 'GATE FAILED')
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main())
