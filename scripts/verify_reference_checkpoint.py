"""Armed gate for the published-checkpoint allclose target (BASELINE.md).

The north-star parity gate is: converted published weights
(`forward_step90k.pt` / `thorsten_fastpitch_50k.pt`,
/root/reference/README.md:145-146) must produce mels allclose to the
reference PyTorch implementation on real sentences. This environment has
zero egress, so the checkpoints cannot be downloaded here — this script is
the gate ARMED: the moment a checkpoint file appears on disk it converts,
validates the tree, runs BOTH implementations and asserts allclose.

Usage:
  python scripts/verify_reference_checkpoint.py [checkpoint.pt ...]

With no args it searches the default locations (repo root, ./checkpoints,
~/checkpoints) for the two published filenames. Exit codes:
  0 = gate ran and PASSED for every checkpoint found
  1 = gate ran and FAILED (mismatch)
  2 = skipped: no checkpoint present (prints how to supply one)

Converter expectations (key names / shapes) are documented and pinned in
tests/resources/reference_state_dict_schema.json — regenerate with
`python scripts/dump_reference_schema.py` (see that script's docstring).
"""

import sys
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
            for name in PUBLISHED:
                p = d / name
                if p.is_file():
                    found.append(p)
    return found


def verify(path: Path) -> bool:
    """Convert `path`, drive reference torch + TPU build on SENTENCES,
    assert mel allclose. Returns True on pass."""
    import jax
    import torch

    sys.path.insert(0, '/root/reference')
    from models.forward_tacotron import ForwardTacotron as TorchForward
    from models.fast_pitch import FastPitch as TorchFastPitch

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

    # reference model (the oracle)
    torch_cls = {'forward_tacotron': TorchForward,
                 'fast_pitch': TorchFastPitch}[tts_model]
    torch_model = torch_cls.from_config(config)
    torch_model.load_state_dict(ckpt['model'], strict=True)
    torch_model.eval()

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
    ref_vars = model.init({'params': jax.random.PRNGKey(0),
                           'dropout': jax.random.PRNGKey(1)},
                          init_batch, train=False)
    validate_against(variables, ref_vars)
    print('   converted tree validates against model.init structure')
    inference = TTSInference(model, variables, multispeaker=False,
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
            ref_out = torch_model.generate(x)
        ref_mel = ref_out['mel_post'].squeeze(0).numpy()  # [n_mels, T]

        out = inference.generate_cropped(np.asarray(ids, np.int64))
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


def main():
    paths = [Path(p) for p in sys.argv[1:]] or find_checkpoints()
    paths = [p for p in paths if p.is_file()]
    if not paths:
        print('SKIPPED: no published checkpoint found. To run the real '
              'parity gate, place one of:')
        for name, src in PUBLISHED.items():
            print(f'  {name}   <- {src}')
        print(f'into one of: {", ".join(str(d) for d in SEARCH_DIRS)}')
        print('then re-run: python scripts/verify_reference_checkpoint.py')
        return 2
    ok = all([verify(p) for p in paths])
    print('GATE PASSED' if ok else 'GATE FAILED')
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main())
