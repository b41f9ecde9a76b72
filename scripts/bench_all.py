"""Machine-readable benchmark suite: one JSON dict for round-over-round
trend tracking (VERDICT r2 #9).

Runs each benchmark in its own subprocess (fresh HBM; a hung bench can't
take the suite down — every child runs under its own timeout) and collects:

  serving            audio-s/s/chip, mel-only routed serving (bench.py)
  text2wav           audio-s/s/chip incl. on-chip HiFi-GAN v1 (bench.py)
  mfu                serving model FLOP utilization (bench.py)
  train_steps_s      flagship bf16 train step rate (bench_train.py)
  taco_train_steps_s teacher train step rate, f32 r=1 (bench_taco_train.py)
  extraction_pass_s  LJSpeech-scale alignment pass estimate
                     (bench_extraction.py)
  dsp                {wav_to_mel, griffinlim} audio-s/s (bench_dsp.py)

Writes BENCH_ALL.json at the repo root and prints it. Individual failures
record null (with the error in '_errors') instead of failing the suite.
"""

import json
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run(cmd, timeout):
    return subprocess.run([sys.executable] + cmd, cwd=REPO,
                          capture_output=True, text=True, timeout=timeout)


def main():
    out = {}
    errors = {}

    def attempt(name, fn):
        try:
            fn()
        except Exception as e:  # noqa: BLE001 - record and continue
            errors[name] = f'{type(e).__name__}: {e}'[:300]
            out.setdefault(name, None)

    def serving():
        r = run(['bench.py'], timeout=1200)
        lines = [ln for ln in r.stdout.splitlines() if ln.startswith('{')]
        if not lines:
            raise RuntimeError(
                f'bench.py produced no JSON (rc={r.returncode}): '
                f'{r.stderr.strip().splitlines()[-1:] if r.stderr else ""}')
        d = json.loads(lines[-1])
        out['serving'] = d['value']
        out['mfu'] = d.get('mfu')
        out['text2wav'] = d.get('text2wav_audio_s_per_s')
        out['vs_baseline'] = d.get('vs_baseline')
    attempt('serving', serving)

    def train():
        r = run(['scripts/bench_train.py'], timeout=900)
        m = re.findall(r'(\w+): ([\d.]+) steps/s', r.stdout)
        for prec, val in m:
            out[f'train_steps_s_{prec}'] = float(val)
        out['train_steps_s'] = max((float(v) for _, v in m), default=None)
    attempt('train_steps_s', train)

    def taco():
        r = run(['scripts/bench_taco_train.py'], timeout=900)
        m = re.findall(r'(\w+)\s+r=(\d+):\s+([\d.]+) steps/s', r.stdout)
        vals = {f'{prec}_r{rr}': float(v) for prec, rr, v in m}
        out['taco_train'] = vals or None
        out['taco_train_steps_s'] = vals.get('float32_r1')
    attempt('taco_train_steps_s', taco)

    def extraction():
        r = run(['scripts/bench_extraction.py'], timeout=900)
        m = re.search(r'TOTAL \(A \+ B@16\): ~(\d+) s', r.stdout)
        out['extraction_pass_s'] = int(m.group(1)) if m else None
    attempt('extraction_pass_s', extraction)

    def dsp():
        r = run(['scripts/bench_dsp.py'], timeout=900)
        vals = {}
        for key, pat in (('wav_to_mel',
                          r'wav->log-mel\s+([\d.]+) audio-s/s'),
                         ('griffinlim',
                          r'griffinlim-32\s+([\d.]+) audio-s/s')):
            m = re.search(pat, r.stdout)
            if m:
                vals[key] = float(m.group(1).replace(',', ''))
        out['dsp'] = vals or None
    attempt('dsp', dsp)

    if errors:
        out['_errors'] = errors
    path = REPO / 'BENCH_ALL.json'
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == '__main__':
    main()
