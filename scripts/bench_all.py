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
        out['serving_trials'] = d.get('trials_audio_s_per_s')
        out['mfu'] = d.get('mfu')
        out['text2wav'] = d.get('text2wav_audio_s_per_s')
        out['vs_baseline'] = d.get('vs_baseline')
    attempt('serving', serving)

    def train():
        r = run(['scripts/bench_train.py'], timeout=1500)
        m = re.findall(
            r'(\w+) bs=(\d+): median ([\d.]+) steps/s '
            r'\[([\d.]+), ([\d.]+)\]', r.stdout)
        vals = {}
        for prec, bs, med, lo, hi in m:
            vals[f'{prec}_bs{bs}'] = {
                'median': float(med), 'min': float(lo), 'max': float(hi)}
            if bs == '32':
                out[f'train_steps_s_{prec}'] = float(med)
        out['train'] = vals or None
        # headline: bf16 at the reference bs=32 (median)
        ref = vals.get('bfloat16_bs32') or vals.get('float32_bs32')
        out['train_steps_s'] = ref['median'] if ref else None
    attempt('train_steps_s', train)

    def taco():
        r = run(['scripts/bench_taco_train.py'], timeout=1500)
        m = re.findall(
            r'(\w+)\s+r=(\d+): median\s+([\d.]+) steps/s '
            r'\[min ([\d.]+), max ([\d.]+)', r.stdout)
        vals = {f'{prec}_r{rr}': {'median': float(v), 'min': float(lo),
                                  'max': float(hi)}
                for prec, rr, v, lo, hi in m}
        out['taco_train'] = vals or None
        f32r1 = vals.get('float32_r1')
        out['taco_train_steps_s'] = f32r1['median'] if f32r1 else None
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

    def serving_mix():
        r = run(['scripts/bench_serving_mix.py'], timeout=1500)
        m = re.search(r'routed mix: ([\d.]+) audio-s/s sustained', r.stdout)
        res = REPO / 'scripts' / 'results' / 'serving_mix.json'
        if m:
            out['serving_mix'] = float(m.group(1))
            if res.is_file():
                out['serving_mix_detail'] = json.loads(res.read_text())
    attempt('serving_mix', serving_mix)

    def longform():
        r = run(['scripts/bench_longform.py'], timeout=2400)
        res = REPO / 'scripts' / 'results' / 'longform.json'
        if res.is_file():
            out['longform'] = json.loads(res.read_text())
        elif r.returncode != 0:
            raise RuntimeError(r.stderr.strip().splitlines()[-1]
                               if r.stderr else 'longform failed')
    attempt('longform', longform)

    if errors:
        out['_errors'] = errors
    path = REPO / 'BENCH_ALL.json'
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == '__main__':
    main()
