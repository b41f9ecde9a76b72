"""Per-stage serving roofline: measured ms vs analytic FLOPs/bytes floors.

For every stage of the ForwardTacotron serving dispatch (batch 4096, bf16,
N=86 tokens, T=256 frames) this measures the stage in isolation (chained
dispatches, one readback — the pooled-relay-safe methodology of
bench_readback_sanity.py) and relates it to:

  * compute floor = stage FLOPs / chip bf16 peak
  * bytes floor   = stage HBM traffic estimate / chip HBM peak
  * SoL = max(floors); gap = measured / SoL; MFU, HBM util

Run with stage names as argv to bound per-process memory, e.g.
  python scripts/bench_stage_roofline.py series prenet
  python scripts/bench_stage_roofline.py lr lstm lin post proj
Each run appends rows to /tmp/stage_roofline.jsonl; run with 'table' to
print the merged table.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BATCH, MAX_LEN, N_TOKENS = 4096, 256, 86
OUT = Path('/tmp/stage_roofline.jsonl')


def chained_ms(dispatch, chain_in, x0, n=12, warm=2):
    import jax.numpy as jnp

    def run(k):
        xi = x0
        t0 = time.time()
        for _ in range(k):
            y = dispatch(xi)
            xi = chain_in(x0, y)
        float(jnp.sum(y.astype(jnp.float32).ravel()[:1]))
        return time.time() - t0

    run(warm)
    t_small, t_big = run(4), run(n)
    return (t_big - t_small) / (n - 4) * 1000


def print_table():
    from forwardtacotron_tpu.utils.flops import chip_spec
    rows = [json.loads(line) for line in OUT.read_text().splitlines()]
    latest = {}
    for r in rows:
        latest[r['stage']] = r
    spec = chip_spec()
    print(f'chip {spec.name}: peak {spec.flops_bf16/1e12:.0f} TFLOP/s bf16, '
          f'{spec.hbm_gbps/1e9:.0f} GB/s HBM')
    hdr = (f'{"stage":20s} {"ms":>8s} {"GFLOP":>8s} {"GB":>6s} '
           f'{"MFU":>6s} {"HBM":>6s} {"SoL ms":>7s} {"gap":>5s} bound')
    print(hdr)
    tot_ms = tot_flop = tot_bytes = tot_sol = 0.0
    for stage, r in latest.items():
        ms, fl, by = r['ms'], r['flops'], r['bytes']
        comp = fl / spec.flops_bf16 * 1e3
        band = by / spec.hbm_gbps * 1e3
        sol = max(comp, band)
        bound = 'compute' if comp >= band else 'bytes'
        mfu = fl / (ms / 1e3) / spec.flops_bf16
        hbm = by / (ms / 1e3) / spec.hbm_gbps
        tot_ms += ms
        tot_flop += fl
        tot_bytes += by
        tot_sol += sol
        print(f'{stage:20s} {ms:8.2f} {fl/1e9:8.1f} {by/1e9:6.2f} '
              f'{mfu:6.1%} {hbm:6.1%} {sol:7.2f} {ms/sol:5.1f} {bound}')
    mfu = tot_flop / (tot_ms / 1e3) / spec.flops_bf16
    hbm = tot_bytes / (tot_ms / 1e3) / spec.hbm_gbps
    print(f'{"TOTAL":20s} {tot_ms:8.2f} {tot_flop/1e9:8.1f} '
          f'{tot_bytes/1e9:6.2f} {mfu:6.1%} {hbm:6.1%} {tot_sol:7.2f} '
          f'{tot_ms/tot_sol:5.1f}')


def main():
    if sys.argv[1:] == ['table']:
        print_table()
        return

    import jax
    import jax.numpy as jnp

    from forwardtacotron_tpu.models.layers import CBHG, BiLSTM
    from forwardtacotron_tpu.models.registry import init_tts_model
    from forwardtacotron_tpu.models.synthesis import TTSInference
    from forwardtacotron_tpu.ops.pallas.rnn import pallas_rnns
    from forwardtacotron_tpu.utils.files import read_config
    from forwardtacotron_tpu.utils.flops import (
        forward_tacotron_stage_bytes, forward_tacotron_stage_flops)
    from flax import linen as nn

    config = read_config('configs/singlespeaker.yaml')
    mcfg = config['forward_tacotron']['model']
    n_mels = config['dsp']['num_mels']
    sflops = forward_tacotron_stage_flops(mcfg, BATCH, N_TOKENS, MAX_LEN,
                                          n_mels)
    sflops['length_regulator'] = 0.0
    sbytes = forward_tacotron_stage_bytes(mcfg, BATCH, N_TOKENS, MAX_LEN,
                                          n_mels)

    stages = set(sys.argv[1:]) or {'series', 'prenet', 'peproj', 'trunk',
                                   'post', 'proj'}
    rs = np.random.RandomState(0)
    chain2 = jax.jit(lambda x0, y: x0 + (y.ravel()[0] * 0).astype(x0.dtype))
    rows = []

    def record(stage, ms):
        row = {'stage': stage, 'ms': ms, 'flops': sflops[stage],
               'bytes': sbytes[stage]}
        rows.append(row)
        print(f'{stage:20s} {ms:8.2f} ms', flush=True)

    p = mcfg['prenet_dims']

    if 'series' in stages:
        model = init_tts_model(config)
        x = np.zeros((BATCH, N_TOKENS), np.int64)
        x[:, :] = rs.randint(1, 100, (BATCH, N_TOKENS))
        init_batch = {
            'x': x[:1], 'dur': np.ones((1, N_TOKENS), np.float32),
            'mel_len': np.array([N_TOKENS]),
            'pitch': np.zeros((1, N_TOKENS), np.float32),
            'energy': np.zeros((1, N_TOKENS), np.float32),
            'mel': np.zeros((1, N_TOKENS, n_mels), np.float32)}
        variables = model.init({'params': jax.random.PRNGKey(0),
                                'dropout': jax.random.PRNGKey(1)},
                               init_batch, train=False)
        inf = TTSInference(model, variables, multispeaker=False,
                           dtype='bfloat16')
        xd = jnp.asarray(x)
        ms = chained_ms(
            lambda xi: inf._predict(inf.variables, xi, 1.0)['dur'],
            jax.jit(lambda x0, y: x0 + (y[0, 0] * 0).astype(x0.dtype)), xd)
        record('series_predictors', ms)

    if 'prenet' in stages:
        tok = jnp.asarray(rs.randn(BATCH, N_TOKENS, 256), jnp.bfloat16)
        pre = CBHG(K=mcfg['prenet_k'], channels=p, proj_channels=[p, 256],
                   num_highways=4)
        prv = pre.init({'params': jax.random.PRNGKey(0)},
                       np.zeros((1, 8, 256), np.float32), train=False)
        prv = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                           if a.dtype == jnp.float32 else a, prv)

        def _pre(v, m):
            with pallas_rnns('on'):
                return pre.apply(v, m, train=False)
        fn = jax.jit(lambda m: _pre(prv, m))
        record('prenet_cbhg', chained_ms(fn, chain2, tok))

    if 'peproj' in stages:
        pitch = jnp.asarray(rs.randn(BATCH, N_TOKENS), jnp.bfloat16)
        conv = nn.Conv(2 * p, kernel_size=(3,), padding=[(1, 1)])
        cv = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16),
            conv.init(jax.random.PRNGKey(0),
                      np.zeros((1, 8, 1), np.float32)))
        fn = jax.jit(lambda pe: conv.apply(cv, pe[:, :, None])
                     + conv.apply(cv, pe[:, :, None]))
        record('pitch_energy_proj', chained_ms(fn, chain2, pitch))

    if 'lr' in stages:
        from forwardtacotron_tpu.ops.length_regulator import \
            length_regulator_auto
        tok_h = jnp.asarray(rs.randn(BATCH, N_TOKENS, 2 * p), jnp.bfloat16)
        dur = jnp.asarray(rs.uniform(1.0, 4.0, (BATCH, N_TOKENS)),
                          jnp.float32)
        fn = jax.jit(lambda h: length_regulator_auto(h, dur,
                                                     max_len=MAX_LEN))
        record('length_regulator', chained_ms(fn, chain2, tok_h))

    if 'lstm' in stages:
        h = jnp.asarray(rs.randn(BATCH, MAX_LEN, 2 * p), jnp.bfloat16)
        lstm = BiLSTM(mcfg['rnn_dims'])
        lv = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16),
            lstm.init(jax.random.PRNGKey(0),
                      np.zeros((1, 8, 2 * p), np.float32)))

        def _lstm(v, hh):
            with pallas_rnns('on'):
                return lstm.apply(v, hh)
        fn = jax.jit(lambda hh: _lstm(lv, hh))
        record('frame_bilstm', chained_ms(fn, chain2, h))

    if 'lin' in stages:
        h = jnp.asarray(rs.randn(BATCH, MAX_LEN, 2 * mcfg['rnn_dims']),
                        jnp.bfloat16)
        lin = nn.Dense(n_mels)
        lvv = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16),
            lin.init(jax.random.PRNGKey(0),
                     np.zeros((1, 2 * mcfg['rnn_dims']), np.float32)))
        fn = jax.jit(lambda hh: lin.apply(lvv, hh))
        record('mel_linear', chained_ms(fn, chain2, h))

    if 'post' in stages:
        mel = jnp.asarray(rs.randn(BATCH, MAX_LEN, n_mels), jnp.bfloat16)
        post = CBHG(K=mcfg['postnet_k'], channels=mcfg['postnet_dims'],
                    proj_channels=[mcfg['postnet_dims'], n_mels],
                    num_highways=4, dropout=0.0)
        pv = post.init({'params': jax.random.PRNGKey(0)},
                       np.zeros((1, 8, n_mels), np.float32), train=False)
        pv = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                          if a.dtype == jnp.float32 else a, pv)

        def _post(v, m):
            with pallas_rnns('on'):
                return post.apply(v, m, train=False)
        fn = jax.jit(lambda m: _post(pv, m))
        record('postnet_cbhg', chained_ms(fn, chain2, mel))

    if 'proj' in stages:
        h = jnp.asarray(rs.randn(BATCH, MAX_LEN, 2 * mcfg['postnet_dims']),
                        jnp.bfloat16)
        lin = nn.Dense(n_mels, use_bias=False)
        lvv = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16),
            lin.init(jax.random.PRNGKey(0),
                     np.zeros((1, 2 * mcfg['postnet_dims']), np.float32)))
        fn = jax.jit(lambda hh: lin.apply(lvv, hh))
        record('post_proj', chained_ms(fn, chain2, h))

    if 'trunk' in stages:
        # fused serving trunk (r4): LR + bi-LSTM + mel projection as two
        # Pallas kernels — replaces the length_regulator + frame_bilstm +
        # mel_linear rows of the table on the serving path
        from forwardtacotron_tpu.ops.pallas.rnn import lstm_lr_mel_pallas
        hdim = mcfg['rnn_dims']
        tok_h = jnp.asarray(rs.randn(BATCH, N_TOKENS, 2 * p), jnp.bfloat16)
        dur = jnp.asarray(
            rs.uniform(1.0, 4.0, (BATCH, N_TOKENS)), jnp.float32)

        def u16(*shape):
            return jnp.asarray(rs.uniform(-0.04, 0.04, shape),
                               jnp.bfloat16)
        fwdp = (u16(2 * p, 4 * hdim), u16(hdim, 4 * hdim),
                u16(4 * hdim), u16(4 * hdim))
        bwdp = (u16(2 * p, 4 * hdim), u16(hdim, 4 * hdim),
                u16(4 * hdim), u16(4 * hdim))
        wm, bm = u16(2 * hdim, n_mels), u16(n_mels)
        fn = jax.jit(lambda hh: lstm_lr_mel_pallas(
            hh, dur, fwdp, bwdp, hdim, wm, bm, MAX_LEN))
        sflops['fused_trunk'] = (sflops['frame_bilstm']
                                 + sflops['mel_linear'])
        sbytes['fused_trunk'] = (sbytes['length_regulator']
                                 + sbytes['mel_linear'])
        record('fused_trunk', chained_ms(fn, chain2, tok_h))

    with OUT.open('a') as f:
        for row in rows:
            f.write(json.dumps(row) + '\n')


if __name__ == '__main__':
    main()
