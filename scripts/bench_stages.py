"""Per-stage timing of the fused bf16 serving path at a given batch size.

Stages: token-level (series predictors + prenet + fused multi-GRU),
length regulator, frame-rate BiLSTM + lin, postnet CBHG + projection.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timeit(fn, *args, n=5):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.time() - t0) / n)
    return best * 1000


def main():
    import jax
    import jax.numpy as jnp

    from forwardtacotron_tpu.models.registry import init_tts_model
    from forwardtacotron_tpu.models.synthesis import _jit_serving
    from forwardtacotron_tpu.ops.length_regulator import (
        expanded_lengths, length_regulator_auto)
    from forwardtacotron_tpu.utils.files import read_config

    config = read_config('configs/singlespeaker.yaml')
    model = init_tts_model(config)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n_tok, max_len = 81, 256
    rs = np.random.RandomState(0)
    x = rs.randint(1, 130, (B, n_tok)).astype(np.int64)

    init_batch = {
        'x': x[:1], 'dur': np.full((1, n_tok), 3.0, np.float32),
        'mel_len': np.array([3 * n_tok]),
        'pitch': np.zeros((1, n_tok), np.float32),
        'energy': np.zeros((1, n_tok), np.float32),
        'mel': np.zeros((1, 3 * n_tok, 80), np.float32),
    }
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           init_batch, train=False)
    bf16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                        if a.dtype == jnp.float32 else a, variables)

    def token_stage(m, x):
        from forwardtacotron_tpu.models.layers import multi_bigru
        dur_feat = m.dur_pred.features(x)
        pitch_feat = m.pitch_pred.features(x)
        energy_feat = m.energy_pred.features(x)
        pre_feat = m.prenet.pre_rnn(m.embedding(x))
        dur_rnn, pitch_rnn, energy_rnn, pre_out = multi_bigru([
            (dur_feat, None, m.dur_pred.rnn.dir_params(), m.durpred_rnn_dims),
            (pitch_feat, None, m.pitch_pred.rnn.dir_params(), m.pitch_rnn_dims),
            (energy_feat, None, m.energy_pred.rnn.dir_params(), m.energy_rnn_dims),
            (pre_feat, None, m.prenet.rnn.dir_params(), m.prenet_dims),
        ])
        dur = m.dur_pred.head(dur_rnn, 1.0)[..., 0]
        pitch = m.pitch_pred.head(pitch_rnn)[..., 0]
        energy = m.energy_pred.head(energy_rnn)[..., 0]
        h = pre_out + m.pitch_proj(pitch[:, :, None]) * m.pitch_strength
        h = h + m.energy_proj(energy[:, :, None]) * m.energy_strength
        return h, dur

    tok_fn = _jit_serving(
        lambda v, x: model.apply(v, x, method=token_stage))
    h, dur = tok_fn(bf16, x)
    jax.block_until_ready(h)
    t_tok = timeit(lambda v, x: tok_fn(v, x), bf16, x)

    lr_fn = jax.jit(lambda h, d: length_regulator_auto(h, d, max_len=max_len))
    t_lr = timeit(lr_fn, h, dur)
    hx = lr_fn(h, dur)
    lens = jax.jit(expanded_lengths)(dur)

    lstm_fn = _jit_serving(lambda v, hx, lens: model.apply(
        v, hx, lens, method=lambda m, hx, lens: m.lin(
            m.lstm(hx, lengths=lens))))
    t_lstm = timeit(lstm_fn, bf16, hx, lens)
    mel = lstm_fn(bf16, hx, lens)

    post_fn = _jit_serving(lambda v, mel, lens: model.apply(
        v, mel, lens, method=lambda m, mel, lens: m.post_proj(
            m.postnet(mel, lengths=lens))))
    t_post = timeit(post_fn, bf16, mel, lens)

    full_fn = _jit_serving(lambda v, x: model.apply(
        v, x, max_len, 1.0, method=type(model).generate_combined))
    t_full = timeit(lambda v, x: full_fn(v, x)['mel_post'], bf16, x)

    print(f'B={B}: token={t_tok:.1f}ms  LR={t_lr:.1f}ms  '
          f'lstm+lin={t_lstm:.1f}ms  postnet={t_post:.1f}ms  '
          f'full={t_full:.1f}ms  (sum={t_tok+t_lr+t_lstm+t_post:.1f})')


if __name__ == '__main__':
    main()
