"""A/B: interleaved two-half-tile LSTM+mel kernel vs the shipped kernel.

Hypothesis: the fused serving trunk's LSTM kernel (ops/pallas/rnn.py
`_lstm_mel_kernel`) serializes MXU gate GEMMs against VPU gate math — the
per-step chain is gx -> gh -> sigmoid/tanh glue -> mel dot, and the
recurrent dependency means the MXU idles during the VPU work and vice
versa. Splitting the batch tile into two halves with SEPARATE hidden/cell
scratch buffers breaks the false dependency between the halves: half B's
hidden GEMM (which only needs half B's state from the previous step) is
emitted before half A's VPU gate math, so Mosaic's scheduler can overlap
them. Emission order per step:

    gx (full tile, one GEMM)  ->  ghA  ->  ghB
    -> vpuA (overlaps ghB's MXU time) -> melA
    -> vpuB (overlaps melA)           -> melB

Run on a QUIET chip (no concurrent benches — pooled-tenant lesson from
STATUS round 5). Prints median-of-N ms for both variants at the serving
trunk shapes (B=4096, T=256, I=512, H=512, mel 80->128).

MEASURED RESULT (v5e, quiet chip, 2026-08-22) — REJECTED:

    base BB=256: 53.74 ms  [53.53, 53.74, 53.98]
    base BB=128: 54.44 ms  [54.37, 54.44, 55.30]
    ilv  BB=128: 56.84 ms  [56.36, 56.84, 56.89]   (BB=256 ilv: scoped-VMEM
                                                    OOM, 17.15M / 16M)

At equal tile size the interleaved emission order loses ~4.4%: Mosaic does
not reorder/overlap the half-B hidden GEMM with the half-A VPU gate math,
so the split only fragments the GEMMs (M=128 -> 64). The decisive context:
the SHIPPED kernel already runs at ~85% MFU here — analytic compute floor
T*B*2*(I*4H + H*4H + H*128)*2 = 9.07 TFLOP -> 46.0 ms at 197 bf16 TFLOP/s
vs 53.7 ms measured — so there was at most ~15% of non-MXU time to hide in
the first place. The serving trunk's recurrent kernel is effectively at
speed of light; further serving gains must come from other stages.
"""

import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from forwardtacotron_tpu.ops.pallas.rnn import _lstm_mel_kernel, _run

import os

B, T, I, H, MELP = 4096, 256, 512, 512, 128
BB = int(os.environ.get('ILV_BB', '256'))
if os.environ.get('ILV_SMALL'):  # CPU interpret-mode parity check
    B, T, BB = 32, 8, 32
G = 4 * H
INTERP = bool(os.environ.get('FTT_PALLAS_INTERPRET'))


def _lstm_mel_ilv_kernel(x_ref, wi_ref, wh_ref, b_ref, wm_ref, out_ref,
                         h0_scr, c0_scr, h1_scr, c1_scr):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        for s in (h0_scr, c0_scr, h1_scr, c1_scr):
            s[...] = jnp.zeros(s.shape, s.dtype)

    x_t = x_ref[0]                                   # [2, BB, I]
    dims = (((2,), (1,)), ((0,), (0,)))
    bias = b_ref[...][:, None, :].astype(jnp.float32)

    hd = h0_scr.shape[-1]
    half = h0_scr.shape[1]

    h_a = h0_scr[...]
    h_b = h1_scr[...]
    # all step-t GEMMs issued before any VPU gate math: ghB/gxB have no
    # dependency on half A's update, so they can run while vpuA executes
    gx_a = jax.lax.dot_general(x_t[:, :half], wi_ref[...], dims,
                               preferred_element_type=jnp.float32)
    gh_a = jax.lax.dot_general(h_a, wh_ref[...], dims,
                               preferred_element_type=jnp.float32)
    gx_b = jax.lax.dot_general(x_t[:, half:], wi_ref[...], dims,
                               preferred_element_type=jnp.float32)
    gh_b = jax.lax.dot_general(h_b, wh_ref[...], dims,
                               preferred_element_type=jnp.float32)

    def vpu(gates, c_prev):
        i = jax.nn.sigmoid(gates[..., :hd])
        f = jax.nn.sigmoid(gates[..., hd:2 * hd])
        g = jnp.tanh(gates[..., 2 * hd:3 * hd])
        o = jax.nn.sigmoid(gates[..., 3 * hd:])
        c = f * c_prev.astype(jnp.float32) + i * g
        return o * jnp.tanh(c), c

    h_new_a, c_a = vpu(gx_a + gh_a + bias, c0_scr[...])
    h0_scr[...] = h_new_a.astype(h0_scr.dtype)
    c0_scr[...] = c_a.astype(c0_scr.dtype)
    mel_a = jax.lax.dot_general(h_new_a.astype(wm_ref.dtype), wm_ref[...],
                                dims, preferred_element_type=jnp.float32)

    h_new_b, c_b = vpu(gx_b + gh_b + bias, c1_scr[...])
    h1_scr[...] = h_new_b.astype(h1_scr.dtype)
    c1_scr[...] = c_b.astype(c1_scr.dtype)
    mel_b = jax.lax.dot_general(h_new_b.astype(wm_ref.dtype), wm_ref[...],
                                dims, preferred_element_type=jnp.float32)

    out_ref[0, :, :half] = mel_a.astype(out_ref.dtype)
    out_ref[0, :, half:] = mel_b.astype(out_ref.dtype)


def run_variant(kernel, x2, wi, wh, bias, wm, n_state_pairs, bb):
    dtype = x2.dtype
    if n_state_pairs == 1:
        fn = jax.jit(lambda xx: _run(_lstm_mel_kernel, (xx, wi, wh, bias, wm),
                                     T, B, bb, H, dtype, 2, INTERP,
                                     out_dim=MELP))
    else:
        half = bb // 2
        scratch = [pltpu.VMEM((2, half, H), dtype) for _ in range(4)]
        fn = jax.jit(lambda xx: _run(kernel, (xx, wi, wh, bias, wm),
                                     T, B, bb, H, dtype, 0, INTERP,
                                     scratch=scratch, out_dim=MELP))
    return fn


def time_fn(fn, x0, n=10, warm=2):
    def chain(y):
        # force sequential dependency without touching the big buffer
        return x0 + (y[0, 0, 0, 0] * 0).astype(x0.dtype)

    def run(k):
        xi = x0
        t0 = time.time()
        for _ in range(k):
            y = fn(xi)
            xi = chain(y)
        float(jnp.sum(y.astype(jnp.float32).ravel()[:1]))
        return time.time() - t0

    run(warm)
    t_small, t_big = run(4), run(n + 4)
    return (t_big - t_small) / n * 1000


def main():
    rs = np.random.RandomState(0)
    dtype = jnp.bfloat16
    x2 = jnp.asarray(rs.randn(T, 2, B, I) * 0.1, dtype)
    wi = jnp.asarray(rs.randn(2, I, G) * 0.04, dtype)
    wh = jnp.asarray(rs.randn(2, H, G) * 0.04, dtype)
    bias = jnp.asarray(rs.randn(2, G) * 0.04, dtype)
    wm = jnp.asarray(rs.randn(2, H, MELP) * 0.04, dtype)

    base_bb = (32 if os.environ.get('ILV_SMALL')
               else int(os.environ.get('ILV_BASE_BB', '256')))
    base = run_variant(None, x2, wi, wh, bias, wm, 1, base_bb)
    ilv = run_variant(_lstm_mel_ilv_kernel, x2, wi, wh, bias, wm, 2, BB)

    y0 = np.asarray(base(x2), np.float32)
    y1 = np.asarray(ilv(x2), np.float32)
    err = np.max(np.abs(y0 - y1))
    print(f'parity max abs err: {err:.3e}')
    assert err < 1e-2, 'interleaved kernel diverges from baseline'

    trials = {'base': [], 'ilv': []}
    for _ in range(3):
        trials['base'].append(time_fn(base, x2))
        trials['ilv'].append(time_fn(ilv, x2))
    for k, v in trials.items():
        v = sorted(v)
        print(f'{k}: median {v[len(v)//2]:.2f} ms  trials '
              f'{[round(t, 2) for t in v]}')


if __name__ == '__main__':
    main()
