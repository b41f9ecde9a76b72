"""Per-stage roofline of HiFi-GAN generation on the chip.

Times truncated generators (conv_pre only, then +up_i/resblocks_i
prefixes) and diffs successive prefixes to attribute time per upsample
level, then relates each level to its analytic FLOPs / HBM-bytes floors.
The hypothesis being tested (VERDICT r2): the LOW-channel late stages are
HBM-bound (conv AI = k*C/2 FLOP/byte vs the v5e ridge of 240), while the
early 256/512-channel stages are MXU-bound.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SR, HOP = 22050, 256
BATCH, FRAMES = 64, 512


def chained(dispatch, x0, n=10):
    import jax.numpy as jnp

    def run(k):
        xi = x0
        t0 = time.time()
        for _ in range(k):
            y = dispatch(xi)
            xi = x0 + (y.ravel()[0] * 0).astype(x0.dtype)
        float(jnp.sum(y.astype(jnp.float32).ravel()[:1]))
        return time.time() - t0

    run(2)
    t_small, t_big = run(3), run(n)
    return (t_big - t_small) / (n - 3)


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from forwardtacotron_tpu.models.vocoder import HiFiGANGenerator
    from forwardtacotron_tpu.utils.flops import chip_spec

    only = sys.argv[1:]

    def prefix(g, mel, levels):
        """HiFiGAN prefix: conv_pre + first `levels` upsample+MRF levels."""
        num_kernels = len(g.resblock_kernel_sizes)
        x = g.conv_pre(mel.astype(g.dtype))
        for i in range(levels):
            x = g.ups[i](nn.leaky_relu(x, 0.1))
            if g._mrf_fusable(x.shape[-1]):
                x = g._mrf_fused(x, i)
            else:
                xs = g.resblocks[i * num_kernels](x)
                for j in range(1, num_kernels):
                    xs = xs + g.resblocks[i * num_kernels + j](x)
                x = xs / num_kernels
        return x

    gen = HiFiGANGenerator(dtype=jnp.bfloat16)
    rs = np.random.RandomState(0)
    mel = jnp.asarray(rs.randn(BATCH, FRAMES, 80), jnp.bfloat16)
    variables = gen.init(jax.random.PRNGKey(0),
                         np.zeros((1, 8, 80), np.float32))

    spec = chip_spec()
    audio_s = BATCH * FRAMES * HOP / SR

    # analytic per-level FLOPs / bytes (bf16): transposed conv counts the
    # polyphase-effective taps ceil(k/s) (the conv unit skips stuffed zeros);
    # bytes = each conv boundary read+written once
    chans = [512, 256, 128, 64, 32]
    rates = [1, 8, 64, 128, 256]       # positions per input frame
    n_pos = [FRAMES * r * BATCH for r in rates]
    lvl_flops, lvl_bytes = [], []
    krs = gen.resblock_kernel_sizes
    for i, (u, k) in enumerate(zip(gen.upsample_rates,
                                   gen.upsample_kernel_sizes)):
        cin, cout = chans[i], chans[i + 1]
        pos = n_pos[i + 1]
        up_f = 2 * (-(-k // u)) * cin * cout * pos
        res_f = sum(6 * 2 * kr * cout * cout for kr in krs) * pos
        lvl_flops.append(up_f + res_f)
        # up: read in (pos/u * cin), write out; res: 18 convs + MRF sums
        n_convs = 6 * len(krs)
        lvl_bytes.append(2 * (pos // u * cin + pos * cout
                              + n_convs * 2 * pos * cout))

    prev_ms = None
    rows = []
    for levels in range(5):
        fn = jax.jit(lambda m, lv=levels: gen.apply(
            variables, m, lv, method=prefix))
        s = chained(fn, mel)
        ms = s * 1e3
        if prev_ms is not None:
            i = levels - 1
            d = ms - prev_ms
            comp = lvl_flops[i] / spec.flops_bf16 * 1e3
            band = lvl_bytes[i] / spec.hbm_gbps * 1e3
            sol = max(comp, band)
            mfu = lvl_flops[i] / (d / 1e3) / spec.flops_bf16 if d > 0 else 0
            hbm = lvl_bytes[i] / (d / 1e3) / spec.hbm_gbps if d > 0 else 0
            rows.append((f'level{i} ch{chans[i+1]}', d, lvl_flops[i],
                         lvl_bytes[i], mfu, hbm, sol,
                         'compute' if comp >= band else 'bytes'))
        else:
            rows.append(('conv_pre', ms, 0, 0, 0, 0, 0, '-'))
        prev_ms = ms
        print(f'prefix levels={levels}: {ms:8.2f} ms', flush=True)

    print()
    print(f'chip {spec.name}; batch {BATCH} x {FRAMES} frames '
          f'= {audio_s:.0f} audio-s/dispatch')
    print(f'{"stage":16s} {"ms":>8s} {"GFLOP":>8s} {"GB":>6s} '
          f'{"MFU":>6s} {"HBM":>6s} {"SoL ms":>7s} bound')
    for name, d, fl, by, mfu, hbm, sol, bound in rows:
        print(f'{name:16s} {d:8.2f} {fl/1e9:8.1f} {by/1e9:6.2f} '
              f'{mfu:6.1%} {hbm:6.1%} {sol:7.2f} {bound}')


if __name__ == '__main__':
    main()
