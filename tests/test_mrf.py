"""Fused HiFi-GAN MRF Pallas kernel (ops/pallas/mrf.py) parity vs the
per-conv flax path — kernel-level (vs an average of ResBlock1 branches)
and generator-level (forcing the fused path; interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from forwardtacotron_tpu.models.vocoder import HiFiGANGenerator, ResBlock1
from forwardtacotron_tpu.ops.pallas.mrf import mrf_pallas, pack_conv_weight

KRS, DILS = (3, 7, 11), (1, 3, 5)


def _pack(vars_per_kr):
    weights = []
    for v in vars_per_kr:
        p = v['params']
        for group in ('convs1', 'convs2'):
            weights.append(jnp.stack(
                [pack_conv_weight(p[f'{group}_{u}']['conv']['kernel'])
                 for u in range(3)]))
            weights.append(jnp.stack(
                [p[f'{group}_{u}']['conv']['bias']
                 for u in range(3)])[:, :, None])
    return tuple(weights)


def test_mrf_kernel_matches_resblock_average():
    rs = np.random.RandomState(0)
    c, t, b = 32, 300, 2
    blocks = [ResBlock1(c, kr, DILS) for kr in KRS]
    x = jnp.asarray(rs.randn(b, t, c).astype(np.float32) * 0.5)
    vs = [blk.init(jax.random.PRNGKey(i), x)
          for i, blk in enumerate(blocks)]
    ref = sum(blk.apply(v, x) for blk, v in zip(blocks, vs)) / len(blocks)

    got = mrf_pallas(jnp.swapaxes(x, 1, 2), _pack(vs), KRS, DILS,
                     t_tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(got, 1, 2)),
                               np.asarray(ref), rtol=0, atol=2e-5)


def test_mrf_kernel_multi_tile_and_edges():
    """Tile halos and sequence-boundary zero-padding: a length that spans
    several tiles with a ragged final tile must match exactly."""
    rs = np.random.RandomState(1)
    c, t, b = 16, 413, 1
    blocks = [ResBlock1(c, kr, DILS) for kr in KRS]
    x = jnp.asarray(rs.randn(b, t, c).astype(np.float32))
    vs = [blk.init(jax.random.PRNGKey(10 + i), x)
          for i, blk in enumerate(blocks)]
    ref = sum(blk.apply(v, x) for blk, v in zip(blocks, vs)) / len(blocks)
    got = mrf_pallas(jnp.swapaxes(x, 1, 2), _pack(vs), KRS, DILS,
                     t_tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(got, 1, 2)),
                               np.asarray(ref), rtol=0, atol=2e-5)


def test_generator_channels_major_tail_matches_unfused(monkeypatch):
    """Full generator with the channels-major tail forced on (interpret on
    CPU via FTT_PALLAS_INTERPRET) vs the reference op order: polyphase
    upsampler GEMM + in-layout fused MRF + channels-major conv_post."""
    monkeypatch.setenv('FTT_PALLAS_INTERPRET', '1')
    cfg = dict(upsample_rates=(4, 2, 2), upsample_kernel_sizes=(8, 4, 4),
               upsample_initial_channel=64, num_mels=8)
    gen_tail = HiFiGANGenerator(fuse_tail_max_ch=32, **cfg)
    gen_plain = HiFiGANGenerator(fuse_tail_max_ch=0, **cfg)
    rs = np.random.RandomState(5)
    mel = jnp.asarray(rs.randn(2, 33, 8).astype(np.float32))
    variables = gen_plain.init(jax.random.PRNGKey(0), mel)

    calls = []
    orig = HiFiGANGenerator._up_cm

    def spy(self, x, level):
        calls.append(level)
        return orig(self, x, level)

    monkeypatch.setattr(HiFiGANGenerator, '_up_cm', spy)
    ref = gen_plain.apply(variables, mel)
    assert calls == []
    got = gen_tail.apply(variables, mel)
    # channels: 64 -> 32, 16, 8; threshold 32 -> levels 0..2? ch after
    # level0 = 32 <= 32, so the tail covers all three levels
    assert calls == [0, 1, 2]
    assert got.shape == ref.shape == (2, 33 * 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=3e-5)


def test_generator_fused_path_matches_unfused(monkeypatch):
    """Full HiFiGANGenerator with the fused MRF forced on (interpret on
    CPU) vs fuse_mrf_max_ch=0. gen_fused must carry a nonzero threshold —
    both generators defaulting to 0 once made this test compare the
    unfused path against itself (ADVICE r3)."""
    cfg = dict(upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
               upsample_initial_channel=32, num_mels=8)
    gen_fused = HiFiGANGenerator(fuse_mrf_max_ch=64, **cfg)
    gen_plain = HiFiGANGenerator(fuse_mrf_max_ch=0, **cfg)
    rs = np.random.RandomState(2)
    mel = jnp.asarray(rs.randn(2, 40, 8).astype(np.float32))
    variables = gen_plain.init(jax.random.PRNGKey(0), mel)

    # bypass only the TPU-backend gate; keep the threshold logic live so
    # gen_plain (threshold 0) stays on the per-conv path
    monkeypatch.setattr(HiFiGANGenerator, '_mrf_fusable',
                        lambda self, ch: not self.is_initializing()
                        and 0 < ch <= self.fuse_mrf_max_ch)
    fused_calls = []
    orig_fused = HiFiGANGenerator._mrf_fused

    def spy(self, x, level):
        fused_calls.append(level)
        return orig_fused(self, x, level)

    monkeypatch.setattr(HiFiGANGenerator, '_mrf_fused', spy)
    ref = gen_plain.apply(variables, mel)
    assert fused_calls == []          # plain generator never fused
    got = gen_fused.apply(variables, mel)
    assert fused_calls == [0, 1]      # both low-channel levels fused
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=2e-5)


def test_phase_stacked_ups_tail_matches_reference_order(monkeypatch):
    """The phase-stacked fused-upsample tail (ups_mrf_pallas — ships OFF:
    quiet-chip A/B measured 365 vs 234 ms end-to-end on v5e, see the
    vocoder docstring) matches the reference op order, including
    multi-tile halos."""
    monkeypatch.setenv('FTT_PALLAS_INTERPRET', '1')
    import jax
    import jax.numpy as jnp
    from forwardtacotron_tpu.models.vocoder import HiFiGANGenerator

    kw = dict(resblock='1', upsample_rates=(8, 8, 2, 2),
              upsample_kernel_sizes=(16, 16, 4, 4),
              upsample_initial_channel=128,
              resblock_kernel_sizes=(3, 7, 11),
              resblock_dilation_sizes=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
              num_mels=20)
    ref_m = HiFiGANGenerator(**kw, fuse_ups_tail_max_ch=0)
    # ch per level: 64, 32, 16, 8 -> max_ch=16 engages at level 2 with
    # level-2 input T = 24*64 = 1536 lanes = multiple kernel tiles
    ps_m = HiFiGANGenerator(**kw, fuse_ups_tail_max_ch=16)

    rs = np.random.RandomState(0)
    mel = jnp.asarray(rs.randn(1, 24, 20).astype(np.float32))
    v = ref_m.init(jax.random.PRNGKey(0), mel)
    a = np.asarray(ref_m.apply(v, mel))
    b = np.asarray(ps_m.apply(v, mel))
    assert a.shape == b.shape == (1, 24 * 256)
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)


def test_phase_stacked_tail_two_levels(monkeypatch):
    """Both tail levels fused (s_in=1 then s_in=2), bf16 params."""
    monkeypatch.setenv('FTT_PALLAS_INTERPRET', '1')
    import jax
    import jax.numpy as jnp
    from forwardtacotron_tpu.models.vocoder import HiFiGANGenerator

    kw = dict(resblock='1', upsample_rates=(2, 2),
              upsample_kernel_sizes=(4, 4),
              upsample_initial_channel=128,
              resblock_kernel_sizes=(3, 7, 11),
              resblock_dilation_sizes=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
              num_mels=20)
    ref_m = HiFiGANGenerator(**kw, fuse_ups_tail_max_ch=0)
    ps_m = HiFiGANGenerator(**kw, fuse_ups_tail_max_ch=64)

    rs = np.random.RandomState(3)
    mel = jnp.asarray(rs.randn(2, 24, 20).astype(np.float32))
    v = ref_m.init(jax.random.PRNGKey(0), mel)
    a = np.asarray(ref_m.apply(v, mel))
    b = np.asarray(ps_m.apply(v, mel))
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)

    vb = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), v)
    mb = mel.astype(jnp.bfloat16)
    ab = np.asarray(HiFiGANGenerator(**kw, dtype=jnp.bfloat16,
                                     fuse_ups_tail_max_ch=0)
                    .apply(vb, mb)).astype(np.float32)
    bb = np.asarray(HiFiGANGenerator(**kw, dtype=jnp.bfloat16,
                                     fuse_ups_tail_max_ch=64)
                    .apply(vb, mb)).astype(np.float32)
    np.testing.assert_allclose(bb, ab, rtol=0.1, atol=0.05)
