"""Neural vocoders (HiFi-GAN / MelGAN generator inference) in JAX.

The reference only *exports* mels for external vocoders
(reference gen_forward.py:108-116: ``melgan`` saves a ``.mel`` tensor,
``hifigan`` saves a ``.npy``) and pulls a torch.hub MelGAN in
notebook_utils/synthesize.py:11-49. Here the generators themselves are
implemented TPU-natively so the full text->waveform path runs on-chip in one
program: both are pure conv stacks (transposed-conv upsamplers + dilated
residual blocks), which XLA maps straight onto the MXU — there is no
sequential state, so unlike the acoustic models no scan/Pallas treatment is
needed; fusion of the elementwise (leaky-relu/tanh/residual) glue is XLA's
job.

Architectures mirror the public checkpoint formats so released weights load:

- ``HiFiGANGenerator``: jik876/hifigan ``Generator`` — conv_pre(k=7) ->
  [ConvTranspose1d upsample -> mean of |kernel-sizes| dilated ResBlocks]* ->
  leaky_relu -> conv_post(k=7) -> tanh. ResBlock1 (two-conv residual units,
  dilations then 1) and ResBlock2 (single dilated conv units) both supported
  (config key ``resblock: '1'|'2'``).
- ``MelGANGenerator``: seungwonpark/melgan ``Generator`` — reflection-padded
  conv(k=7) -> 4x [leaky_relu -> ConvTranspose1d -> 3-layer dilated ResStack
  (3**i dilation, 1x1 shortcut convs)] -> leaky_relu -> reflection-padded
  conv(k=7) -> tanh, with the published -11.5129 10-frame mel tail pad in
  :meth:`MelGANGenerator.inference`.

Layout is channels-last [B, T, C] like the rest of this package; the torch
checkpoints' [C_out, C_in, K] / [C_in, C_out, K] weights are transposed (and
weight-norm folded) by utils/vocoder_checkpoints.py.
"""

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

PAD_VALUE = -11.5129

# Exact polyphase decomposition for the transposed-conv upsamplers (see
# TransposedConv1d). Module-level so benches can A/B the two formulations.
# Default OFF: measured on v5e, XLA's native base-dilated conv beats the
# polyphase rewrite (hifigan-v1 1888 vs 1779, melgan 4545 vs 3985
# audio-s/s/chip at batch 64 x 512 frames bf16) — the TPU conv unit skips
# the stuffed zeros itself, and the polyphase kernel scatter + depth-to-
# space reshape costs more than it saves. Kept (and exactness-tested) for
# backends without native input-dilation support.
POLYPHASE = False


def _same_pad(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2


class TransposedConv1d(nn.Module):
    """torch ``ConvTranspose1d(stride=s, padding=p)`` semantics, channels
    last. The parameter is stored pre-flipped ([K, C_in, C_out], flipped
    time) so the textbook formulation is one input-dilated conv (zero-stuff
    the input by ``stride``, pad ``k-1-p`` each side, correlate).

    When the geometry is the usual exact-upsampler case (``k - s == 2p``,
    true for every HiFi-GAN/MelGAN upsample layer), the call instead uses an
    exact polyphase (pixel-shuffle) decomposition: each of the ``s`` output
    phases only ever touches ``ceil(k/s)`` kernel taps, so the s phases are
    packed into ONE dense stride-1 conv producing ``s*features`` channels,
    followed by a depth-to-space reshape. Same sums term-for-term, but the
    MXU never multiplies by the stuffed zeros (~k/ceil(k/s) x fewer FLOPs,
    e.g. 16/2=8x for the stride-8 upsamplers) and the conv gets a wide,
    tile-friendly output channel dim."""
    features: int
    kernel_size: int
    stride: int
    padding: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (self.kernel_size, in_ch, self.features))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        k, s = self.kernel_size, self.stride
        pad = k - 1 - self.padding
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        if POLYPHASE and s > 1 and k - s == 2 * self.padding:
            return self._polyphase(x, kernel) + bias.astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1,), padding=[(pad, pad)],
            lhs_dilation=(s,), dimension_numbers=('NWC', 'WIO', 'NWC'))
        return y + bias.astype(self.dtype)

    def _polyphase(self, x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
        comb, dmin, dmax = polyphase_comb(kernel, self.kernel_size,
                                          self.stride, self.padding)
        y = jax.lax.conv_general_dilated(
            x, comb, window_strides=(1,), padding=[(-dmin, dmax)],
            dimension_numbers=('NWC', 'WIO', 'NWC'))
        return y.reshape(x.shape[0], x.shape[1] * self.stride, self.features)


def polyphase_comb(kernel: jnp.ndarray, k: int, s: int, padding: int):
    """Polyphase (pixel-shuffle) kernel for a ``ConvTranspose1d(k, s, p)``
    with the exact-upsampler geometry ``k - s == 2p``: a stride-1 conv
    kernel [taps, C_in, s*F] whose s*F outputs at step q are the s output
    phases y[q*s + r] (phase-major channel order), plus the (dmin, dmax)
    tap-offset range. Shared by the channels-last conv path and the
    channels-major GEMM path."""
    taps_k, in_ch, features = kernel.shape
    assert taps_k == k
    pad = k - 1 - padding
    # output sample t = q*s + r reads x[q + d_r + m] * kernel[j0_r + m*s]
    j0s = [(pad - r) % s for r in range(s)]
    ns = [-(-(k - j0) // s) for j0 in j0s]
    ds = [(r + j0 - pad) // s for r, j0 in zip(range(s), j0s)]
    dmin = min(ds)
    dmax = max(d + n - 1 for d, n in zip(ds, ns))
    taps = dmax - dmin + 1
    comb = jnp.zeros((taps, in_ch, s, features), kernel.dtype)
    for r in range(s):
        lo = ds[r] - dmin
        comb = comb.at[lo:lo + ns[r], :, r, :].set(kernel[j0s[r]::s])
    return comb.reshape(taps, in_ch, s * features), dmin, dmax


def _shift_cm(x: jnp.ndarray, delta: int) -> jnp.ndarray:
    """[B, C, T] -> same shape, out[..., t] = x[..., t + delta], zeros
    outside (torch conv zero-boundary semantics)."""
    t = x.shape[-1]
    if delta == 0:
        return x
    if delta > 0:
        return jnp.pad(x[:, :, delta:], ((0, 0), (0, 0), (0, delta)))
    return jnp.pad(x[:, :, :t + delta], ((0, 0), (0, 0), (-delta, 0)))


def _im2col_cm(x: jnp.ndarray, shifts) -> jnp.ndarray:
    """[B, C, T] -> [B, len(shifts)*C, T], rows j-major (the layout
    pack_conv_weight's [C_out, k*C_in] expects as GEMM K dim)."""
    return jnp.concatenate([_shift_cm(x, d) for d in shifts], axis=1)


class _Conv(nn.Module):
    """Conv1d with torch-style explicit symmetric padding and dilation."""
    features: int
    kernel_size: int
    dilation: int = 1
    padding: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv = nn.Conv(self.features, (self.kernel_size,),
                       padding=[(self.padding, self.padding)],
                       kernel_dilation=(self.dilation,), dtype=self.dtype,
                       name='conv')
        return conv(x)


class ResBlock1(nn.Module):
    """HiFi-GAN MRF unit, ``resblock: '1'``: per dilation d, a
    (leaky_relu -> dilated conv -> leaky_relu -> conv) residual pair."""
    channels: int
    kernel_size: int = 3
    dilation: Tuple[int, ...] = (1, 3, 5)
    dtype: Any = jnp.float32

    def setup(self):
        self.convs1 = [
            _Conv(self.channels, self.kernel_size, dilation=d,
                  padding=_same_pad(self.kernel_size, d), dtype=self.dtype)
            for d in self.dilation]
        self.convs2 = [
            _Conv(self.channels, self.kernel_size, dilation=1,
                  padding=_same_pad(self.kernel_size, 1), dtype=self.dtype)
            for _ in self.dilation]

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for c1, c2 in zip(self.convs1, self.convs2):
            xt = c1(nn.leaky_relu(x, 0.1))
            xt = c2(nn.leaky_relu(xt, 0.1))
            x = x + xt
        return x


class ResBlock2(nn.Module):
    """HiFi-GAN MRF unit, ``resblock: '2'``: per dilation d, a single
    (leaky_relu -> dilated conv) residual."""
    channels: int
    kernel_size: int = 3
    dilation: Tuple[int, ...] = (1, 3)
    dtype: Any = jnp.float32

    def setup(self):
        self.convs = [
            _Conv(self.channels, self.kernel_size, dilation=d,
                  padding=_same_pad(self.kernel_size, d), dtype=self.dtype)
            for d in self.dilation]

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for c in self.convs:
            x = x + c(nn.leaky_relu(x, 0.1))
        return x


class HiFiGANGenerator(nn.Module):
    """jik876/hifigan Generator (v1/v2/v3 configs via the attrs below).

    Input [B, T, n_mels] log-mel -> output [B, T*prod(upsample_rates)]
    waveform in [-1, 1]. The final leaky_relu uses torch's default 0.01
    slope (the official forward calls ``F.leaky_relu(x)`` bare there, unlike
    the 0.1 used elsewhere).
    """
    resblock: str = '1'
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = (
        (1, 3, 5), (1, 3, 5), (1, 3, 5))
    num_mels: int = 80
    dtype: Any = jnp.float32
    # Fuse a whole MRF level (18 convs) into ONE Pallas kernel with
    # channels-major [C, T] tiles (ops/pallas/mrf.py) for levels with <=
    # this many channels. Evaluated on v5e (batch 64, bf16): IN-LAYOUT the
    # kernel beats XLA's per-conv path at low channel counts (C=32: 76.7
    # vs 81.0 ms, C=64: 70.8 vs 85.8; C=128: 72.6 vs 59.1 — XLA wins), but
    # END-TO-END the required [B,T,C]<->[B,C,T] layout conversions cost
    # more than the kernel saves (level3 86.7 vs 62.7 ms, full hifigan-v1
    # 1553 vs 1888 audio-s/s), so the option defaults OFF. Making it pay
    # would need the whole low-channel tail (upsamplers + conv_post)
    # channels-major — future work, the kernel and its parity tests stay.
    fuse_mrf_max_ch: int = 0
    # Channels-major TAIL: once a level's channel count drops to <= this,
    # transpose ONCE to [B, C, T] and keep every remaining op channels-major
    # (polyphase upsampler as a phase-stacked GEMM, the fused MRF Pallas
    # kernel in its native layout). Built as the fix the r3 measurements
    # called for (in-layout MRF beat XLA at C<=64 but per-level transposes
    # ate the win) and MEASURED END-TO-END on v5e (batch 64 x 512 frames,
    # bf16, v1 config): 255 ms vs 208 ms for the reference op order — the
    # channels-major upsampler GEMM (14.4 vs 11.6 ms/level incl.
    # transposes) and the in-situ MRF kernels do NOT reproduce their
    # isolated wins at these shapes, so the tail ships OFF. (A
    # channels-major conv_post was 27.6 vs 6.6 ms and already reverted;
    # the remaining idea — the upsampler computed inside the MRF kernel's
    # input stage — is future work.) 0 disables (reference op order).
    fuse_tail_max_ch: int = 0
    # Round-5 attempt 3 — PHASE-STACKED tail: once a level's output channel
    # count drops to <= this, transpose once to [B, C, T] and run each
    # remaining level (leaky -> transposed-conv upsample -> whole MRF) as
    # ONE Pallas kernel in phase-stacked channels-major form
    # (ops/pallas/mrf.py ups_mrf_pallas): phase r of global sample s*t+r
    # is row block r at lane t, so the upsampler's interleave — the op
    # that killed the r4 tail — never materializes anywhere. One XLA
    # de-phase-stack reshape at the end feeds conv_post in the reference
    # layout. MEASURED END-TO-END on v5e (v1 config, bf16, QUIET chip,
    # median-of-4 + readback): 365 vs 234 ms at batch 64 x 512 frames and
    # 361 vs 169 ms at 128 x 256 — the phase-stacked kernel LOSES ~2x.
    # (An earlier same-process A/B read 366 vs 583 ms — a false win: the
    # reference run was inflated by three benches contending for the
    # pooled chip. Lesson recorded: A/B only on a quiet chip.) The per-
    # (phase, tap) GEMMs at M=C_out<=64 underuse the MXU and the s_out-x
    # GEMM dispatch count outweighs the interleave it avoids. Ships OFF
    # with parity tests (~2e-7 f32, tests/test_mrf.py), closing the
    # vocoder-tail line: all three formulations (per-level channels-major,
    # channels-major tail, phase-stacked fused-upsample tail) now have
    # measured rejections. 0 disables (the default).
    fuse_ups_tail_max_ch: int = 0

    @property
    def hop_length(self) -> int:
        out = 1
        for r in self.upsample_rates:
            out *= r
        return out

    def setup(self):
        self.conv_pre = _Conv(self.upsample_initial_channel, 7, padding=3,
                              dtype=self.dtype)
        block = ResBlock1 if self.resblock == '1' else ResBlock2
        ups, resblocks = [], []
        ch = self.upsample_initial_channel
        for u, k in zip(self.upsample_rates, self.upsample_kernel_sizes):
            ch //= 2
            ups.append(TransposedConv1d(ch, k, stride=u, padding=(k - u) // 2,
                                        dtype=self.dtype))
            for kr, dr in zip(self.resblock_kernel_sizes,
                              self.resblock_dilation_sizes):
                resblocks.append(block(ch, kr, tuple(dr), dtype=self.dtype))
        self.ups = ups
        self.resblocks = resblocks
        self.conv_post = _Conv(1, 7, padding=3, dtype=self.dtype)

    def _mrf_fusable(self, ch: int) -> bool:
        if self.resblock != '1' or self.is_initializing():
            return False
        if ch > self.fuse_mrf_max_ch or self.fuse_mrf_max_ch <= 0:
            return False
        dils = self.resblock_dilation_sizes
        if any(tuple(d) != tuple(dils[0]) for d in dils):
            return False
        from forwardtacotron_tpu.ops.pallas.mrf import HALO
        kr = max(self.resblock_kernel_sizes)
        span = sum(kr // 2 * d + kr // 2 for d in dils[0])
        if span > HALO:
            return False
        import jax
        return jax.default_backend() == 'tpu'

    def _mrf_fused_cm(self, x_cm: jnp.ndarray, level: int) -> jnp.ndarray:
        """The level's 3 ResBlock1 branches + average as one Pallas kernel
        on channels-major [B, C, T] (numerically equal to the per-conv path
        to f32 rounding)."""
        from forwardtacotron_tpu.ops.pallas.mrf import (mrf_pallas,
                                                        pack_conv_weight)
        num_kernels = len(self.resblock_kernel_sizes)
        weights = []
        for j in range(num_kernels):
            rb = self.resblocks[level * num_kernels + j]
            p1 = [m.variables['params']['conv'] for m in rb.convs1]
            p2 = [m.variables['params']['conv'] for m in rb.convs2]
            for ps in (p1, p2):
                weights.append(jnp.stack(
                    [pack_conv_weight(q['kernel']).astype(x_cm.dtype)
                     for q in ps]))
                weights.append(jnp.stack(
                    [q['bias'].astype(x_cm.dtype) for q in ps])[:, :, None])
        return mrf_pallas(x_cm, tuple(weights),
                          tuple(self.resblock_kernel_sizes),
                          tuple(self.resblock_dilation_sizes[0]),
                          im2col=True)

    def _mrf_fused(self, x: jnp.ndarray, level: int) -> jnp.ndarray:
        return jnp.swapaxes(
            self._mrf_fused_cm(jnp.swapaxes(x, 1, 2), level), 1, 2)

    def _tail_fusable(self, ch_out: int, level: int) -> bool:
        """True when this level and everything after it can run in the
        channels-major tail (see __call__)."""
        if self.fuse_tail_max_ch <= 0 or ch_out > self.fuse_tail_max_ch:
            return False
        if self.resblock != '1' or self.is_initializing():
            return False
        dils = self.resblock_dilation_sizes
        if any(tuple(d) != tuple(dils[0]) for d in dils):
            return False
        from forwardtacotron_tpu.ops.pallas.mrf import HALO
        kr = max(self.resblock_kernel_sizes)
        span = sum(kr // 2 * d + kr // 2 for d in dils[0])
        if span > HALO:
            return False
        # every remaining upsampler must have polyphase geometry
        for j in range(level, len(self.upsample_rates)):
            k, s = self.upsample_kernel_sizes[j], self.upsample_rates[j]
            if not (s > 1 and k - s == 2 * ((k - s) // 2)):
                return False
        import jax
        from forwardtacotron_tpu.ops.pallas.rnn import interpret_forced
        return jax.default_backend() == 'tpu' or interpret_forced()

    def _ups_tail_fusable(self, ch_out: int, level: int,
                          t_in: int) -> bool:
        """True when this level and everything after it can run in the
        phase-stacked fused-upsample tail."""
        if self.fuse_ups_tail_max_ch <= 0 \
                or ch_out > self.fuse_ups_tail_max_ch:
            return False
        if self.resblock != '1' or self.is_initializing():
            return False
        dils = self.resblock_dilation_sizes
        if any(tuple(d) != tuple(dils[0]) for d in dils):
            return False
        s_total = 1
        for j in range(level, len(self.upsample_rates)):
            k, s = self.upsample_kernel_sizes[j], self.upsample_rates[j]
            if not (s > 1 and k - s == 2 * ((k - s) // 2)):
                return False
            s_total *= s
        # the phase-stacked row count is s_total * C_final; past ~4 phases
        # (the x2/x2 tail levels this design targets) the VMEM blocks blow
        # past the scoped 16 MB limit (a v2-config tail entered at level 0
        # would accumulate 256 phases)
        if s_total > 4:
            return False
        # phase-uniform masking requires the global length to split evenly
        if t_in % s_total != 0 and s_total > 1:
            # t_in divisible is sufficient (output lengths only grow by s)
            return False
        import jax
        from forwardtacotron_tpu.ops.pallas.rnn import interpret_forced
        return jax.default_backend() == 'tpu' or interpret_forced()

    def _ups_mrf_level(self, x_ps: jnp.ndarray, level: int, s_in: int,
                       t_valid: int) -> jnp.ndarray:
        """One level (leaky -> upsample -> MRF) via ups_mrf_pallas on the
        phase-stacked [B, s_in*C_in, T_ps] activation."""
        from forwardtacotron_tpu.ops.pallas.mrf import (pack_conv_weight,
                                                        ups_mrf_pallas)
        up = self.ups[level]
        p = up.variables['params']
        num_kernels = len(self.resblock_kernel_sizes)
        weights = []
        for j in range(num_kernels):
            rb = self.resblocks[level * num_kernels + j]
            p1 = [m.variables['params']['conv'] for m in rb.convs1]
            p2 = [m.variables['params']['conv'] for m in rb.convs2]
            for ps in (p1, p2):
                weights.append(jnp.stack(
                    [pack_conv_weight(q['kernel']).astype(x_ps.dtype)
                     for q in ps]))
                weights.append(jnp.stack(
                    [q['bias'].astype(jnp.float32) for q in ps])[:, :, None])
        return ups_mrf_pallas(
            x_ps, p['kernel'], p['bias'], tuple(weights),
            s_in, self.upsample_rates[level],
            tuple(self.resblock_kernel_sizes),
            tuple(self.resblock_dilation_sizes[0]), t_valid)

    def _up_cm(self, x_cm: jnp.ndarray, level: int) -> jnp.ndarray:
        """Channels-major polyphase upsampler: the s output phases run as
        ONE [s*F, taps*C_in] GEMM against a channels-major im2col, then a
        lane interleave — no [B, T, C] layout round-trip."""
        up = self.ups[level]
        p = up.variables['params']
        kernel = p['kernel'].astype(x_cm.dtype)
        bias = p['bias'].astype(x_cm.dtype)
        k = self.upsample_kernel_sizes[level]
        s = self.upsample_rates[level]
        comb, dmin, dmax = polyphase_comb(kernel, k, s, (k - s) // 2)
        from forwardtacotron_tpu.ops.pallas.mrf import pack_conv_weight
        w = pack_conv_weight(comb)                      # [s*F, taps*C_in]
        e = _im2col_cm(x_cm, [j + dmin for j in range(comb.shape[0])])
        y = jnp.einsum('ok,bkt->bot', w, e)             # [B, s*F, T]
        b_, _, t = x_cm.shape
        f = w.shape[0] // s
        # row r*F + f holds phase r: interleave phases along time
        y = y.reshape(b_, s, f, t).transpose(0, 2, 3, 1).reshape(b_, f,
                                                                 t * s)
        return y + bias[None, :, None]


    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        num_kernels = len(self.resblock_kernel_sizes)
        x = self.conv_pre(mel.astype(self.dtype))
        cm = False            # channels-major tail active
        s_in = 1              # phase-stacked tail: phases accumulated
        ps = False
        ch = self.upsample_initial_channel
        for i, up in enumerate(self.ups):
            ch //= 2
            if not ps and not cm \
                    and self._ups_tail_fusable(ch, i, x.shape[1]):
                # phase-stacked fused-upsample tail: one transpose in,
                # one de-phase-stack reshape at the end
                x = jnp.swapaxes(x, 1, 2)       # [B, C, T], s_in = 1
                ps = True
            if ps:
                t_valid = x.shape[-1]
                x = self._ups_mrf_level(x, i, s_in, t_valid)
                s_in *= self.upsample_rates[i]
                continue
            if not cm and self._tail_fusable(ch, i):
                # one transpose into [B, C, T]; every op after this stays
                # channels-major (upsampler GEMM, fused MRF kernel,
                # conv_post), eliminating the per-level layout round-trips
                # that previously ate the in-layout MRF kernel's win
                x = jnp.swapaxes(x, 1, 2)
                cm = True
            if cm:
                x = self._up_cm(jnp.maximum(x, 0.1 * x), i)
                x = self._mrf_fused_cm(x, i)
                continue
            x = up(nn.leaky_relu(x, 0.1))
            if self._mrf_fusable(x.shape[-1]):
                x = self._mrf_fused(x, i)
            else:
                xs = self.resblocks[i * num_kernels](x)
                for j in range(1, num_kernels):
                    xs = xs + self.resblocks[i * num_kernels + j](x)
                x = xs / num_kernels
        if ps:
            # de-phase-stack once: [B, s*C, T_ps] -> [B, s*T_ps, C]
            # (element (b, s*t + r, c) = x[b, r*C + c, t])
            b_, rows, t_ps = x.shape
            c_f = rows // s_in
            x = x.reshape(b_, s_in, c_f, t_ps).transpose(0, 3, 1, 2)
            x = x.reshape(b_, t_ps * s_in, c_f)
        if cm:
            # conv_post stays channels-last: measured 6.6 ms (one
            # transpose + XLA conv) vs 27.6 ms for a channels-major GEMM
            # with a 7x im2col materialization
            x = jnp.swapaxes(x, 1, 2)
        x = nn.leaky_relu(x, 0.01)
        x = jnp.tanh(self.conv_post(x))
        return x[..., 0]

    @classmethod
    def from_config(cls, config: dict, dtype: Any = jnp.float32
                    ) -> 'HiFiGANGenerator':
        """Accepts the official hifigan config.json key names."""
        return cls(
            resblock=str(config.get('resblock', '1')),
            upsample_rates=tuple(config.get('upsample_rates', (8, 8, 2, 2))),
            upsample_kernel_sizes=tuple(
                config.get('upsample_kernel_sizes', (16, 16, 4, 4))),
            upsample_initial_channel=int(
                config.get('upsample_initial_channel', 512)),
            resblock_kernel_sizes=tuple(
                config.get('resblock_kernel_sizes', (3, 7, 11))),
            resblock_dilation_sizes=tuple(
                tuple(d) for d in config.get(
                    'resblock_dilation_sizes',
                    ((1, 3, 5), (1, 3, 5), (1, 3, 5)))),
            num_mels=int(config.get('num_mels', 80)),
            dtype=dtype)


class MelGANResStack(nn.Module):
    """seungwonpark/melgan ResStack: 3 residual units with 3**i-dilated k=3
    reflection-padded convs + 1x1 follow-up, each summed with a 1x1 shortcut
    conv of the input."""
    channels: int
    dtype: Any = jnp.float32

    def setup(self):
        self.blocks_conv1 = [
            _Conv(self.channels, 3, dilation=3 ** i, dtype=self.dtype)
            for i in range(3)]
        self.blocks_conv2 = [
            _Conv(self.channels, 1, dtype=self.dtype) for _ in range(3)]
        self.shortcuts = [
            _Conv(self.channels, 1, dtype=self.dtype) for _ in range(3)]

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(3):
            pad = 3 ** i
            xt = nn.leaky_relu(x, 0.2)
            xt = jnp.pad(xt, ((0, 0), (pad, pad), (0, 0)), mode='reflect')
            xt = self.blocks_conv1[i](xt)
            xt = nn.leaky_relu(xt, 0.2)
            xt = self.blocks_conv2[i](xt)
            x = self.shortcuts[i](x) + xt
        return x


class MelGANGenerator(nn.Module):
    """seungwonpark/melgan Generator (hop 256 = 8*8*2*2).

    Input [B, T, n_mels] log-mel -> [B, T*256] waveform. ``inference``
    reproduces the published tail-padding trick (10 frames of
    log(1e-5) = -11.5129 appended to suppress the end-of-utterance
    artifact).
    """
    mel_channels: int = 80
    base_channels: int = 512
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)
    dtype: Any = jnp.float32

    @property
    def hop_length(self) -> int:
        out = 1
        for r in self.upsample_rates:
            out *= r
        return out

    def setup(self):
        self.conv_pre = _Conv(self.base_channels, 7, dtype=self.dtype)
        ups, res = [], []
        ch = self.base_channels
        for u in self.upsample_rates:
            ch //= 2
            ups.append(TransposedConv1d(ch, 2 * u, stride=u, padding=u // 2,
                                        dtype=self.dtype))
            res.append(MelGANResStack(ch, dtype=self.dtype))
        self.ups = ups
        self.res = res
        self.conv_post = _Conv(1, 7, dtype=self.dtype)

    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        x = jnp.pad(mel.astype(self.dtype), ((0, 0), (3, 3), (0, 0)),
                    mode='reflect')
        x = self.conv_pre(x)
        for up, stack in zip(self.ups, self.res):
            x = up(nn.leaky_relu(x, 0.2))
            x = stack(x)
        x = nn.leaky_relu(x, 0.2)
        x = jnp.pad(x, ((0, 0), (3, 3), (0, 0)), mode='reflect')
        x = jnp.tanh(self.conv_post(x))
        return x[..., 0]

    def inference(self, mel: jnp.ndarray, pad_frames: int = 10
                  ) -> jnp.ndarray:
        tail = jnp.full(mel.shape[:1] + (pad_frames,) + mel.shape[2:],
                        PAD_VALUE, mel.dtype)
        wav = self(jnp.concatenate([mel, tail], axis=1))
        # published inference crops the pad_frames*hop tail back off
        return wav[:, :mel.shape[1] * self.hop_length]
