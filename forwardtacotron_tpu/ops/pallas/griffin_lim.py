"""Fused Pallas kernel for one Griffin-Lim iteration.

The pair-path GL iteration (ops/stft.py griffin_lim_pair, reference
utils/dsp.py:80-94) is istft -> stft -> momentum -> phase-normalize. Even
with the complex-free DFT-matmul formulation, each iteration round-trips
the [F, n_fft] frames and the time signal through HBM and pays several
dispatches of framing/OLA/phase glue: measured 7.4 ms per iteration at
batch 64 x 10 s (n_fft 1024, hop 256) vs a 2.1 ms bytes floor, and an A/B
proved the gap is the glue, not f32 MXU rate (STATUS round 4).

This kernel runs the ENTIRE iteration in one dispatch, gridded over
(batch, frame blocks), frames VMEM-resident:

    spec -> IDFT matmul -> banded OLA+re-frame combine -> DFT matmul
         -> momentum update -> phase normalize -> next spec

The key identity: because istft's overlap-add and stft's framing use the
same hop, the composed frames->frames map is BANDED — output frame i
depends only on windowed IDFT frames i-(R-1)..i+(R-1), R = n_fft//hop:

    y_i[t] = q[t] * sum_d f_{i-d}[t + d*hop],   d in [-(R-1), R-1]

with q[t] = win[t] / p(t mod hop), p the hop-periodic interior of the
squared-window OLA normalizer. The identity holds for interior frames;
the first/last R frames (incomplete OLA normalizer + reflect padding) are
computed EXACTLY outside the kernel from the first/last 2R-1 spec rows
(a tiny matmul) and passed in as replacement rows.

Frequency bins are zero-padded to a lane multiple (513 -> 640 for
n_fft=1024) ONCE for the whole GL run; the zero-bin invariant survives
iterations (zero mag -> zero spec) so no per-iteration re-padding.

Measured on v5e (GL-32, batch 64 x 10 s, n_fft 1024 hop 256, chained +
readback):

    pair path (per-dispatch glue)   239 ms   2,677 audio-s/s  7.5 ms/iter
    fused, lax.fori_loop            178 ms   3,599            5.6
    fused, unrolled loop            104 ms   6,157            3.25

The fori_loop -> unrolled step matters because Pallas outputs cannot
alias while-loop carries, so XLA copies all four ~300 MB carries back
into the loop buffers every iteration; unrolled (n_iter is static) the
buffers chain freely. ``compute_dtype``: f32 and bf16 measure IDENTICAL
(the kernel is bytes/VPU-bound, not MXU-bound), so the default is f32,
which keeps bit-comparable trajectory parity with griffin_lim_pair
(~1e-6 at small iteration counts on the CPU backend).
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from forwardtacotron_tpu.ops.stft import _dft_matrices, _ola_win_sq


def _lane_pad(n: int) -> int:
    return -(-n // 128) * 128


@lru_cache(maxsize=8)
def _gl_constants(n_fft: int, hop: int, win_length: int):
    """Window-folded, bin-padded DFT matrices + the periodic q mask.

    inv_*: [BP, n_fft] spec->frames with the synthesis window folded in.
    fwd_*: [n_fft, BP] frames->spec (analysis window NOT folded — the
    banded combine multiplies by q = win/p first).
    q: [1, n_fft].
    """
    bins = n_fft // 2 + 1
    bp = _lane_pad(bins)
    fwd_re, fwd_im, inv_re, inv_im = _dft_matrices(n_fft)
    win = np.zeros(n_fft, np.float32)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(win_length)
                            / win_length))
    lpad = (n_fft - win_length) // 2
    win[lpad:lpad + win_length] = w
    # periodic interior of the OLA normalizer
    p = np.zeros(hop, np.float64)
    for j in range(n_fft // hop):
        p += (win[j * hop:(j + 1) * hop] ** 2).astype(np.float64)
    p = np.maximum(p, 1e-10)
    q = (win / np.tile(p, n_fft // hop)).astype(np.float32)[None, :]

    def pad_bins(m, axis):
        padw = [(0, 0), (0, 0)]
        padw[axis] = (0, bp - bins)
        return np.pad(m, padw).astype(np.float32)

    inv_re_w = pad_bins(inv_re * win[None, :], 0)     # [BP, n_fft]
    inv_im_w = pad_bins(inv_im * win[None, :], 0)
    fwd_re_p = pad_bins(fwd_re, 1)                    # [n_fft, BP]
    fwd_im_p = pad_bins(fwd_im, 1)
    return inv_re_w, inv_im_w, fwd_re_p, fwd_im_p, q, win


def _edge_frames(spec_re, spec_im, n_fft, hop, win_length, n_frames,
                 row0=0):
    """Exact pre-DFT frame values for the first/last R frames, computed
    from the first/last 2R-1 spec rows with the TRUE OLA normalizer and
    reflect padding. Spec inputs are the bin-PADDED [B, F, BP] arrays
    (the padded matrices have zero rows there); ``row0`` is the row index
    of true frame 0 (the fused wrapper carries one pad block of rows).
    Returns [B, 2R, n_fft] (R head rows then R tail)."""
    r = n_fft // hop
    k = 2 * r - 1
    if row0:
        spec_re = spec_re[:, row0:row0 + n_frames]
        spec_im = spec_im[:, row0:row0 + n_frames]
    inv_re_w, inv_im_w, _, _, _, win = _gl_constants(n_fft, hop, win_length)
    inv_re_w = jnp.asarray(inv_re_w)
    inv_im_w = jnp.asarray(inv_im_w)
    winsq = _ola_win_sq(n_fft, hop, n_frames, win_length)
    half = n_fft // 2
    seg = (k - 1) * hop + n_fft
    win_j = jnp.asarray(win)

    def ola(f_rows):
        b = f_rows.shape[0]
        sig = jnp.zeros((b, seg), jnp.float32)
        for j in range(k):
            sig = sig.at[:, j * hop:j * hop + n_fft].add(f_rows[:, j])
        return sig

    def frames_of(sig_pad, base):
        # sig_pad: [B, *] already reflect-padded so frame i of the
        # original stft reads sig_pad[:, (i - base)*hop : ... + n_fft]
        return jnp.stack([sig_pad[:, (i - base) * hop:
                                  (i - base) * hop + n_fft]
                          for i in range(base, base + r)], axis=1)

    # ---- head: frames 0..R-1
    f_head = (spec_re[:, :k] @ inv_re_w + spec_im[:, :k] @ inv_im_w)
    raw = ola(f_head) / jnp.asarray(winsq[:seg])
    sig = raw[:, half:]                       # signal coords from sigma=0
    sig_pad = jnp.concatenate([sig[:, 1:half + 1][:, ::-1], sig], axis=1)
    head = frames_of(sig_pad, 0) * win_j[None, None, :]

    # ---- tail: frames F-R..F-1
    off = (n_frames - k) * hop                # raw-OLA offset of the seg
    f_tail = (spec_re[:, n_frames - k:n_frames] @ inv_re_w
              + spec_im[:, n_frames - k:n_frames] @ inv_im_w)
    raw_t = ola(f_tail) / jnp.asarray(winsq[off:off + seg])
    # signal coords: sigma = s - half; this segment covers
    # sigma in [off - half + ... ); crop the leading half-frame so the
    # segment starts at sigma0 = off + half - ... use s >= off + half?
    # Simplest exact bookkeeping: sigma_local = s_local - half relative
    # to the segment, valid signal sigma = off + sigma_local.
    sig_t = raw_t[:, half:]                   # sigma from off+half-half=off
    # valid signal length L = hop*(F-1); the segment's signal part ends at
    # sigma = off + seg - half - 1 = L + half - 1 >= L: crop to L, then
    # reflect-pad the right edge for the stft frames that read past L.
    l_total = hop * (n_frames - 1)
    valid = l_total - off                     # samples until sigma = L
    sig_t = sig_t[:, :valid]
    sig_tpad = jnp.concatenate(
        [sig_t, sig_t[:, -half - 1:-1][:, ::-1]], axis=1)
    # frame i (i >= F-R) reads original-signal slice starting at
    # sigma = i*hop - half  ->  local offset i*hop - half - off
    base = n_frames - r
    start0 = base * hop - half - off
    tail = jnp.stack(
        [sig_tpad[:, start0 + j * hop: start0 + j * hop + n_fft]
         for j in range(r)], axis=1) * win_j[None, None, :]
    return jnp.concatenate([head, tail], axis=1)


def _gl_iter_kernel(sre_ref, sim_ref, slo_re_ref, slo_im_ref,
                    shi_re_ref, shi_im_ref, tre_ref, tim_ref, mag_ref,
                    repl_ref, q_ref, ivri_ref, fwri_ref,
                    ore_ref, oim_ref, orb_re_ref, orb_im_ref,
                    s_s, f_s,
                    *, hop, n_frames, momentum, halo, fb, bp):
    i = pl.program_id(1)
    nblk = pl.num_programs(1)
    n_fft = ivri_ref.shape[1]
    r = n_fft // hop
    pad = (r - 1) * hop
    mdt = ivri_ref.dtype

    # assemble spec rows [halo + FB + halo, 2*BP] (re | im lane-packed) in
    # scratch — Mosaic cannot concatenate offset slices, but ref STORES at
    # sublane/lane offsets are fine. Edge halos come from the arrays'
    # never-written pad blocks: SELECT (not multiply) to zero them, since
    # uninitialized memory may hold NaNs and NaN * 0 = NaN.
    lo_ok = i > 0
    hi_ok = i < nblk - 1
    zh = jnp.zeros((halo, bp), jnp.float32)
    s_s[0:halo, 0:bp] = jnp.where(lo_ok, slo_re_ref[0, 8 - halo:], zh)
    s_s[0:halo, bp:] = jnp.where(lo_ok, slo_im_ref[0, 8 - halo:], zh)
    s_s[halo:halo + fb, 0:bp] = sre_ref[0]
    s_s[halo:halo + fb, bp:] = sim_ref[0]
    s_s[halo + fb:, 0:bp] = jnp.where(hi_ok, shi_re_ref[0, :halo], zh)
    s_s[halo + fb:, bp:] = jnp.where(hi_ok, shi_im_ref[0, :halo], zh)

    # one IDFT GEMM (re and im stacked on the contraction dim), synthesis
    # window folded in; written into the CENTER columns of a wide scratch
    # whose side bands stay zero, so every banded-combine term below is a
    # full-width read at a 128-aligned lane offset (no roll, no mask)
    f_s[:, 0:pad] = jnp.zeros((fb + 2 * halo, pad), jnp.float32)
    f_s[:, pad + n_fft:] = jnp.zeros((fb + 2 * halo, pad), jnp.float32)
    f_s[:, pad:pad + n_fft] = jax.lax.dot_general(
        s_s[...].astype(mdt), ivri_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    # banded OLA + re-frame: y_i[t] = sum_d f[i-d][t + d*hop]
    y = None
    for d in range(-(r - 1), r):
        sh = f_s[halo - d: halo - d + fb,
                 pad + d * hop: pad + d * hop + n_fft]
        y = sh if y is None else y + sh
    y = y * q_ref[...]

    # replace the first/last R frames with their exact values
    row = (jax.lax.broadcasted_iota(jnp.int32, (fb, 1), 0)
           + i * fb).astype(jnp.int32)
    for k in range(r):
        y = jnp.where(row == k, repl_ref[0, k][None, :], y)
        y = jnp.where(row == n_frames - r + k,
                      repl_ref[0, r + k][None, :], y)

    # one DFT GEMM back to spectra (re | im lane-packed output)
    rb = jax.lax.dot_general(y.astype(mdt), fwri_ref[...],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    rb_re = rb[:, 0:bp]
    rb_im = rb[:, bp:]

    # momentum + phase normalize + re-magnitude
    c = momentum / (1.0 + momentum)
    up_re = rb_re - c * tre_ref[0]
    up_im = rb_im - c * tim_ref[0]
    mod = jnp.maximum(jnp.sqrt(up_re * up_re + up_im * up_im), 1e-16)
    mag = mag_ref[0]
    ore_ref[0] = mag * up_re / mod
    oim_ref[0] = mag * up_im / mod
    orb_re_ref[0] = rb_re
    orb_im_ref[0] = rb_im


@partial(jax.jit, static_argnames=('n_fft', 'hop_length', 'win_length',
                                   'n_iter', 'momentum', 'compute_dtype',
                                   'block_frames', 'interpret'))
def griffin_lim_fused(magnitude: jnp.ndarray,
                      key: jax.Array,
                      n_fft: int,
                      hop_length: int,
                      win_length: int,
                      n_iter: int = 32,
                      momentum: float = 0.99,
                      compute_dtype=jnp.float32,
                      block_frames: int = 128,
                      interpret: bool = False) -> jnp.ndarray:
    """Batched Griffin-Lim with the fused per-iteration kernel.

    magnitude: [B, bins, n_frames] (the griffin_lim layout, batched).
    ``key``: per-item keys [B, ...] (e.g. jax.random.split(key, B)) — item
    b gets the same phase init as griffin_lim_pair(mag[b], key[b]).
    Returns [B, n_samples]. Same algorithm/init as griffin_lim_pair —
    with ``compute_dtype=jnp.float32`` trajectories match it to f32
    rounding; bf16 (default) is the quality-neutral fast path.
    """
    from forwardtacotron_tpu.ops.pallas.rnn import interpret_forced
    from forwardtacotron_tpu.ops.stft import istft_pair
    interpret = interpret or interpret_forced()
    hop = hop_length
    assert n_fft % hop == 0
    b, bins, f_true = magnitude.shape
    r = n_fft // hop
    halo = r - 1
    assert halo <= 8, 'halo blocks are fixed 8 rows'
    # the exact-edge computation reads the first/last 2R-1 spec rows and
    # replaces the first/last R frames; shorter inputs should use
    # griffin_lim_pair (DSP._gl_fused_usable gates on this)
    assert f_true >= 2 * r, \
        f'griffin_lim_fused needs >= {2 * r} frames, got {f_true}'
    bp = _lane_pad(bins)
    fb = block_frames
    f_cap = -(-max(f_true, 2 * r) // fb) * fb
    assert f_cap % 8 == 0

    inv_re_w, inv_im_w, fwd_re_p, fwd_im_p, q, _ = _gl_constants(
        n_fft, hop, win_length)
    mdt = jnp.dtype(compute_dtype)
    # combined operands: one GEMM each way (re|im stacked on contraction /
    # lane-packed on output)
    ivri = jnp.asarray(np.concatenate([inv_re_w, inv_im_w], axis=0), mdt)
    fwri = jnp.asarray(np.concatenate([fwd_re_p, fwd_im_p], axis=1), mdt)
    qj = jnp.asarray(q)

    # pad mag to [B, fb + F_cap + fb, BP], frames-major. The extra BLOCK of
    # rows at each end keeps every halo index map affine and in-bounds
    # (Mosaic's pipelined prefetch requires affine maps — a min/max clamp
    # in the map was measured to serialize the DMA, 5.1 vs 2.6 ms/iter —
    # and out-of-range block indices fail at runtime). The pad blocks of
    # the OUTPUTS are never written; they are also never read (the
    # in-kernel lo_ok/hi_ok masks zero halo rows read from them).
    mag = jnp.transpose(magnitude, (0, 2, 1)).astype(jnp.float32)
    mag = jnp.pad(mag, ((0, 0), (fb, f_cap - f_true + fb), (0, bp - bins)))

    # same phase init as griffin_lim_pair ([bins, frames] draw order,
    # one key per item)
    phase = 2.0 * jnp.pi * jax.vmap(
        lambda k: jax.random.uniform(k, (bins, f_true)))(key)
    ang_re = jnp.pad(jnp.transpose(jnp.cos(phase), (0, 2, 1)),
                     ((0, 0), (fb, f_cap - f_true + fb), (0, bp - bins)))
    ang_im = jnp.pad(jnp.transpose(jnp.sin(phase), (0, 2, 1)),
                     ((0, 0), (fb, f_cap - f_true + fb), (0, bp - bins)))
    spec_re = mag * ang_re
    spec_im = mag * ang_im

    nblk = f_cap // fb
    kern = partial(_gl_iter_kernel, hop=hop, n_frames=f_true,
                   momentum=momentum, halo=halo, fb=fb, bp=bp)

    # all index maps affine, offset one block for the permanent pad block
    main = pl.BlockSpec((1, fb, bp), lambda bb, i: (bb, i + 1, 0),
                        memory_space=pltpu.VMEM)
    lo = pl.BlockSpec((1, 8, bp),
                      lambda bb, i: (bb, (i + 1) * (fb // 8) - 1, 0),
                      memory_space=pltpu.VMEM)
    hi = pl.BlockSpec((1, 8, bp),
                      lambda bb, i: (bb, (i + 2) * (fb // 8), 0),
                      memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    repl_spec = pl.BlockSpec((1, 2 * r, n_fft), lambda bb, i: (bb, 0, 0),
                             memory_space=pltpu.VMEM)

    shape = jax.ShapeDtypeStruct((b, fb + f_cap + fb, bp), jnp.float32)
    step = pl.pallas_call(
        kern,
        grid=(b, nblk),
        in_specs=[main, main, lo, lo, hi, hi, main, main, main,
                  repl_spec, full, full, full],
        out_specs=(main, main, main, main),
        out_shape=(shape, shape, shape, shape),
        scratch_shapes=[
            pltpu.VMEM((fb + 2 * halo, 2 * bp), jnp.float32),
            pltpu.VMEM((fb + 2 * halo, n_fft + 2 * (r - 1) * hop),
                       jnp.float32),
        ],
        interpret=interpret,
    )

    def body(carry):
        s_re, s_im, tp_re, tp_im = carry
        repl = _edge_frames(s_re, s_im, n_fft, hop, win_length, f_true,
                            row0=fb)
        return step(s_re, s_im, s_re, s_im, s_re, s_im, tp_re, tp_im,
                    mag, repl, qj, ivri, fwri)

    # Python-unrolled loop (n_iter is static): a lax.fori_loop here forces
    # XLA to copy all four multi-hundred-MB carries back into the while
    # buffers every iteration (Pallas outputs cannot alias loop carries) —
    # measured 4.5 vs 2.8 ms/iter. Unrolled, XLA chains buffers freely.
    zeros = jnp.zeros_like(spec_re)
    carry = (spec_re, spec_im, zeros, zeros)
    for _ in range(n_iter):
        carry = body(carry)
    s_re, s_im = carry[0], carry[1]

    synth = jax.vmap(lambda re, im: istft_pair(
        re, im, n_fft, hop, win_length))
    return synth(s_re[:, fb:fb + f_true, :bins],
                 s_im[:, fb:fb + f_true, :bins])
