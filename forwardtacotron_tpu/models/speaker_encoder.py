"""Speaker encoder: the published Resemblyzer VoiceEncoder design in JAX.

The reference computes one d-vector per utterance with Resemblyzer's
VoiceEncoder (reference preprocess.py:172-182). That package is not
installed here, so this module implements the SAME published architecture
(resemblyzer/voice_encoder.py: 3-layer unidirectional LSTM(40->256) ->
Linear(256->256) -> ReLU -> L2 normalize on the last layer's final hidden
state) natively, plus its inference pipeline
(resemblyzer/audio.py + VoiceEncoder.embed_utterance):

  wav @ source sr -> resample 16 kHz -> 40-mel power spectrogram
  (n_fft 400, hop 160, librosa melspectrogram defaults: power 2, slaney) ->
  sliding partials of 160 frames at 50% overlap (min coverage 0.75) ->
  embed each partial -> mean -> L2 normalize.

Published ``pretrained.pt`` weights load via :func:`load_resemblyzer_weights`
(plain torch state_dict: lstm.weight_ih_l{0,1,2}, lstm.weight_hh_l*,
lstm.bias_ih_l*, lstm.bias_hh_l*, linear.weight, linear.bias). Without a
weights file the encoder still runs (random init) but its embeddings are
NOT speaker-discriminative — data/preprocess.py then prefers the
deterministic mel-stats fallback and STATUS.md records that multispeaker
conditioning quality is unvalidated against the reference.

TPU note: the LSTM runs as a lax.scan over the 160-frame partials with all
partials batched, one input-projection GEMM hoisted out of the scan —
the same design as models/layers.py RNNs. Embedding extraction is a
preprocessing-time workload (once per utterance), so no Pallas treatment
is warranted.
"""

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
MEL_N_FFT = 400
MEL_HOP = 160
MEL_N_CHANNELS = 40
PARTIAL_N_FRAMES = 160
MIN_PAD_COVERAGE = 0.75
OVERLAP = 0.5
MODEL_HIDDEN = 256
MODEL_LAYERS = 3
MODEL_EMB = 256


def _uniform(key, shape, scale):
    return jax.random.uniform(key, shape, jnp.float32, -scale, scale)


def init_voice_encoder_params(seed: int = 0) -> Dict[str, np.ndarray]:
    """Random parameters in the torch layout (testing / cold start)."""
    key = jax.random.PRNGKey(seed)
    params = {}
    scale = 1.0 / np.sqrt(MODEL_HIDDEN)
    in_dim = MEL_N_CHANNELS
    for layer in range(MODEL_LAYERS):
        for name, shape in ((f'lstm.weight_ih_l{layer}',
                             (4 * MODEL_HIDDEN, in_dim)),
                            (f'lstm.weight_hh_l{layer}',
                             (4 * MODEL_HIDDEN, MODEL_HIDDEN)),
                            (f'lstm.bias_ih_l{layer}', (4 * MODEL_HIDDEN,)),
                            (f'lstm.bias_hh_l{layer}', (4 * MODEL_HIDDEN,))):
            key, sub = jax.random.split(key)
            params[name] = np.asarray(_uniform(sub, shape, scale))
        in_dim = MODEL_HIDDEN
    key, sub = jax.random.split(key)
    params['linear.weight'] = np.asarray(
        _uniform(sub, (MODEL_EMB, MODEL_HIDDEN), scale))
    key, sub = jax.random.split(key)
    params['linear.bias'] = np.asarray(_uniform(sub, (MODEL_EMB,), scale))
    return params


def load_resemblyzer_weights(path: str) -> Dict[str, np.ndarray]:
    """Load resemblyzer's published ``pretrained.pt`` (torch checkpoint with
    the state_dict under 'model_state' in the official release, or a plain
    state_dict).

    Validates the key set against the VoiceEncoder architecture and raises
    ``ValueError`` on mismatch — an unrelated checkpoint that happens to be
    named ``pretrained.pt`` must not be silently treated as speaker-encoder
    weights (callers fall back to the mel-stats encoder instead of crashing
    mid-preprocessing)."""
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    state = ckpt.get('model_state', ckpt) if isinstance(ckpt, dict) else ckpt
    if not isinstance(state, dict) or not all(
            hasattr(v, 'detach') for v in state.values()):
        raise ValueError(f'{path}: not a torch state_dict checkpoint')
    expected = set(init_voice_encoder_params())
    got = set(state)
    if not expected <= got:
        raise ValueError(
            f'{path}: not Resemblyzer VoiceEncoder weights '
            f'(missing keys e.g. {sorted(expected - got)[:3]})')
    params = {k: state[k].detach().cpu().numpy() for k in expected}
    shapes = {k: v.shape for k, v in params.items()}
    ref_shapes = {k: v.shape for k, v in init_voice_encoder_params().items()}
    if shapes != ref_shapes:
        bad = {k: (shapes[k], ref_shapes[k])
               for k in shapes if shapes[k] != ref_shapes[k]}
        raise ValueError(f'{path}: VoiceEncoder weight shapes mismatch {bad}')
    return params


AUDIO_NORM_TARGET_DBFS = -30.0
VAD_WINDOW_LENGTH = 30          # ms
VAD_MOVING_AVERAGE_WIDTH = 8
VAD_MAX_SILENCE_LENGTH = 6


def normalize_volume(wav: np.ndarray,
                     target_dbfs: float = AUDIO_NORM_TARGET_DBFS,
                     increase_only: bool = False,
                     decrease_only: bool = False) -> np.ndarray:
    """resemblyzer audio.py normalize_volume: scale to a target dBFS."""
    power = float(np.mean(np.square(wav))) if len(wav) else 0.0
    if power <= 0:
        return wav
    change = target_dbfs - 10.0 * np.log10(power)
    if (change < 0 and increase_only) or (change > 0 and decrease_only):
        return wav
    return wav * (10.0 ** (change / 20.0))


def preprocess_for_embedding(wav: np.ndarray, source_sr: int) -> np.ndarray:
    """resemblyzer's ``preprocess_wav``: resample to 16 kHz, normalize
    volume to -30 dBFS (increase only), then VAD-trim long silences with
    resemblyzer's constants (window 30 ms, moving average 8, max silence 6,
    webrtcvad mode 3 — energy VAD fallback when webrtcvad is absent).

    The reference applies this before ``embed_utterance``
    (reference preprocess.py:80,181); the native encoder path must match it
    or embeddings drift from the reference pipeline's (ADVICE r3). Returns
    a 16 kHz waveform — pass ``source_sr=16000`` to ``embed_utterance``."""
    from forwardtacotron_tpu.dsp.dsp import DSP, resample
    wav = np.asarray(wav, np.float32)
    if source_sr != SAMPLE_RATE:
        wav = resample(wav, source_sr, SAMPLE_RATE)
    wav = normalize_volume(wav, increase_only=True)
    vad = DSP(num_mels=MEL_N_CHANNELS, sample_rate=SAMPLE_RATE,
              hop_length=MEL_HOP, win_length=MEL_N_FFT, n_fft=MEL_N_FFT,
              fmin=0.0, fmax=SAMPLE_RATE / 2.0,
              vad_sample_rate=SAMPLE_RATE,
              vad_window_length=VAD_WINDOW_LENGTH,
              vad_moving_average_width=VAD_MOVING_AVERAGE_WIDTH,
              vad_max_silence_length=VAD_MAX_SILENCE_LENGTH)
    return vad.trim_long_silences(wav)


def _forward_embed(params: Dict[str, np.ndarray],
                   mels: jnp.ndarray) -> jnp.ndarray:
    """[B, T, 40] mel partials -> [B, 256] L2-normalized embeddings.

    Torch LSTM gate order (i, f, g, o) and last-layer final hidden state,
    exactly resemblyzer VoiceEncoder.forward."""
    h = mels
    b = mels.shape[0]
    last_hidden = None
    for layer in range(MODEL_LAYERS):
        wi = jnp.asarray(params[f'lstm.weight_ih_l{layer}']).T
        wh = jnp.asarray(params[f'lstm.weight_hh_l{layer}']).T
        bias = (jnp.asarray(params[f'lstm.bias_ih_l{layer}'])
                + jnp.asarray(params[f'lstm.bias_hh_l{layer}']))
        xp = jnp.swapaxes(h @ wi + bias, 0, 1)          # [T, B, 4H]
        xp = jax.lax.optimization_barrier(xp)

        def step(carry, x_t, wh=wh):
            hh, cc = carry
            gates = x_t + hh @ wh
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c_new = jax.nn.sigmoid(f) * cc + jax.nn.sigmoid(i) * jnp.tanh(g)
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        zeros = jnp.zeros((b, MODEL_HIDDEN), mels.dtype)
        (h_fin, _), hs = jax.lax.scan(step, (zeros, zeros), xp)
        h = jnp.swapaxes(hs, 0, 1)
        last_hidden = h_fin
    raw = jax.nn.relu(last_hidden @ jnp.asarray(params['linear.weight']).T
                      + jnp.asarray(params['linear.bias']))
    norm = jnp.linalg.norm(raw, axis=-1, keepdims=True)
    return raw / jnp.maximum(norm, 1e-8)


def wav_to_mel_spectrogram(wav: np.ndarray) -> np.ndarray:
    """resemblyzer/audio.py: 40-mel POWER spectrogram (no log), 16 kHz,
    25 ms window / 10 ms hop, librosa melspectrogram defaults."""
    from forwardtacotron_tpu.dsp.mel import mel_filterbank
    from forwardtacotron_tpu.ops.stft import stft_magnitude
    mag = stft_magnitude(jnp.asarray(wav, jnp.float32), MEL_N_FFT, MEL_HOP,
                         MEL_N_FFT)
    fb = mel_filterbank(SAMPLE_RATE, MEL_N_FFT, MEL_N_CHANNELS, 0.0,
                        SAMPLE_RATE / 2.0)
    mel = jnp.asarray(fb) @ (mag.astype(jnp.float32) ** 2)
    return np.asarray(mel.T, np.float32)                 # [T, 40]


def compute_partial_slices(n_samples: int,
                           rate: Optional[float] = None
                           ) -> Tuple[list, list]:
    """resemblyzer VoiceEncoder.compute_partial_slices with the default
    partial length/overlap: returns (wav_slices, mel_slices)."""
    samples_per_frame = MEL_HOP
    frame_step = max(int(np.round(PARTIAL_N_FRAMES * (1 - OVERLAP))), 1)
    n_frames = int(np.ceil((n_samples + 1) / samples_per_frame))

    wav_slices, mel_slices = [], []
    steps = max(1, n_frames - PARTIAL_N_FRAMES + frame_step + 1)
    for i in range(0, steps, frame_step):
        mel_range = np.array([i, i + PARTIAL_N_FRAMES])
        wav_range = mel_range * samples_per_frame
        mel_slices.append(slice(*mel_range))
        wav_slices.append(slice(*wav_range))

    last_wav_range = wav_slices[-1]
    coverage = (n_samples - last_wav_range.start) \
        / (last_wav_range.stop - last_wav_range.start)
    if coverage < MIN_PAD_COVERAGE and len(mel_slices) > 1:
        mel_slices = mel_slices[:-1]
        wav_slices = wav_slices[:-1]
    return wav_slices, mel_slices


class VoiceEncoder:
    """Drop-in for resemblyzer.VoiceEncoder limited to embedding utterances.

    ``params``: torch-layout dict (see load_resemblyzer_weights); random
    init when omitted (embeddings then carry no speaker identity — for
    production multispeaker parity supply the published weights)."""

    def __init__(self, params: Optional[Dict[str, np.ndarray]] = None,
                 weights_path: Optional[str] = None):
        if params is None and weights_path is not None:
            params = load_resemblyzer_weights(weights_path)
        self.params = params if params is not None \
            else init_voice_encoder_params()
        self._embed = jax.jit(lambda mels: _forward_embed(self.params, mels))

    def embed_frames_batch(self, mels: np.ndarray) -> np.ndarray:
        """[B, T, 40] -> [B, 256]."""
        return np.asarray(self._embed(jnp.asarray(mels, jnp.float32)))

    def embed_utterance(self, wav: np.ndarray,
                        source_sr: int = SAMPLE_RATE) -> np.ndarray:
        """One utterance waveform -> one L2-normalized [256] d-vector
        (resemblyzer embed_utterance with default partials; the VAD/volume
        preprocessing of preprocess_wav is the caller's responsibility, as
        in the reference which passes trimmed audio)."""
        from forwardtacotron_tpu.dsp.dsp import resample
        if source_sr != SAMPLE_RATE:
            wav = resample(np.asarray(wav, np.float32), source_sr,
                           SAMPLE_RATE)
        wav_slices, mel_slices = compute_partial_slices(len(wav))
        max_wave_length = wav_slices[-1].stop
        if max_wave_length >= len(wav):
            wav = np.pad(wav, (0, max_wave_length - len(wav)))
        mel = wav_to_mel_spectrogram(wav)
        partials = np.stack([mel[s] for s in mel_slices])
        partial_embeds = self.embed_frames_batch(partials)
        raw = partial_embeds.mean(axis=0)
        return raw / max(np.linalg.norm(raw), 1e-8)
