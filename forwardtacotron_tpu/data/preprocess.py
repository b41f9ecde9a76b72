"""Dataset preprocessing: wav -> mel / raw pitch / phonemized text /
speaker embeddings, with a stratified train/val split.

Parity with reference preprocess.py:67-229: per-file conversion (load ->
optional VAD long-silence trim -> optional start/end trim -> peak norm,
forced when peak > 1 -> log-mel -> raw pitch -> cleaned text), process-pool
parallelism, per-utterance speaker embeddings, seeded per-speaker split with
validation sorted longest-first, pickled dicts, and mean L2-normalized
per-speaker embeddings.

Speaker embeddings: the reference uses Resemblyzer's VoiceEncoder. When that
package is unavailable this build falls back to a deterministic mel-statistics
embedding (mean/std/percentile summary projected to 256-d with a fixed random
matrix) — same interface and file layout, swappable for a real encoder.
"""

from concurrent.futures import ProcessPoolExecutor
from dataclasses import dataclass
from pathlib import Path
from random import Random
from typing import Any, Dict, List, Optional, Tuple, Union

import numpy as np

from forwardtacotron_tpu.dsp.dsp import DSP
from forwardtacotron_tpu.dsp.pitch import new_pitch_extractor_from_config
from forwardtacotron_tpu.text.cleaners import Cleaner
from forwardtacotron_tpu.text.recipes import read_metadata
from forwardtacotron_tpu.utils.files import get_files, pickle_binary
from forwardtacotron_tpu.utils.paths import Paths

SPEAKER_EMB_DIM = 256


@dataclass
class DataPoint:
    item_id: str
    mel_len: int
    text: str
    speaker_name: str
    wav: Optional[np.ndarray] = None


class MelStatsSpeakerEncoder:
    """Deterministic fallback speaker embedding from mel statistics."""

    def __init__(self, n_mels: int, dim: int = SPEAKER_EMB_DIM) -> None:
        rs = np.random.RandomState(1234)
        self._proj = rs.randn(4 * n_mels, dim).astype(np.float32) \
            / np.sqrt(4 * n_mels)

    def embed(self, mel: np.ndarray) -> np.ndarray:
        feats = np.concatenate([
            mel.mean(axis=1), mel.std(axis=1),
            np.percentile(mel, 10, axis=1), np.percentile(mel, 90, axis=1),
        ]).astype(np.float32)
        emb = feats @ self._proj
        norm = np.linalg.norm(emb)
        return emb / norm if norm > 0 else emb


def find_resemblyzer_weights() -> Optional[str]:
    """Locate a Resemblyzer ``pretrained.pt`` for the native VoiceEncoder:
    $RESEMBLYZER_WEIGHTS, then ./checkpoints, then ~/checkpoints."""
    import os
    candidates = [os.environ.get('RESEMBLYZER_WEIGHTS')]
    for d in (Path('checkpoints'), Path.home() / 'checkpoints'):
        candidates.append(str(d / 'pretrained.pt'))
    for c in candidates:
        if c and Path(c).is_file():
            return c
    return None


def make_speaker_encoder(n_mels: int):
    """Speaker-embedding provider, in preference order:

    1. the resemblyzer package (exactly the reference's path,
       preprocess.py:172-182), if installed;
    2. the native JAX VoiceEncoder (models/speaker_encoder.py — same
       published architecture) with real ``pretrained.pt`` weights, if a
       weights file is found (see :func:`find_resemblyzer_weights`);
    3. the deterministic mel-stats fallback — interface-compatible but NOT
       a trained speaker encoder; multispeaker conditioning quality is
       unvalidated vs the reference until weights are supplied.
    """
    try:
        from resemblyzer import VoiceEncoder
        encoder = VoiceEncoder()

        class _Resemblyzer:
            def embed(self, mel, wav=None, sample_rate=22050):
                from resemblyzer import preprocess_wav
                return encoder.embed_utterance(
                    preprocess_wav(wav, source_sr=sample_rate))
        return _Resemblyzer()
    except ImportError:
        pass
    weights = find_resemblyzer_weights()
    if weights is not None:
        from forwardtacotron_tpu.models.speaker_encoder import (
            SAMPLE_RATE, VoiceEncoder, preprocess_for_embedding)
        try:
            encoder = VoiceEncoder(weights_path=weights)
        except Exception as e:
            # e.g. an unrelated checkpoint named pretrained.pt in
            # ./checkpoints — warn and use the fallback rather than crash
            # mid-preprocessing (ADVICE r3)
            print(f'Speaker encoder: ignoring {weights} ({e}); '
                  'using mel-stats fallback')
            return MelStatsSpeakerEncoder(n_mels)
        print(f'Speaker encoder: native VoiceEncoder with {weights}')

        class _Resemblyzer:  # same name: signals the wav-needing path
            def embed(self, mel, wav=None, sample_rate=22050):
                # replicate resemblyzer's preprocess_wav (volume norm +
                # VAD trim) so native-path embeddings match the reference
                # pipeline's (reference preprocess.py:80,181)
                wav16 = preprocess_for_embedding(wav, source_sr=sample_rate)
                return encoder.embed_utterance(wav16, source_sr=SAMPLE_RATE)
        return _Resemblyzer()
    return MelStatsSpeakerEncoder(n_mels)


class Preprocessor:
    """Per-file conversion; picklable so it runs in pool workers
    (reference preprocess.py:55-98).

    ``keep_wav``: return the trimmed waveform on the DataPoint — only
    needed when a waveform-based speaker encoder (Resemblyzer) runs in the
    main process. The default drops it so a full-corpus run holds O(pool
    chunk) waveforms, not O(dataset) (~10 GB for LJSpeech at f32)."""

    def __init__(self, paths: Paths, config: Dict[str, Any],
                 text_dict: Dict[str, str],
                 keep_wav: bool = False) -> None:
        self.paths = paths
        self.config = config
        self.dsp = DSP.from_config(config)
        self.pitch_extractor = new_pitch_extractor_from_config(config)
        self.text_dict = text_dict
        self.keep_wav = keep_wav
        # the cleaner is constructed lazily per worker (espeak handles
        # don't fork well)
        self._cleaner: Optional[Cleaner] = None

    @property
    def cleaner(self) -> Cleaner:
        if self._cleaner is None:
            self._cleaner = Cleaner.from_config(self.config)
        return self._cleaner

    def __call__(self, wav_path: Union[str, Path]) -> Optional[DataPoint]:
        wav_path = Path(wav_path)
        item_id = wav_path.stem
        try:
            return self._convert_file(wav_path, item_id)
        except Exception as e:  # skip broken files (reference :74-76)
            print(f'preprocess: failed {item_id}: {e}')
            return None

    def _convert_file(self, wav_path: Path, item_id: str) -> DataPoint:
        dsp = self.dsp
        y = dsp.load_wav(wav_path)
        if dsp.should_trim_long_silences:
            y = dsp.trim_long_silences(y)
        if dsp.should_trim_start_end_silence:
            y = dsp.trim_silence(y)
        peak = np.abs(y).max() if len(y) else 0.0
        if dsp.should_peak_norm or peak > 1.0:
            y = y / max(peak, 1e-8) * 0.95

        mel = dsp.wav_to_mel(y)
        pitch = self.pitch_extractor(y).astype(np.float32)

        text = self.cleaner(self.text_dict[item_id])

        np.save(str(self.paths.mel / f'{item_id}.npy'), mel,
                allow_pickle=False)
        np.save(str(self.paths.raw_pitch / f'{item_id}.npy'), pitch,
                allow_pickle=False)
        return DataPoint(item_id=item_id, mel_len=mel.shape[-1],
                         text=text, speaker_name='',
                         wav=y if self.keep_wav else None)


def stratified_split(data: List[Tuple[str, int]],
                     speaker_dict: Dict[str, str],
                     n_val: int, seed: int
                     ) -> Tuple[List[Tuple[str, int]], List[Tuple[str, int]]]:
    """Per-speaker round-robin validation sampling with a seeded shuffle;
    val sorted longest-first (reference preprocess.py:194-211)."""
    speakers = sorted({speaker_dict[i] for i, _ in data})
    by_speaker: Dict[str, List[Tuple[str, int]]] = {s: [] for s in speakers}
    for item in data:
        by_speaker[speaker_dict[item[0]]].append(item)
    rng = Random(seed)
    for s in speakers:
        rng.shuffle(by_speaker[s])

    val: List[Tuple[str, int]] = []
    idx = 0
    while len(val) < min(n_val, len(data) - 1):
        progressed = False
        for s in speakers:
            if idx < len(by_speaker[s]) and len(val) < n_val:
                val.append(by_speaker[s][idx])
                progressed = True
        idx += 1
        if not progressed:
            break
    val_ids = {i for i, _ in val}
    train = [item for item in data if item[0] not in val_ids]
    rng.shuffle(train)
    val.sort(key=lambda x: -x[1])
    return train, val


def run_preprocessing(config: Dict[str, Any],
                      dataset_path: Union[str, Path],
                      metafile: Optional[str] = None,
                      n_workers: int = 4) -> Paths:
    """Full preprocessing pass (reference preprocess.py:112-229)."""
    paths = Paths.from_config(config)
    pre = config['preprocessing']
    audio_format = pre.get('audio_format', '.wav')

    wav_files = get_files(dataset_path, audio_format)
    text_dict, speaker_dict = read_metadata(
        Path(dataset_path), metafile or 'metadata.csv',
        pre['metafile_format'], n_workers=n_workers)

    wav_ids = {w.stem for w in wav_files}
    text_dict = {k: v for k, v in text_dict.items()
                 if k in wav_ids and len(v) >= pre.get('min_text_len', 2)}
    speaker_dict = {k: v for k, v in speaker_dict.items() if k in text_dict}
    wav_files = [w for w in wav_files if w.stem in text_dict]
    print(f'Preprocessing {len(wav_files)} wav files...')

    # decide the speaker encoder BEFORE the pool runs: only Resemblyzer
    # needs waveforms back from the workers; the mel-stats fallback embeds
    # from the saved mel, so workers drop the wav and the embedding pass
    # streams — peak memory is O(pool chunk) wavs instead of O(dataset)
    encoder = make_speaker_encoder(config['dsp']['num_mels'])
    needs_wav = encoder.__class__.__name__ == '_Resemblyzer'
    processor = Preprocessor(paths, config, text_dict, keep_wav=needs_wav)

    def finalize(p: Optional[DataPoint]) -> Optional[DataPoint]:
        """Embed the speaker as results stream out of the pool (main
        process, like the reference's VoiceEncoder pass) and release the
        waveform immediately."""
        if p is None:
            return None
        mel = np.load(str(paths.mel / f'{p.item_id}.npy'))
        if needs_wav and p.wav is not None:
            emb = encoder.embed(mel, wav=p.wav,
                                sample_rate=config['dsp']['sample_rate'])
        else:
            emb = encoder.embed(mel)
        np.save(str(paths.speaker_emb / f'{p.item_id}.npy'),
                emb.astype(np.float32), allow_pickle=False)
        p.wav = None
        return p

    if n_workers > 1:
        with ProcessPoolExecutor(max_workers=n_workers) as pool:
            points = [finalize(p)
                      for p in pool.map(processor, wav_files, chunksize=8)]
    else:
        points = [finalize(processor(w)) for w in wav_files]
    points = [p for p in points if p is not None]

    clean_text_dict = {p.item_id: p.text for p in points}
    data = [(p.item_id, p.mel_len) for p in points]
    train, val = stratified_split(data, speaker_dict,
                                  n_val=pre.get('n_val', 200),
                                  seed=pre.get('seed', 42))

    pickle_binary(clean_text_dict, paths.text_dict)
    pickle_binary({k: speaker_dict[k] for k, _ in data}, paths.speaker_dict)
    pickle_binary(train, paths.train_dataset)
    pickle_binary(val, paths.val_dataset)

    # mean L2-normalized embedding per speaker (reference :218-227)
    by_speaker: Dict[str, List[np.ndarray]] = {}
    for item_id, _ in data:
        emb = np.load(str(paths.speaker_emb / f'{item_id}.npy'))
        by_speaker.setdefault(speaker_dict[item_id], []).append(emb)
    for speaker, embs in by_speaker.items():
        mean = np.mean(np.stack(embs), axis=0)
        norm = np.linalg.norm(mean)
        if norm > 0:
            mean = mean / norm
        np.save(str(paths.mean_speaker_emb / f'{speaker}.npy'),
                mean.astype(np.float32), allow_pickle=False)

    print(f'Preprocessing done: {len(train)} train / {len(val)} val items.')
    return paths
