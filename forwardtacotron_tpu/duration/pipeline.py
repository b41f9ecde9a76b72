"""Teacher -> student bridge: batched attention extraction + parallel
duration extraction.

Re-design of reference duration_extraction/duration_extraction_pipe.py:
  * Phase A ``extract_attentions`` (:88-127): equal-token-length batches from
    the binned loader run through the jitted Tacotron teacher-forced forward
    at r=1 with the decoder PreNet's dropout forced ON (train_tacotron.py
    :120); attention matrices are cropped to (mel_len, x_len) and saved.
    Equal-length batches double as XLA shape classes — each bin compiles
    once.
  * Phase B ``extract_durations`` (:129-194): the Dijkstra/DP extraction is
    a host-side graph algorithm, parallelized with a process pool over items
    (the reference smuggled it into DataLoader workers); emits per-item
    DurationStats and int duration arrays.
"""

import warnings
from concurrent.futures import ProcessPoolExecutor
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import numpy as np

from forwardtacotron_tpu.data.dataset import (DurationStats,
                                              get_binned_taco_dataloader)
from forwardtacotron_tpu.duration.extractor import DurationExtractor
from forwardtacotron_tpu.text.tokenizer import Tokenizer
from forwardtacotron_tpu.utils.files import unpickle_binary
from forwardtacotron_tpu.utils.metrics import attention_score
from forwardtacotron_tpu.utils.paths import Paths


@dataclass
class DurationResult:
    item_id: str
    att_score: float
    align_score: float
    durations: np.ndarray


def max_consecutive_ones(durations: np.ndarray) -> int:
    best = run = 0
    for d in durations:
        run = run + 1 if d == 1 else 0
        best = max(best, run)
    return best


# module-level worker so ProcessPoolExecutor can pickle it
_WORKER_STATE: Dict[str, Any] = {}


def _init_worker(paths_data: str, text_dict, silence_threshold: float,
                 silence_prob_shift: float) -> None:
    _WORKER_STATE['paths_data'] = paths_data
    _WORKER_STATE['text_dict'] = text_dict
    _WORKER_STATE['tokenizer'] = Tokenizer()
    _WORKER_STATE['extractor'] = DurationExtractor(
        silence_threshold=silence_threshold,
        silence_prob_shift=silence_prob_shift)


def _extract_one(item_id: str) -> Optional[DurationResult]:
    from pathlib import Path
    data = Path(_WORKER_STATE['paths_data'])
    tokenizer = _WORKER_STATE['tokenizer']
    extractor = _WORKER_STATE['extractor']
    text = _WORKER_STATE['text_dict'][item_id]

    x = np.asarray(tokenizer(text))
    mel = np.load(str(data / 'mel' / f'{item_id}.npy'))
    attention = np.load(str(data / 'att_pred' / f'{item_id}.npy'))
    mel_len = mel.shape[-1]

    align_score, _ = attention_score(attention[None, ...],
                                     np.array([mel_len]), r=1)
    durations, att_score = extractor(x, mel, attention)
    if durations.sum() != mel_len:
        warnings.warn(f'Sum of durations != mel length for {item_id}')
    np.save(str(data / 'alg' / f'{item_id}.npy'),
            durations.astype(np.int64), allow_pickle=False)
    return DurationResult(item_id=item_id, att_score=float(att_score),
                          align_score=float(align_score[0]),
                          durations=durations)


class DurationExtractionPipeline:

    def __init__(self, paths: Paths, config: Dict[str, Any],
                 duration_extractor: DurationExtractor) -> None:
        self.paths = paths
        self.config = config
        self.duration_extractor = duration_extractor

    def extract_attentions(self, model, variables,
                           max_batch_size: int = 32,
                           seed: int = 42) -> float:
        """Run the teacher over the whole dataset and save per-item attention
        matrices; returns the mean sharpness score."""
        import jax

        loader = get_binned_taco_dataloader(self.paths, max_batch_size)
        jitted = {}

        def get_fn(shape):
            fn = jitted.get(shape)
            if fn is None:
                def run(variables, batch, rng):
                    _, _, attn = model.apply(
                        variables, batch, r=1, train=False,
                        prenet_dropout_on=True,
                        rngs={'dropout': rng})
                    return attn
                fn = jax.jit(run)
                jitted[shape] = fn
            return fn

        rng = jax.random.PRNGKey(seed)
        sum_score, n_items = 0.0, 0
        for batch in loader:
            device_batch = {'x': batch['x'], 'mel': batch['mel'],
                            'speaker_emb': batch['speaker_emb']}
            shape = (batch['x'].shape, batch['mel'].shape)
            rng, sub = jax.random.split(rng)
            attn = np.asarray(get_fn(shape)(variables, device_batch, sub))
            _, sharp = attention_score(attn, batch['mel_len'], r=1)
            sum_score += float(sharp.sum())
            n_items += len(sharp)
            for b, item_id in enumerate(batch['item_id']):
                mel_len = int(batch['mel_len'][b])
                x_len = int(batch['x_len'][b])
                np.save(str(self.paths.att_pred / f'{item_id}.npy'),
                        attn[b, :mel_len, :x_len], allow_pickle=False)
        return sum_score / max(n_items, 1)

    def extract_durations(self, num_workers: int = 0,
                          sampler_bin_size: int = 1
                          ) -> Dict[str, DurationStats]:
        """Extract durations from the saved attention matrices; saves
        ``alg/{id}.npy`` int durations and returns per-item DurationStats."""
        dataset = (unpickle_binary(self.paths.train_dataset)
                   + unpickle_binary(self.paths.val_dataset))
        text_dict = unpickle_binary(self.paths.text_dict)
        items = [item_id for item_id, _ in dataset
                 if (self.paths.att_pred / f'{item_id}.npy').is_file()]

        init_args = (str(self.paths.data), text_dict,
                     self.duration_extractor.silence_threshold,
                     self.duration_extractor.silence_prob_shift)

        results = []
        if num_workers and num_workers > 1:
            import multiprocessing
            # spawn: forking after the JAX runtime started its thread pools
            # can deadlock the children
            ctx = multiprocessing.get_context('spawn')
            with ProcessPoolExecutor(max_workers=num_workers,
                                     mp_context=ctx,
                                     initializer=_init_worker,
                                     initargs=init_args) as pool:
                results = list(pool.map(_extract_one, items, chunksize=4))
        else:
            _init_worker(*init_args)
            results = [_extract_one(i) for i in items]

        stats = {}
        for res in results:
            if res is None:
                continue
            stats[res.item_id] = DurationStats(
                att_sharpness_score=res.att_score,
                att_align_score=res.align_score,
                max_consecutive_ones=max_consecutive_ones(res.durations),
                max_duration=int(np.max(res.durations)))
        return stats
