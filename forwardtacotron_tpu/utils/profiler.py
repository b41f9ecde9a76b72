"""Profiling and throughput observability.

The reference's only instrumentation is wall-clock steps/s
(trainer/forward_trainer.py:70,106-112). TPU builds need more: this module
wraps ``jax.profiler`` traces (viewable in TensorBoard / Perfetto) and adds
audio-domain throughput counters (frames/s, audio-seconds/s, tokens/s)
suitable for both trainers and the synthesis path.
"""

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True) -> Iterator[None]:
    """Capture a jax.profiler trace into ``log_dir`` for the enclosed block.

    View with TensorBoard's profile plugin or Perfetto.
    """
    if not enabled:
        yield
        return
    import jax
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside a trace (TraceAnnotation)."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield


@dataclass
class ThroughputMeter:
    """Accumulates work counters between ``report`` calls."""
    hop_length: int = 256
    sample_rate: int = 22050
    _t0: float = field(default_factory=time.time)
    _frames: int = 0
    _tokens: int = 0
    _steps: int = 0

    def add(self, frames: int = 0, tokens: int = 0, steps: int = 1) -> None:
        self._frames += frames
        self._tokens += tokens
        self._steps += steps

    def report(self, reset: bool = True) -> Dict[str, float]:
        elapsed = max(time.time() - self._t0, 1e-9)
        out = {
            'steps_per_s': self._steps / elapsed,
            'frames_per_s': self._frames / elapsed,
            'tokens_per_s': self._tokens / elapsed,
            'audio_seconds_per_s':
                self._frames * self.hop_length / self.sample_rate / elapsed,
        }
        if reset:
            self._t0 = time.time()
            self._frames = self._tokens = self._steps = 0
        return out


def device_memory_stats() -> Optional[Dict[str, int]]:
    """Live/peak HBM bytes on the first device, when the backend reports it."""
    import jax
    try:
        stats = jax.local_devices()[0].memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    return {k: int(v) for k, v in stats.items()
            if k in ('bytes_in_use', 'peak_bytes_in_use', 'bytes_limit')}
