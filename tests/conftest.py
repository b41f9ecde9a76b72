"""Test configuration: force JAX onto a virtual 8-device CPU backend.

Multi-chip TPU hardware is unavailable in CI; sharding/pjit tests run on
``--xla_force_host_platform_device_count=8`` CPU devices instead, which
exercises the same Mesh/NamedSharding/collective code paths.
"""

import os
import sys
from pathlib import Path

# The container's sitecustomize pre-imports jax and pins JAX_PLATFORMS=axon
# (remote TPU relay), so plain env vars are too late; jax.config.update wins
# as long as no jax computation has run yet.
os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

# Reference repo (read-only) used as a numerical oracle in parity tests.
REFERENCE_ROOT = Path('/root/reference')


def reference_available() -> bool:
    return (REFERENCE_ROOT / 'models').is_dir()
