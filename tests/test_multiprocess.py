"""Multi-process distributed runtime test (SURVEY.md §2.7 commitment).

Launches TWO real OS processes on the CPU backend with a local coordinator,
each holding 2 XLA host devices (a 4-device global mesh), runs
``initialize_distributed()`` (env-driven bootstrap, parallel/mesh.py),
feeds host-local batch shards via ``shard_batch`` /
``jax.make_array_from_process_local_data``, and takes one jitted
ForwardTrainer step. The resulting loss and post-step parameter fingerprint
must match a single-process run of the identical global batch on a 4-device
mesh — i.e. the cross-process gradient all-reduce is numerically the
single-process one.
"""

import importlib.util
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
WORKER = REPO_ROOT / 'tests' / 'distributed_worker.py'


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        return s.getsockname()[1]


def _load_worker_module():
    spec = importlib.util.spec_from_file_location('distributed_worker',
                                                  WORKER)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


@pytest.mark.slow
@pytest.mark.parametrize('n_procs', [2, 4])
def test_multi_process_train_step_matches_single_process(tmp_path, n_procs):
    """N real OS processes (2 host devices each) vs a single-process run of
    the identical global batch on a mesh of the same global size — the
    cross-process gradient all-reduce must be numerically the
    single-process one. n_procs=4 is the strongest coordinator-scaling
    check a single machine allows (VERDICT r3 item 9)."""
    port = _free_port()
    outs = [tmp_path / f'worker{i}.json' for i in range(n_procs)]
    procs = []
    for pid in range(n_procs):
        env = os.environ.copy()
        env.update({
            'JAX_PLATFORMS': 'cpu',
            'JAX_COORDINATOR_ADDRESS': f'127.0.0.1:{port}',
            'JAX_NUM_PROCESSES': str(n_procs),
            'JAX_PROCESS_ID': str(pid),
            'XLA_FLAGS': '--xla_force_host_platform_device_count=2',
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(WORKER), str(outs[pid])],
            env=env, cwd=str(REPO_ROOT),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f'worker failed:\n{log}'

    results = [json.loads(o.read_text()) for o in outs]
    n_global = 2 * n_procs
    for result in results:
        assert result['process_count'] == n_procs
        assert result['n_devices'] == n_global
        assert result['data_axis_size'] == n_global
        assert result['step'] == 1
    # every process observes the same replicated outcome
    for result in results[1:]:
        assert results[0]['loss'] == pytest.approx(result['loss'], rel=1e-6)

    # single-process reference: same global batch, same global mesh shape
    worker = _load_worker_module()
    from forwardtacotron_tpu.parallel.mesh import make_mesh
    ref = worker.run_one_step(make_mesh(n_data=n_global))

    np.testing.assert_allclose(results[0]['loss'], ref['loss'],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(results[0]['param_fingerprint'],
                               ref['param_fingerprint'], rtol=1e-5)
