"""Worker + shared step logic for the 2-process distributed bootstrap test.

Run as a script inside each subprocess of tests/test_multiprocess.py:
``python tests/distributed_worker.py <out.json>`` with
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID set. The test
also imports :func:`run_one_step` in-process to produce the single-process
reference result the multi-process run must match.

The reference has no distributed runtime at all (SURVEY.md §2.7 — no
torch.distributed anywhere); this exercises the TPU-native multi-host path:
``jax.distributed.initialize`` from env, a mesh over all global devices,
``jax.make_array_from_process_local_data`` for host-local batch shards, and
one jitted ForwardTrainer step whose gradient all-reduce spans processes.
"""

import json
import os
import sys
import tempfile

# Must happen before any JAX computation: the container may pin a TPU relay
# platform; the distributed test runs on the CPU backend.
os.environ.setdefault('JAX_PLATFORMS', 'cpu')

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

GLOBAL_BATCH = 8
N_TOKENS = 8
N_FRAMES = 24


def make_global_batch(n_mels: int):
    """Deterministic synthetic batch, identical in every process."""
    import numpy as np
    from forwardtacotron_tpu.data.dataset import PAD_VALUE

    rs = np.random.RandomState(0)
    b, n, t = GLOBAL_BATCH, N_TOKENS, N_FRAMES
    return {
        'x': rs.randint(1, 100, (b, n)).astype(np.int64),
        'dur': np.full((b, n), 3.0, np.float32),
        'x_len': np.full((b,), n, np.int64),
        'mel_len': np.full((b,), t, np.int64),
        'pitch': rs.randn(b, n).astype(np.float32),
        'energy': rs.rand(b, n).astype(np.float32),
        'pitch_target': rs.randn(b, n).astype(np.float32),
        'energy_target': rs.rand(b, n).astype(np.float32),
        'mel': np.full((b, t, n_mels), PAD_VALUE, np.float32)
        + rs.randn(b, t, n_mels).astype(np.float32),
    }


def run_one_step(mesh) -> dict:
    """Build the tiny ForwardTacotron, take ONE jitted train step on the
    mesh, and return {'loss', 'param_fingerprint'}. In a multi-process run
    each process feeds only its local slice of the global batch
    (shard_batch routes through make_array_from_process_local_data)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from forwardtacotron_tpu.dsp.dsp import DSP
    from forwardtacotron_tpu.models.registry import init_tts_model
    from forwardtacotron_tpu.parallel.mesh import (DATA_AXIS, replicate_tree,
                                                   shard_batch)
    from forwardtacotron_tpu.train.forward_trainer import ForwardTrainer
    from forwardtacotron_tpu.train.state import create_train_state
    from forwardtacotron_tpu.utils.files import read_config
    from forwardtacotron_tpu.utils.paths import Paths

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    config = read_config(os.path.join(repo_root,
                                      'tests/resources/test_config.yaml'))
    tmp = tempfile.mkdtemp(prefix='ftt_mp_')
    config['data_path'] = f'{tmp}/data'
    config['checkpoint_path'] = f'{tmp}/ckpt'
    paths = Paths.from_config(config)

    model = init_tts_model(config)
    batch = make_global_batch(config['dsp']['num_mels'])

    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)},
                           batch, train=False)
    variables = jax.device_get(variables)  # host copy, identical everywhere

    trainer = ForwardTrainer(paths, DSP.from_config(config), config,
                             mesh=mesh)
    state = create_train_state(variables, trainer.tx)
    state = replicate_tree(jax.device_get(state), mesh)
    step_fn = trainer._get_train_step(model)

    # each process contributes its local rows of the global batch
    n_proc, pid = jax.process_count(), jax.process_index()
    rows = GLOBAL_BATCH // n_proc
    local = {k: v[pid * rows:(pid + 1) * rows] for k, v in batch.items()}
    device_batch = shard_batch(local, mesh)
    for key, value in device_batch.items():
        assert value.shape[0] == GLOBAL_BATCH, \
            f'{key}: global shape lost, got {value.shape}'

    state, metrics = step_fn(state, device_batch, jax.random.PRNGKey(0))

    fingerprint = jax.jit(
        lambda params: jax.tree.reduce(
            lambda a, b: a + b,
            jax.tree.map(lambda p: jnp.sum(jnp.abs(p.astype(jnp.float32))),
                         params)))(state.params)
    return {
        'loss': float(metrics['loss']),
        'param_fingerprint': float(fingerprint),
        'process_count': int(jax.process_count()),
        'n_devices': int(jax.device_count()),
        'data_axis_size': int(mesh.shape[DATA_AXIS]),
        'step': int(np.asarray(state.step)),
    }


def main() -> None:
    out_path = sys.argv[1]

    import jax
    jax.config.update('jax_platforms', 'cpu')

    from forwardtacotron_tpu.parallel.mesh import (initialize_distributed,
                                                   make_mesh)
    assert initialize_distributed(), 'JAX_COORDINATOR_ADDRESS must be set'
    assert initialize_distributed(), 'second call must be a safe no-op'
    assert jax.process_count() == int(os.environ['JAX_NUM_PROCESSES'])

    mesh = make_mesh()  # all global devices on the data axis
    result = run_one_step(mesh)
    with open(out_path, 'w') as f:
        json.dump(result, f)
    print(f'worker {jax.process_index()} OK: {result}')


if __name__ == '__main__':
    main()
