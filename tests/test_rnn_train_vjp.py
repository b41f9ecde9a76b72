"""Custom-VJP Pallas RNN cores vs the lax.scan reference formulation.

Runs the kernels in interpret mode on CPU (f32 for tight tolerances) and
checks both the forward values and every gradient (input + all gate weights)
against jax.grad of models.layers._bidir_scan — the formulation that is
itself parity-tested against torch nn.LSTM/nn.GRU.
"""

import unittest

import jax
import jax.numpy as jnp
import numpy as np

from forwardtacotron_tpu.models.layers import (_bidir_scan, _gru_step,
                                               _lstm_step)
from forwardtacotron_tpu.ops.pallas.rnn_train import bidir_rnn_trainable

B, T, I, H = 5, 11, 32, 128


def make_params(rs, n_gates):
    g = n_gates * H
    scale = 0.3
    return tuple(jnp.asarray(rs.uniform(-scale, scale, shape), jnp.float32)
                 for shape in ((I, g), (H, g), (g,), (g,)))


class TestRnnTrainVjp(unittest.TestCase):

    def _check(self, cell, step_fn, n_carry, n_gates, with_lengths):
        rs = np.random.RandomState(0 if cell == 'gru' else 1)
        x = jnp.asarray(rs.randn(B, T, I), jnp.float32)
        lengths = (jnp.asarray([T, 3, 7, 1, T - 1]) if with_lengths
                   else None)
        fwd = make_params(rs, n_gates)
        bwd = make_params(rs, n_gates)
        w_out = jnp.asarray(rs.randn(B, T, 2 * H), jnp.float32)

        def loss_ref(x, fwd, bwd):
            out = _bidir_scan(x, lengths, fwd, bwd, step_fn, H, n_carry)
            return jnp.sum(out * w_out), out

        def loss_pl(x, fwd, bwd):
            out = bidir_rnn_trainable(x, lengths, fwd, bwd, H, cell,
                                      interpret=True)
            return jnp.sum(out * w_out), out

        (l_ref, out_ref), g_ref = jax.value_and_grad(
            loss_ref, argnums=(0, 1, 2), has_aux=True)(x, fwd, bwd)
        (l_pl, out_pl), g_pl = jax.value_and_grad(
            loss_pl, argnums=(0, 1, 2), has_aux=True)(x, fwd, bwd)

        np.testing.assert_allclose(out_pl, out_ref, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(l_pl, l_ref, rtol=1e-5)
        for got, want, name in ((g_pl[0], g_ref[0], 'dx'),):
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4,
                                       err_msg=name)
        for d, (got_d, want_d) in enumerate(zip(g_pl[1:], g_ref[1:])):
            for got, want, name in zip(got_d, want_d,
                                       ('wi', 'wh', 'bi', 'bh')):
                np.testing.assert_allclose(
                    got, want, rtol=1e-4, atol=1e-4,
                    err_msg=f'{cell} dir{d} d{name}')

    def test_gru_full_lengths(self):
        self._check('gru', _gru_step, 1, 3, with_lengths=False)

    def test_gru_varlen(self):
        self._check('gru', _gru_step, 1, 3, with_lengths=True)

    def test_lstm_full_lengths(self):
        self._check('lstm', _lstm_step, 2, 4, with_lengths=False)

    def test_lstm_varlen(self):
        self._check('lstm', _lstm_step, 2, 4, with_lengths=True)


class TestRnnTrainSharded(unittest.TestCase):
    """shard_map'd trainable cores over the 8-device CPU mesh: the batch is
    split over 'data', weights replicated; the weight gradients must match
    the unsharded formulation exactly up to float tolerance (shard_map's
    transpose supplies the cross-device psum — the DP grad all-reduce)."""

    def _check(self, cell, step_fn, n_carry, n_gates):
        from forwardtacotron_tpu.ops.pallas.rnn_train import \
            bidir_rnn_trainable_sharded
        from forwardtacotron_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_data=8)
        b = 16  # 2 per shard, padded to the 16-row tile inside the kernel
        rs = np.random.RandomState(7)
        x = jnp.asarray(rs.randn(b, T, I), jnp.float32)
        lengths = jnp.asarray(rs.randint(1, T + 1, (b,)))
        fwd = make_params(rs, n_gates)
        bwd = make_params(rs, n_gates)
        w_out = jnp.asarray(rs.randn(b, T, 2 * H), jnp.float32)

        def loss_ref(x, fwd, bwd):
            out = _bidir_scan(x, lengths, fwd, bwd, step_fn, H, n_carry)
            return jnp.sum(out * w_out), out

        @jax.jit
        def loss_sharded_grads(x, fwd, bwd):
            def loss(x, fwd, bwd):
                out = bidir_rnn_trainable_sharded(
                    x, lengths, fwd, bwd, H, cell, interpret=True,
                    mesh=mesh, data_axis='data')
                return jnp.sum(out * w_out), out
            return jax.value_and_grad(loss, argnums=(0, 1, 2),
                                      has_aux=True)(x, fwd, bwd)

        (l_ref, out_ref), g_ref = jax.value_and_grad(
            loss_ref, argnums=(0, 1, 2), has_aux=True)(x, fwd, bwd)
        (l_pl, out_pl), g_pl = loss_sharded_grads(x, fwd, bwd)

        np.testing.assert_allclose(out_pl, out_ref, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(l_pl, l_ref, rtol=1e-5)
        np.testing.assert_allclose(g_pl[0], g_ref[0], rtol=1e-4, atol=1e-4,
                                   err_msg='dx')
        for d, (got_d, want_d) in enumerate(zip(g_pl[1:], g_ref[1:])):
            for got, want, name in zip(got_d, want_d,
                                       ('wi', 'wh', 'bi', 'bh')):
                np.testing.assert_allclose(
                    got, want, rtol=1e-4, atol=1e-4,
                    err_msg=f'{cell} dir{d} d{name}')

    def test_gru_sharded(self):
        self._check('gru', _gru_step, 1, 3)

    def test_lstm_sharded(self):
        self._check('lstm', _lstm_step, 2, 4)


if __name__ == '__main__':
    unittest.main()
