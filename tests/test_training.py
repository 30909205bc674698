import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbdc_tpu.models import ELIC
from rgbdc_tpu.parallel import get_mesh, replicate, shard_batch
from rgbdc_tpu.training import (
    LAMBDAS,
    create_train_state,
    lambdas_from_fraction_q,
    make_dual_optimizer,
    multistep_lr,
    rate_distortion_loss_single,
)
from rgbdc_tpu.training.state import make_train_step

TINY = dict(N=16, M=24, slice_ch=(4, 4, 16), in_ch=3)


def _setup(batch=2, size=64):
    model = ELIC(**TINY)
    tx = make_dual_optimizer(1e-4)
    x = jnp.zeros((batch, size, size, 3))
    state = create_train_state(model, jax.random.PRNGKey(0), (x,), tx)
    return model, state


class TestLosses:
    def test_lambda_tables(self):
        assert LAMBDAS[2] == 0.0067
        r, d = lambdas_from_fraction_q("2_2")
        assert r == d == LAMBDAS[2]
        r, d = lambdas_from_fraction_q("2.5_1.5")
        assert r == (LAMBDAS[2] + LAMBDAS[3]) / 2
        assert d == (LAMBDAS[1] + LAMBDAS[2]) / 2

    def test_single_loss_values(self, rng):
        x_hat = jnp.asarray(rng.uniform(size=(1, 16, 16, 3)), dtype=jnp.float32)
        target = x_hat + 0.1
        lik = jnp.full((1, 4, 4, 8), 0.5)
        out = {"x_hat": x_hat, "likelihoods": {"y": lik}}
        loss = rate_distortion_loss_single(out, target, lmbda=0.013)
        # bpp: 8*16 symbols at p=.5 -> 128 bits over 256 px = 0.5 bpp
        np.testing.assert_allclose(float(loss["bpp_loss"]), 0.5, rtol=1e-5)
        np.testing.assert_allclose(float(loss["mse_loss"]), 0.01, rtol=1e-4)


class TestDualOptimizer:
    def test_quantiles_only_updated_by_aux(self):
        model, state = _setup()
        x = jnp.asarray(
            np.random.default_rng(0).uniform(size=(2, 64, 64, 3)), dtype=jnp.float32
        )
        step = make_train_step(
            model,
            lambda out, x: rate_distortion_loss_single(out, x, LAMBDAS[2]),
            donate=False,
        )
        new_state, metrics = step(state, (x,), jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        assert np.isfinite(float(metrics["aux_loss"]))
        # every param partition moved
        q0 = state.params["entropy_bottleneck"]["quantiles"]
        q1 = new_state.params["entropy_bottleneck"]["quantiles"]
        assert np.abs(np.asarray(q1 - q0)).max() > 0

    def test_loss_decreases_overfit(self):
        # a few steps on one batch should reduce the loss (smoke-level sanity)
        model, state = _setup()
        x = jnp.asarray(
            np.random.default_rng(1).uniform(size=(2, 64, 64, 3)), dtype=jnp.float32
        )
        step = make_train_step(
            model,
            lambda out, x: rate_distortion_loss_single(out, x, LAMBDAS[2]),
            donate=False,
        )
        losses = []
        for i in range(8):
            state, m = step(state, (x,), jax.random.PRNGKey(i))
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]

    def test_plateau_optimizer_runs(self):
        model, _ = _setup()
        tx = make_dual_optimizer(1e-4, plateau=True)
        x0 = jnp.zeros((2, 64, 64, 3))
        state = create_train_state(model, jax.random.PRNGKey(0), (x0,), tx)
        step = make_train_step(
            model,
            lambda out, x: rate_distortion_loss_single(out, x, LAMBDAS[2]),
            donate=False,
            plateau=True,
        )
        x = jnp.asarray(
            np.random.default_rng(5).uniform(size=(2, 64, 64, 3)), dtype=jnp.float32
        )
        state2, m = step(state, (x,), jax.random.PRNGKey(1))
        assert np.isfinite(float(m["loss"]))
        assert int(state2.step) == 1

    def test_multistep_schedule(self):
        sched = multistep_lr(1e-4, total_epochs=100, steps_per_epoch=10, gamma=0.1)
        assert np.isclose(sched(0), 1e-4)
        assert np.isclose(sched(751), 1e-5)
        assert np.isclose(sched(901), 1e-6)


class TestDataParallel:
    @pytest.mark.full
    def test_dp_train_step_matches_single_device(self):
        """8-device virtual mesh: batch sharded, params replicated; the
        same jitted step runs DP (XLA inserts the grad psum) and matches
        the single-device loss."""
        mesh = get_mesh()
        assert mesh.devices.size == 8
        model = ELIC(N=8, M=12, slice_ch=(4, 8), in_ch=3)  # input must be x64
        tx = make_dual_optimizer(1e-4)
        x0 = jnp.zeros((8, 64, 64, 3))
        state0 = create_train_state(model, jax.random.PRNGKey(0), (x0,), tx)
        x = jnp.asarray(
            np.random.default_rng(3).uniform(size=(8, 64, 64, 3)), dtype=jnp.float32
        )
        step = make_train_step(
            model,
            lambda out, x: rate_distortion_loss_single(out, x, LAMBDAS[2]),
            donate=False,
        )
        _, m_single = step(state0, (x,), jax.random.PRNGKey(0))

        state_r = replicate(mesh, state0)
        (x_s,) = shard_batch(mesh, (x,))
        _, m_dp = step(state_r, (x_s,), jax.random.PRNGKey(0))
        np.testing.assert_allclose(
            float(m_single["loss"]), float(m_dp["loss"]), rtol=2e-4
        )
