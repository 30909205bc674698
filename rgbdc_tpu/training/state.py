"""Train state + jittable train/eval steps (DP-ready).

The reference's per-batch procedure (training/trainer_single.py:37-64):
RD forward/backward, grad-clip 1.0, main Adam step, then aux loss
backward + aux Adam step.  Here it is ONE jitted function: combined
RD + aux gradient (exact — see optimizers.py), dual-routed optimizer,
metrics out.  Under a batch-sharded input the same jit runs data-parallel;
XLA inserts the psum over ICI.
"""

from collections.abc import Callable
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    pass


def create_train_state(model, rng, example_batch, tx) -> TrainState:
    """example_batch: tuple of model inputs (x,) or (rgb, depth)."""
    params_rng, noise_rng = jax.random.split(rng)
    variables = model.init(
        {"params": params_rng, "noise": noise_rng}, *example_batch, training=True
    )
    return TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx
    )


def make_train_step(model, loss_fn: Callable, donate: bool = True,
                    plateau: bool = False):
    """loss_fn(output, *batch, *extra) -> dict with 'loss'.

    plateau is accepted for API symmetry with make_dual_optimizer; the
    plateau LR decision itself happens once per epoch in the trainer
    (optimizers.ReduceLROnPlateau + set_plateau_scale), not per step.
    Returns step(state, batch, rng, *extra) -> (state, metrics).

    ``extra`` (optional, e.g. the RD lambda as a jnp scalar) is traced, so
    one compiled step serves every value — a loss closing over a python
    lambda bakes it into the HLO as a constant and misses the compile
    cache at every grid point (tools/train_rd_queue.sh pain point, r4).
    """
    del plateau

    def step(state: TrainState, batch, rng, *extra):
        def total_loss(params):
            out = model.apply(
                {"params": params}, *batch, training=True, rngs={"noise": rng}
            )
            rd = loss_fn(out, *batch, *extra)
            aux = model.apply({"params": params}, method=type(model).aux_loss)
            return rd["loss"] + aux, (rd, aux)

        (_, (rd, aux)), grads = jax.value_and_grad(total_loss, has_aux=True)(
            state.params
        )
        # NaN guard: a divergent batch (inf/nan loss or grads) is skipped as
        # a TRUE no-op — params and optimizer state (incl. Adam moments) are
        # kept verbatim, so momentum cannot leak a nonzero update.  This is
        # the framework's failure-detection story for training (the
        # reference has none, SURVEY §5).
        grad_norm = optax.global_norm(grads)
        finite = jnp.isfinite(rd["loss"]) & jnp.isfinite(grad_norm)
        updates, new_opt_state = state.tx.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        keep = lambda new, old: jnp.where(finite, new, old)  # noqa: E731
        new_params = jax.tree.map(keep, new_params, state.params)
        new_opt_state = jax.tree.map(keep, new_opt_state, state.opt_state)
        state = state.replace(
            step=state.step + 1, params=new_params, opt_state=new_opt_state
        )
        metrics = {k: v for k, v in rd.items()}
        metrics["aux_loss"] = aux
        metrics["grad_norm"] = grad_norm
        metrics["step_skipped"] = 1.0 - finite.astype(jnp.float32)
        return state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, loss_fn: Callable):
    def step(params, batch):
        out = model.apply({"params": params}, *batch, training=False)
        rd = loss_fn(out, *batch)
        return rd, out

    return jax.jit(step)


# convenience aliases used by tests / entry points
def train_step(state, batch, rng, *, model, loss_fn):
    return make_train_step(model, loss_fn, donate=False)(state, batch, rng)


def eval_step(params, batch, *, model, loss_fn):
    return make_eval_step(model, loss_fn)(params, batch)
