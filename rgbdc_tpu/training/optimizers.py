"""Dual optimizer: main Adam on all params except EB quantiles, aux Adam on
quantiles only (reference training/trainer.py:81-98 splits parameters by the
``.quantiles`` name suffix and steps two torch.optim.Adam instances).

Here both losses are summed and differentiated once — the aux loss
stop-gradients every weight except the quantiles and the RD loss has
structurally-zero quantile gradients (STE cancels the median term), so a
single combined gradient with per-path optimizer routing is exactly the
reference's two-backward scheme.  Gradient clipping (clip_max_norm=1.0)
applies to the main partition only, like the reference's clip on the RD
backward pass.
"""

from collections.abc import Callable
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def _label_params(params) -> dict:
    return jax.tree_util.tree_map_with_path(
        lambda path, _: "aux"
        if any(getattr(k, "key", None) == "quantiles" for k in path)
        else "main",
        params,
    )


def make_dual_optimizer(
    learning_rate,
    aux_learning_rate: float = 1e-3,
    clip_max_norm: float = 1.0,
    plateau: bool = False,
) -> optax.GradientTransformation:
    """learning_rate may be a float or an optax schedule.  plateau=True adds
    ReduceLROnPlateau semantics (reference --lr_scheduler plateau,
    trainer.py:100-106): the trainer feeds the validation loss into the
    optimizer state via ``plateau_value`` in update's extra args."""
    main_chain = []
    if clip_max_norm and clip_max_norm > 0:
        main_chain.append(optax.clip_by_global_norm(clip_max_norm))
    main_chain.append(optax.adam(learning_rate))
    if plateau:
        main_chain.append(scale_by_plateau())
    return optax.multi_transform(
        {"main": optax.chain(*main_chain), "aux": optax.adam(aux_learning_rate)},
        _label_params,
    )


class PlateauScaleState(NamedTuple):
    scale: jnp.ndarray


def scale_by_plateau() -> optax.GradientTransformation:
    """Multiply updates by a host-controlled LR scale.

    The plateau decision itself is NOT taken per step: the trainer runs
    :class:`ReduceLROnPlateau` once per epoch on the validation loss
    (reference trainer.py:200-201) and writes the resulting scale into this
    state with :func:`set_plateau_scale`."""

    def init(params):
        del params
        return PlateauScaleState(scale=jnp.asarray(1.0, jnp.float32))

    def update(updates, state, params=None, **extra):
        del params, extra
        updates = jax.tree.map(lambda u: u * state.scale, updates)
        return updates, state

    return optax.GradientTransformation(init, update)


def set_plateau_scale(opt_state, scale: float):
    """Return opt_state with every PlateauScaleState leaf set to ``scale``."""

    def walk(node):
        if isinstance(node, PlateauScaleState):
            return PlateauScaleState(scale=jnp.asarray(scale, jnp.float32))
        if isinstance(node, tuple):  # includes NamedTuples
            vals = [walk(v) for v in node]
            return type(node)(*vals) if hasattr(node, "_fields") else tuple(vals)
        if isinstance(node, list):
            return [walk(v) for v in node]
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(opt_state)


class ReduceLROnPlateau:
    """Host-side mirror of torch.optim.lr_scheduler.ReduceLROnPlateau("min")
    with torch defaults (factor=0.1, patience=10), stepped ONCE PER EPOCH
    with the validation loss (reference trainer.py:200-201).  ``step``
    returns the current LR scale to install via ``set_plateau_scale``.
    Non-finite losses are ignored (they never count as improvement or
    plateau evidence)."""

    def __init__(self, factor: float = 0.1, patience: int = 10,
                 threshold: float = 1e-4, min_scale: float = 1e-8):
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_scale = min_scale
        self.best = float("inf")
        self.num_bad_epochs = 0
        self.scale = 1.0

    def step(self, val_loss: float) -> float:
        import math

        if not math.isfinite(val_loss):
            return self.scale
        if val_loss < self.best * (1.0 - self.threshold):
            self.best = val_loss
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            self.scale = max(self.scale * self.factor, self.min_scale)
            self.num_bad_epochs = 0
        return self.scale


def multistep_lr(
    base_lr: float, total_epochs: int, steps_per_epoch: int, gamma: float = 0.1
) -> Callable:
    """MultiStepLR with milestones at 0.75 and 0.9 of training
    (reference training/trainer.py:100-106)."""
    m1 = int(total_epochs * 0.75) * steps_per_epoch
    m2 = int(total_epochs * 0.9) * steps_per_epoch
    return optax.piecewise_constant_schedule(
        base_lr, {m1: gamma, m2: gamma}
    )
