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

import jax
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
        main_chain.append(
            optax.contrib.reduce_on_plateau(factor=0.3, patience=4, cooldown=0)
        )
    return optax.multi_transform(
        {"main": optax.chain(*main_chain), "aux": optax.adam(aux_learning_rate)},
        _label_params,
    )


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
