"""Core differentiable rounding / bounding primitives.

TPU-native equivalents of the reference's custom autograd ops:
  - ste_round      ~ CompressAI/compressai/ops/ops.py:18-32
  - lower_bound    ~ CompressAI/compressai/ops/bound_ops.py:19-53
"""

from functools import partial

import jax
import jax.numpy as jnp


def ste_round(x: jax.Array) -> jax.Array:
    """Round with a straight-through (identity) gradient."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def quantize_ste(x: jax.Array, means: jax.Array | None = None) -> jax.Array:
    """`ste_round(x - means) + means` — the reference's "ste" quant path."""
    if means is None:
        return ste_round(x)
    return ste_round(x - means) + means


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def lower_bound(x: jax.Array, bound: float) -> jax.Array:
    """max(x, bound) with a pass-through-if-moving-toward-bound gradient.

    The gradient is identity where ``x >= bound`` or where the incoming
    cotangent would push x *up* toward the bound (``g < 0`` under
    gradient-descent conventions), zero elsewhere.
    """
    return jnp.maximum(x, bound)


def _lower_bound_fwd(x, bound):
    return jnp.maximum(x, bound), x


def _lower_bound_bwd(bound, x, g):
    pass_through = (x >= bound) | (g < 0)
    return (jnp.where(pass_through, g, 0.0),)


lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)


def exact_gelu(x):
    """erf-form GELU (torch nn.GELU default, approximate='none').

    jax.nn.gelu defaults to the tanh approximation, which differs from the
    reference at the 1e-3 level — enough to break golden weight parity."""
    import jax

    return jax.nn.gelu(x, approximate=False)
