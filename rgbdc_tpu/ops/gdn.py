"""Generalized Divisive Normalization, NHWC, MXU-friendly.

Behavioral spec from the reference's GDN
(CompressAI/compressai/layers/gdn.py:22-96 and ops/parametrizers.py:21-45):

  y[i] = x[i] / sqrt(beta[i] + sum_j gamma[j->i] * x[j]^2)      (forward)
  y[i] = x[i] * sqrt(beta[i] + sum_j gamma[j->i] * x[j]^2)      (inverse)

The reference realizes the channel mixing as a 1x1 conv2d on x^2; here it is
a single channels-last matmul that XLA tiles straight onto the MXU and fuses
with the surrounding elementwise ops.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from .math import lower_bound

_REPARAM_OFFSET = 2.0**-18
_PEDESTAL = _REPARAM_OFFSET**2


def _nonneg_init(x):
    """sqrt-reparam initialization: stored value whose reparam() equals x."""
    return jnp.sqrt(jnp.maximum(x + _PEDESTAL, _PEDESTAL))


def _nonneg(x, minimum: float = 0.0):
    """sqrt reparameterization with a lower-bounded stored value."""
    bound = (minimum + _PEDESTAL) ** 0.5
    out = lower_bound(x, bound)
    return out * out - _PEDESTAL


class GDN1(nn.Module):
    """Simplified GDN (Johnston 2019, reference gdn.py:70-96):
    y[i] = x[i] / (beta[i] + sum_j gamma[j->i] |x[j]|)."""

    channels: int
    inverse: bool = False
    beta_min: float = 1e-6
    gamma_init: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.channels
        beta = self.param("beta", lambda rng: _nonneg_init(jnp.ones((c,))))
        gamma = self.param(
            "gamma", lambda rng: _nonneg_init(self.gamma_init * jnp.eye(c))
        )
        beta = _nonneg(beta, self.beta_min)
        gamma = _nonneg(gamma)
        norm = jnp.einsum(
            "...j,ij->...i", jnp.abs(x), gamma, preferred_element_type=jnp.float32
        ) + beta
        if self.inverse:
            return x * norm
        return x / norm


class GDN(nn.Module):
    """GDN / IGDN over the channel (last) axis of an NHWC tensor."""

    channels: int
    inverse: bool = False
    beta_min: float = 1e-6
    gamma_init: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.channels
        beta = self.param("beta", lambda rng: _nonneg_init(jnp.ones((c,))))
        gamma = self.param(
            "gamma", lambda rng: _nonneg_init(self.gamma_init * jnp.eye(c))
        )
        beta = _nonneg(beta, self.beta_min)
        gamma = _nonneg(gamma)
        # out-channel i mixes in-channel j with weight gamma[i, j]
        norm = jnp.einsum(
            "...j,ij->...i", jnp.square(x), gamma, preferred_element_type=jnp.float32
        ) + beta
        if self.inverse:
            return x * jnp.sqrt(norm)
        return x * jax.lax.rsqrt(norm)
