"""Factorized-prior entropy bottleneck (Ballé et al. 2018), flax/NHWC.

Behavioral spec from the reference EntropyBottleneck
(CompressAI/compressai/entropy_models/entropy_models.py:269-446):

  - a per-channel monotone 5-stage MLP parameterizes the latent CDF:
      logits = L_k(...L_0(x)),  L_i(x) = softplus(M_i) x + b_i  (+ tanh gate)
  - learnable ``quantiles`` (C,1,3) track the (tail, median, 1-tail) points,
    driven only by the auxiliary loss (weights are detached there);
  - training adds U(-.5,.5) noise, eval rounds around the channel medians;
  - likelihood = |sigmoid(sign*upper) - sigmoid(sign*lower)| floored at 1e-9.

The reference permutes NCHW -> (C,1,N*H*W) python-side; here the NHWC tensor
is evaluated directly with a batched einsum over the channel axis, so the
whole likelihood is one fused XLA computation.
"""

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.math import lower_bound


class EntropyBottleneck(nn.Module):
    channels: int
    filters: tuple = (3, 3, 3, 3)
    init_scale: float = 10.0
    tail_mass: float = 1e-9
    likelihood_bound: float = 1e-9

    def setup(self):
        f = (1,) + tuple(self.filters) + (1,)
        scale = self.init_scale ** (1.0 / (len(self.filters) + 1))
        c = self.channels

        matrices, biases, factors = [], [], []
        for i in range(len(self.filters) + 1):
            init = math.log(math.expm1(1.0 / scale / f[i + 1]))
            matrices.append(
                self.param(
                    f"matrix_{i}",
                    lambda rng, shape=(c, f[i + 1], f[i]), v=init: jnp.full(shape, v),
                )
            )
            biases.append(
                self.param(
                    f"bias_{i}",
                    lambda rng, shape=(c, f[i + 1], 1): jax.random.uniform(
                        rng, shape, minval=-0.5, maxval=0.5
                    ),
                )
            )
            if i < len(self.filters):
                factors.append(
                    self.param(
                        f"factor_{i}",
                        lambda rng, shape=(c, f[i + 1], 1): jnp.zeros(shape),
                    )
                )
        self._matrices = matrices
        self._biases = biases
        self._factors = factors

        self.quantiles = self.param(
            "quantiles",
            lambda rng: jnp.tile(
                jnp.array([[-self.init_scale, 0.0, self.init_scale]]), (c, 1, 1)
            ),
        )

    def _logits_cumulative(self, inputs: jax.Array, stop_gradient: bool) -> jax.Array:
        """inputs: [C, 1, N] -> logits [C, 1, N]."""
        logits = inputs
        for i in range(len(self.filters) + 1):
            matrix, bias = self._matrices[i], self._biases[i]
            if stop_gradient:
                matrix = jax.lax.stop_gradient(matrix)
                bias = jax.lax.stop_gradient(bias)
            logits = (
                jnp.einsum(
                    "cof,cfn->con",
                    jax.nn.softplus(matrix),
                    logits,
                    preferred_element_type=jnp.float32,
                )
                + bias
            )
            if i < len(self.filters):
                factor = self._factors[i]
                if stop_gradient:
                    factor = jax.lax.stop_gradient(factor)
                logits = logits + jnp.tanh(factor) * jnp.tanh(logits)
        return logits

    def medians(self) -> jax.Array:
        """[1, 1, 1, C] channel medians (for NHWC broadcasting)."""
        return self.quantiles[:, 0, 1].reshape(1, 1, 1, -1)

    def aux_loss(self) -> jax.Array:
        """|logits(quantiles) - target| — drives only the quantiles (weights
        are stop-gradient'ed), matching the reference's separate aux step."""
        logits = self._logits_cumulative(self.quantiles, stop_gradient=True)
        t = math.log(2.0 / self.tail_mass - 1.0)
        target = jnp.array([-t, 0.0, t])
        return jnp.sum(jnp.abs(logits - target))

    def _likelihood(self, values: jax.Array) -> jax.Array:
        """values: [C, 1, N] -> elementwise pmf of the rounded latent."""
        lower = self._logits_cumulative(values - 0.5, stop_gradient=False)
        upper = self._logits_cumulative(values + 0.5, stop_gradient=False)
        sign = jax.lax.stop_gradient(-jnp.sign(lower + upper))
        return jnp.abs(jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower))

    def __call__(self, x: jax.Array, training: bool = False):
        """x: [B, H, W, C] -> (x_hat, likelihoods), both [B, H, W, C]."""
        b, h, w, c = x.shape
        values = x.transpose(3, 0, 1, 2).reshape(c, 1, -1)

        if training:
            noise = jax.random.uniform(
                self.make_rng("noise"), values.shape, minval=-0.5, maxval=0.5
            )
            outputs = values + noise
        else:
            medians = self.quantiles[:, :, 1:2]
            outputs = jnp.round(values - medians) + medians

        likelihood = self._likelihood(outputs)
        if self.likelihood_bound > 0:
            likelihood = lower_bound(likelihood, self.likelihood_bound)

        outputs = outputs.reshape(c, b, h, w).transpose(1, 2, 3, 0)
        likelihood = likelihood.reshape(c, b, h, w).transpose(1, 2, 3, 0)
        return outputs, likelihood


def eb_param_tree(variables: dict, path: tuple) -> dict:
    """Extract an EntropyBottleneck's param dict from a variables pytree."""
    node = variables["params"]
    for p in path:
        node = node[p]
    return node


def logits_cumulative_np(params: dict, inputs: np.ndarray, n_filters: int = 4) -> np.ndarray:
    """Numpy mirror of _logits_cumulative, for host-side CDF table building."""
    logits = inputs
    for i in range(n_filters + 1):
        m = np.asarray(params[f"matrix_{i}"], dtype=np.float64)
        b = np.asarray(params[f"bias_{i}"], dtype=np.float64)
        softplus = np.where(m > 30, m, np.log1p(np.exp(np.minimum(m, 30.0))))
        logits = np.einsum("cof,cfn->con", softplus, logits) + b
        if i < n_filters:
            f = np.asarray(params[f"factor_{i}"], dtype=np.float64)
            logits = logits + np.tanh(f) * np.tanh(logits)
    return logits
