"""Conditional Gaussian entropy model — pure functions, no parameters.

Behavioral spec from the reference GaussianConditional
(CompressAI/compressai/entropy_models/entropy_models.py:450-568):

  likelihood(y; sigma, mu) = Phi((|y-mu|+.5)/sigma') - Phi((|y-mu|-.5)/sigma')
  with sigma' = max(sigma, scale_bound) via the pass-through lower bound,
  computed through erfc for numerical headroom, and floored at 1e-9.

``build_indexes`` maps each sigma to the index of the smallest scale-table
entry >= sigma (reference entropy_models.py:561-568), as one vectorized
searchsorted instead of a python loop over the table.
"""

import math

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.math import lower_bound

SCALE_BOUND = 0.11
LIKELIHOOD_BOUND = 1e-9
SCALES_MIN = 0.11
SCALES_MAX = 256.0
SCALES_LEVELS = 64


def get_scale_table(
    minimum: float = SCALES_MIN, maximum: float = SCALES_MAX, levels: int = SCALES_LEVELS
) -> np.ndarray:
    """64 log-spaced sigmas in [0.11, 256] (reference utils/moduleFunc.py:11-12)."""
    return np.exp(np.linspace(math.log(minimum), math.log(maximum), levels))


def _std_cumulative(x: jax.Array) -> jax.Array:
    """Standard normal CDF via erfc (max numerical precision in the tails)."""
    return 0.5 * jax.lax.erfc(-(2**-0.5) * x)


def gaussian_likelihood(
    inputs: jax.Array,
    scales: jax.Array,
    means: jax.Array | None = None,
    scale_bound: float = SCALE_BOUND,
    likelihood_bound: float = LIKELIHOOD_BOUND,
) -> jax.Array:
    """P(round(y) = y_hat) under N(means, scales^2), elementwise."""
    values = inputs if means is None else inputs - means
    scales = lower_bound(scales, scale_bound)
    values = jnp.abs(values)
    upper = _std_cumulative((0.5 - values) / scales)
    lower = _std_cumulative((-0.5 - values) / scales)
    likelihood = upper - lower
    if likelihood_bound > 0:
        likelihood = lower_bound(likelihood, likelihood_bound)
    return likelihood


def gaussian_forward(
    inputs: jax.Array,
    scales: jax.Array,
    means: jax.Array | None,
    training: bool,
    noise_rng: jax.Array | None = None,
):
    """(y_hat, likelihoods): additive-noise proxy in training, round at eval."""
    if training:
        noise = jax.random.uniform(noise_rng, inputs.shape, minval=-0.5, maxval=0.5)
        outputs = inputs + noise
    else:
        if means is None:
            outputs = jnp.round(inputs)
        else:
            outputs = jnp.round(inputs - means) + means
    return outputs, gaussian_likelihood(outputs, scales, means)


def build_indexes(
    scales: jax.Array, scale_table: np.ndarray, scale_bound: float | None = None
) -> jax.Array:
    """Index of the smallest table entry >= sigma, same shape as scales.

    Emitted as uint8 — the wire dtype for the host rANS coder (scale tables
    have <= 256 levels; the default has 64).

    scale_bound defaults to SCALE_BOUND (the reference's 0.11 lower bound,
    entropy_models.py:20) but can be raised process-wide with the
    RGBDC_SCALE_BOUND env var: a serving-side rate/speed knob that forces
    wider CDF rows so under-predicted sigmas stop producing escape symbols
    (escape rows cost ~3x decode time on the lockstep scan decoder, see
    docs/PERF.md).  Encoder and decoder share the stage programs, so the
    floor is consistent on both sides by construction."""
    assert len(scale_table) <= 256, "uint8 index wire format needs <=256 levels"
    if scale_bound is None:
        scale_bound = float(os.environ.get("RGBDC_SCALE_BOUND", SCALE_BOUND))
    scales = jnp.maximum(scales, scale_bound)
    # NaN folds to the bound (jnp.maximum propagates NaN; `NaN > t` is False
    # so a NaN would otherwise pick row 0, the NARROWEST row — the worst
    # case for escapes).  searchsorted used to map NaN to the widest row;
    # the bound row is the safe equivalent under the unrolled compares.
    scales = jnp.where(jnp.isnan(scales), scale_bound, scales)
    # Unrolled scalar-compare accumulation instead of jnp.searchsorted:
    # searchsorted lowers to a while-loop of gathers on TPU and burned
    # ~94 ms PER STAGE CALL at codec shapes (the single largest op in the
    # decode profile, docs/PERF.md); 63 fused scalar compares cost ~1 ms.
    # Identical semantics: side='left' == count of entries < scale.
    idx = jnp.zeros(scales.shape, jnp.uint8)
    for t in np.asarray(scale_table[:-1], dtype=np.float32):
        idx = idx + (scales > t).astype(jnp.uint8)
    return idx
