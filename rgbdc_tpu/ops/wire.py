"""Wire dtypes for the device->host entropy-coding boundary.

Symbols cross the host link as int16 and CDF indexes as uint8 (3
bytes/symbol instead of 8) — the link, not the TPU, is the codec's
bandwidth bottleneck.  Latent residuals live in [-1e2, 1e2] for any sane
model; the clip below only guards absurd inputs and stays inside the
coder's escape range.
"""

import jax
import jax.numpy as jnp


def _sym16(residual: jax.Array) -> jax.Array:
    return jnp.clip(jnp.round(residual), -30000, 30000).astype(jnp.int16)
