"""Pallas TPU kernels for the codec's hot glue ops.

Two kernels where fusion pays beyond what XLA does on its own:

  - quantize_to_wire: residual rounding + clip + int16 cast AND the
    64-level scale-table lookup (searchsorted) in ONE pass over the latent,
    emitting both wire tensors (int16 symbols, uint8 CDF indexes) without
    materializing intermediates in HBM.  The table lookup is an unrolled
    compare-accumulate over the 63 boundaries — pure VPU work.
  - gdn_fused: x^2 -> channel-mix matmul (MXU) -> +beta -> rsqrt -> scale
    in one kernel, saving two HBM round-trips of the [B*H*W, C] activation.

Both have jnp reference paths (`*_ref`) used for testing and as the
non-TPU fallback; `interpret=True` is used automatically off-TPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .math import lower_bound

_LANE = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# --- wire quantization -------------------------------------------------------


def quantize_to_wire_ref(y, means, scales, scale_table, scale_bound=0.11):
    """jnp reference: (sym int16, idx uint8)."""
    sym = jnp.clip(jnp.round(y - means), -30000, 30000).astype(jnp.int16)
    table = jnp.asarray(scale_table[:-1], dtype=scales.dtype)
    idx = jnp.searchsorted(table, jnp.maximum(scales, scale_bound), side="left")
    return sym, idx.astype(jnp.uint8)


def _wire_kernel(table_ref, y_ref, mn_ref, sc_ref, sym_ref, idx_ref, *, n_bounds):
    resid = y_ref[:] - mn_ref[:]
    sym_ref[:] = jnp.clip(jnp.round(resid), -30000, 30000).astype(jnp.int16)
    scale = sc_ref[:]
    acc = jnp.zeros(scale.shape, jnp.int32)
    for j in range(n_bounds):  # unrolled compare-accumulate (VPU)
        acc += (scale > table_ref[0, j]).astype(jnp.int32)
    idx_ref[:] = acc.astype(jnp.uint8)


def quantize_to_wire(y, means, scales, scale_table, scale_bound=0.11):
    """Fused wire quantization. y/means/scales: same shape, any rank >= 2.

    NOTE on the boundary comparison: searchsorted('left') counts boundaries
    strictly below max(scale, bound); since bound > 0 and table[0] >= bound
    the clamp only matters at the first boundary, handled by comparing the
    clamped scale.
    """
    if _interpret():
        return quantize_to_wire_ref(y, means, scales, scale_table, scale_bound)

    shape = y.shape
    flat = int(np.prod(shape[:-1]))
    c = shape[-1]
    y2 = y.reshape(flat, c)
    mn2 = means.reshape(flat, c)
    sc2 = jnp.maximum(scales.reshape(flat, c), scale_bound)
    table = jnp.asarray(scale_table[:-1], dtype=jnp.float32).reshape(1, -1)
    n_bounds = table.shape[1]

    block_m = min(512, flat)
    grid = (pl.cdiv(flat, block_m),)
    sym, idx = pl.pallas_call(
        partial(_wire_kernel, n_bounds=n_bounds),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n_bounds), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((block_m, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_m, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((flat, c), jnp.int16),
            jax.ShapeDtypeStruct((flat, c), jnp.uint8),
        ),
    )(table, y2, mn2, sc2)
    return sym.reshape(shape), idx.reshape(shape)


# --- fused GDN ---------------------------------------------------------------


def gdn_fused_ref(x, gamma, beta, inverse=False):
    norm = jnp.einsum("...j,ij->...i", jnp.square(x), gamma) + beta
    return x * (jnp.sqrt(norm) if inverse else jax.lax.rsqrt(norm))


def _gdn_kernel(x_ref, gamma_ref, beta_ref, out_ref, *, inverse):
    x = x_ref[:]
    sq = jnp.square(x)
    norm = (
        jnp.dot(sq, gamma_ref[:].T, preferred_element_type=jnp.float32)
        + beta_ref[:]
    )
    if inverse:
        out_ref[:] = x * jnp.sqrt(norm)
    else:
        out_ref[:] = x * jax.lax.rsqrt(norm)


def gdn_fused(x, gamma, beta, inverse: bool = False):
    """x: [..., C]; gamma: [C, C] (out<-in); beta: [C]."""
    if _interpret():
        return gdn_fused_ref(x, gamma, beta, inverse)

    shape = x.shape
    c = shape[-1]
    flat = int(np.prod(shape[:-1]))
    x2 = x.reshape(flat, c)
    block_m = min(1024, flat)
    grid = (pl.cdiv(flat, block_m),)
    out = pl.pallas_call(
        partial(_gdn_kernel, inverse=inverse),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_m, c), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((flat, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * flat * c * c,
            bytes_accessed=2 * flat * c * 4 + c * c * 4,
            transcendentals=flat * c,
        ),
    )(x2, gamma, beta.reshape(1, c))
    return out.reshape(shape)
