"""Pallas kernel equality tests (interpret mode on the CPU test mesh)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rgbdc_tpu.entropy import get_scale_table
from rgbdc_tpu.ops.pallas_kernels import (
    gdn_fused,
    gdn_fused_ref,
    quantize_to_wire,
    quantize_to_wire_ref,
)


class TestWireKernel:
    def test_matches_reference(self, rng):
        table = get_scale_table()
        y = jnp.asarray(rng.normal(size=(2, 8, 16, 32)) * 10, dtype=jnp.float32)
        mn = jnp.asarray(rng.normal(size=y.shape), dtype=jnp.float32)
        sc = jnp.asarray(rng.uniform(0.01, 300, size=y.shape), dtype=jnp.float32)
        s1, i1 = quantize_to_wire(y, mn, sc, table)
        s2, i2 = quantize_to_wire_ref(y, mn, sc, table)
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        assert s1.dtype == jnp.int16 and i1.dtype == jnp.uint8

    def test_index_boundaries(self):
        # exactly-on-boundary scales: same convention as build_indexes
        from rgbdc_tpu.entropy import build_indexes

        table = get_scale_table()
        sc = jnp.asarray(table.astype(np.float32))
        _, idx = quantize_to_wire(
            jnp.zeros_like(sc), jnp.zeros_like(sc), sc.reshape(1, -1), table
        )
        ref = build_indexes(sc.reshape(1, -1), table)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref))


class TestGDNKernel:
    def test_matches_reference(self, rng):
        c = 32
        x = jnp.asarray(rng.normal(size=(4, 8, 8, c)), dtype=jnp.float32)
        gamma = jnp.asarray(
            0.1 * np.eye(c) + 0.001 * rng.uniform(size=(c, c)), dtype=jnp.float32
        )
        beta = jnp.ones((c,), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(gdn_fused(x, gamma, beta)),
            np.asarray(gdn_fused_ref(x, gamma, beta)),
            rtol=1e-5,
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(gdn_fused(x, gamma, beta, inverse=True)),
            np.asarray(gdn_fused_ref(x, gamma, beta, inverse=True)),
            rtol=1e-5,
            atol=1e-6,
        )
