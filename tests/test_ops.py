import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbdc_tpu.ops import (
    GDN,
    anchor_mask,
    ckbd_anchor,
    ckbd_anchor_squeeze,
    ckbd_anchor_unsqueeze,
    ckbd_merge,
    ckbd_nonanchor,
    ckbd_nonanchor_squeeze,
    ckbd_nonanchor_unsqueeze,
    ckbd_split,
    lower_bound,
    ste_round,
)


class TestSteRound:
    def test_forward(self):
        x = jnp.array([0.4, 0.6, -1.5, 2.49])
        np.testing.assert_allclose(ste_round(x), np.round(np.asarray(x)))

    def test_gradient_is_identity(self):
        g = jax.grad(lambda x: jnp.sum(ste_round(x) * 3.0))(jnp.array([0.3, 1.7]))
        np.testing.assert_allclose(g, [3.0, 3.0])


class TestLowerBound:
    def test_forward(self):
        x = jnp.array([-1.0, 0.5, 2.0])
        np.testing.assert_allclose(lower_bound(x, 0.5), [0.5, 0.5, 2.0])

    def test_gradient_passthrough_rules(self):
        # grad of sum: cotangent +1 everywhere -> below-bound entries blocked
        g = jax.grad(lambda x: jnp.sum(lower_bound(x, 0.0)))(jnp.array([-1.0, 1.0]))
        np.testing.assert_allclose(g, [0.0, 1.0])
        # negative cotangent (pushing up) passes through even below bound
        g = jax.grad(lambda x: -jnp.sum(lower_bound(x, 0.0)))(jnp.array([-1.0, 1.0]))
        np.testing.assert_allclose(g, [-1.0, -1.0])


class TestCheckerboard:
    def test_anchor_parity(self):
        # anchor at (even row, odd col) and (odd row, even col): (i+j) odd
        m = np.asarray(anchor_mask(4, 4))[..., 0]
        expected = np.indices((4, 4)).sum(0) % 2 == 1
        np.testing.assert_array_equal(m, expected)

    def test_split_merge_roundtrip(self, rng):
        y = jnp.asarray(rng.normal(size=(2, 8, 12, 5)), dtype=jnp.float32)
        a, na = ckbd_split(y)
        np.testing.assert_allclose(ckbd_merge(a, na), y)
        # disjoint support
        np.testing.assert_allclose(np.asarray(a) * np.asarray(na), 0.0)

    def test_squeeze_unsqueeze_inverse(self, rng):
        y = jnp.asarray(rng.normal(size=(2, 8, 12, 5)), dtype=jnp.float32)
        a = ckbd_anchor(y)
        na = ckbd_nonanchor(y)
        np.testing.assert_allclose(
            ckbd_anchor_unsqueeze(ckbd_anchor_squeeze(y)), a, rtol=0, atol=0
        )
        np.testing.assert_allclose(
            ckbd_nonanchor_unsqueeze(ckbd_nonanchor_squeeze(y)), na, rtol=0, atol=0
        )

    def test_squeeze_layout_matches_reference(self):
        # reference packing (utils/ckbd.py:51-64): even output rows hold the
        # odd input columns for anchors
        y = jnp.arange(4 * 4, dtype=jnp.float32).reshape(1, 4, 4, 1)
        sq = np.asarray(ckbd_anchor_squeeze(y))[0, :, :, 0]
        ref = np.zeros((4, 2), dtype=np.float32)
        ynp = np.asarray(y)[0, :, :, 0]
        ref[0::2, :] = ynp[0::2, 1::2]
        ref[1::2, :] = ynp[1::2, 0::2]
        np.testing.assert_array_equal(sq, ref)


class TestGDN:
    def test_forward_matches_formula(self, rng):
        c = 8
        x = jnp.asarray(rng.normal(size=(2, 4, 4, c)), dtype=jnp.float32)
        mod = GDN(channels=c)
        params = mod.init(jax.random.PRNGKey(0), x)
        y = mod.apply(params, x)
        # at init: gamma = 0.1*I, beta = 1 -> y = x / sqrt(1 + 0.1 x^2)
        expected = np.asarray(x) / np.sqrt(1.0 + 0.1 * np.asarray(x) ** 2)
        np.testing.assert_allclose(np.asarray(y), expected, rtol=2e-5, atol=2e-6)

    def test_inverse_gdn(self, rng):
        c = 4
        x = jnp.asarray(rng.normal(size=(1, 2, 2, c)), dtype=jnp.float32)
        mod = GDN(channels=c, inverse=True)
        params = mod.init(jax.random.PRNGKey(0), x)
        y = mod.apply(params, x)
        expected = np.asarray(x) * np.sqrt(1.0 + 0.1 * np.asarray(x) ** 2)
        np.testing.assert_allclose(np.asarray(y), expected, rtol=2e-5, atol=2e-6)


class TestSubpixelDeconv:
    """RGBDC_SUBPIX lowering of the k5/s2 transposed conv (nn/layers.py
    ConvTranspose): same params, same auto-name counter, same linear map
    up to fp summation order.  Measured slightly SLOWER than XLA's own
    transposed-conv lowering on the axon TPU (docs/PERF.md) — kept as a
    pinned, default-off alternative lowering."""

    def test_matches_conv_transpose(self, monkeypatch, rng):
        from rgbdc_tpu.nn import layers

        x = jnp.asarray(rng.normal(size=(2, 6, 9, 7)), dtype=jnp.float32)
        monkeypatch.delenv("RGBDC_SUBPIX", raising=False)
        ref = layers.deconv(5)
        vref = ref.init(jax.random.PRNGKey(1), x)
        monkeypatch.setenv("RGBDC_SUBPIX", "1")
        new = layers.deconv(5)
        assert jax.tree_util.tree_structure(
            new.init(jax.random.PRNGKey(1), x)
        ) == jax.tree_util.tree_structure(vref)
        y_ref = ref.apply(vref, x)
        y_new = new.apply(vref, x)  # identical params drive both lowerings
        assert y_new.shape == y_ref.shape == (2, 12, 18, 5)
        np.testing.assert_allclose(
            np.asarray(y_new), np.asarray(y_ref), atol=2e-5, rtol=0
        )

    def test_mixed_parent_param_paths(self, monkeypatch):
        """HyperSynthesisEX mixes k5/s2 (subpixel-eligible) and k3/s1
        deconvs: the auto-name counter must stay shared so checkpoints
        load under either knob value."""
        from rgbdc_tpu.nn.synthesis import HyperSynthesisEX

        m = HyperSynthesisEX(N=8, M=12)
        x = jnp.zeros((1, 4, 4, 8))
        monkeypatch.delenv("RGBDC_SUBPIX", raising=False)
        v0 = m.init(jax.random.PRNGKey(0), x)
        y0 = m.apply(v0, x)
        monkeypatch.setenv("RGBDC_SUBPIX", "1")
        v1 = m.init(jax.random.PRNGKey(0), x)
        assert jax.tree.map(lambda a: a.shape, v0) == jax.tree.map(
            lambda a: a.shape, v1
        )
        y1 = m.apply(v0, x)  # same params through the subpixel lowering
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=3e-6)
