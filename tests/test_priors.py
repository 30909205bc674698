import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbdc_tpu.models.priors import (
    FactorizedPrior,
    HyperpriorCodec,
    JointAutoregressiveHierarchicalPriors,
    MaskedConv2D,
    MeanScaleHyperprior,
    ScaleHyperprior,
)
from rgbdc_tpu.ops.color import rgb2ycbcr, ycbcr2rgb, yuv_420_to_444, yuv_444_to_420
from rgbdc_tpu.ops.gdn import GDN1


def _init(model, x):
    return model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        x,
        training=True,
    )


class TestPriorZoo:
    def test_factorized_forward(self, rng):
        m = FactorizedPrior(N=8, M=12)
        x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), dtype=jnp.float32)
        out = m.apply(_init(m, x), x, training=False)
        assert out["x_hat"].shape == x.shape
        assert out["likelihoods"]["y"].shape == (1, 4, 4, 12)

    def test_mean_scale_roundtrip(self, rng):
        m = MeanScaleHyperprior(N=8, M=12)
        x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), dtype=jnp.float32)
        v = _init(m, x)
        codec = HyperpriorCodec(m, v)
        c = codec.compress(x)
        d = codec.decompress(c["strings"], c["shape"])
        fwd = m.apply(v, x, training=False)
        np.testing.assert_allclose(
            np.asarray(d["x_hat"]), np.asarray(fwd["x_hat"]), rtol=1e-4, atol=1e-4
        )

    def test_scale_hyperprior_forward(self, rng):
        m = ScaleHyperprior(N=8, M=12)
        x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), dtype=jnp.float32)
        out = m.apply(_init(m, x), x, training=False)
        assert np.isfinite(np.asarray(out["x_hat"])).all()

    def test_joint_ar_forward(self, rng):
        m = JointAutoregressiveHierarchicalPriors(N=8, M=8)
        x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), dtype=jnp.float32)
        out = m.apply(_init(m, x), x, training=False)
        assert np.isfinite(np.asarray(out["x_hat"])).all()


class TestMaskedConv:
    def test_causality(self, rng):
        """Mask A: output at (i,j) must not depend on (i,j) or later."""
        m = MaskedConv2D(4, 5, "A")
        x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)), dtype=jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        base = np.asarray(m.apply(v, x))
        x2 = x.at[0, 4, 4, :].add(100.0)
        out2 = np.asarray(m.apply(v, x2))
        # center and everything before it unchanged
        np.testing.assert_allclose(base[0, :4], out2[0, :4], atol=1e-5)
        np.testing.assert_allclose(base[0, 4, :5], out2[0, 4, :5], atol=1e-5)
        # strictly-later positions may change
        assert np.abs(base[0, 5:] - out2[0, 5:]).max() > 0


class TestColor:
    def test_rgb_ycbcr_inverse(self, rng):
        x = jnp.asarray(rng.uniform(size=(1, 8, 8, 3)), dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(ycbcr2rgb(rgb2ycbcr(x))), np.asarray(x), atol=1e-5
        )

    def test_yuv_420_shapes(self, rng):
        x = jnp.asarray(rng.uniform(size=(1, 8, 8, 3)), dtype=jnp.float32)
        y, cb, cr = yuv_444_to_420(x)
        assert y.shape == (1, 8, 8, 1) and cb.shape == (1, 4, 4, 1)
        up = yuv_420_to_444(y, cb, cr)
        assert up.shape == x.shape


class TestGDN1:
    def test_formula(self, rng):
        c = 4
        x = jnp.asarray(rng.normal(size=(1, 2, 2, c)), dtype=jnp.float32)
        mod = GDN1(channels=c)
        v = mod.init(jax.random.PRNGKey(0), x)
        y = mod.apply(v, x)
        expected = np.asarray(x) / (1.0 + 0.1 * np.abs(np.asarray(x)))
        np.testing.assert_allclose(np.asarray(y), expected, rtol=2e-5, atol=2e-6)


class TestJointARCodec:
    """Real pixel-serial AR codec (reference priors.py:482-583)."""

    def test_roundtrip_bit_exact(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from rgbdc_tpu.models.priors import (
            JointARCodec,
            JointAutoregressiveHierarchicalPriors,
        )

        model = JointAutoregressiveHierarchicalPriors(N=16, M=16)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), jnp.float32)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            x,
            training=True,
        )
        codec = JointARCodec(model, variables)
        out = codec.compress(x)
        assert len(out["strings"][0]) == 1 and len(out["strings"][1]) == 1
        dec = codec.decompress(out["strings"], out["shape"])
        assert dec["x_hat"].shape == x.shape
        assert np.all(np.asarray(dec["x_hat"]) >= 0)
        # the hard invariant: the decoder's AR buffer regenerates the
        # encoder's reconstruction EXACTLY (y_hat-exact roundtrip)
        np.testing.assert_array_equal(np.asarray(dec["y_hat"]), out["y_hat"])

    def test_rate_sane(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from rgbdc_tpu.models.priors import (
            JointARCodec,
            JointAutoregressiveHierarchicalPriors,
        )

        model = JointAutoregressiveHierarchicalPriors(N=16, M=16)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), jnp.float32)
        variables = model.init(
            {"params": jax.random.PRNGKey(2), "noise": jax.random.PRNGKey(3)},
            x,
            training=True,
        )
        codec = JointARCodec(model, variables)
        out = codec.compress(x)
        nbytes = len(out["strings"][0][0]) + len(out["strings"][1][0])
        assert 0 < nbytes < 64 * 64 * 3  # compresses below raw


class TestCheng2020SerialAR:
    """The plain (non-checkerboard) Cheng2020 pair (reference
    waseda.py:22-131): Cheng transforms over the JointAR machinery."""

    @pytest.mark.parametrize("cls_name", ["Cheng2020Anchor", "Cheng2020Attention"])
    def test_forward_and_codec_roundtrip(self, cls_name):
        import rgbdc_tpu.models as M
        from rgbdc_tpu.models.priors import JointARCodec

        model = getattr(M, cls_name)(N=16, M=16)
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), jnp.float32)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            x,
            training=True,
        )
        out = model.apply(variables, x, training=False)
        assert out["x_hat"].shape == x.shape
        assert np.isfinite(float(jnp.sum(jnp.log(out["likelihoods"]["y"]))))

        codec = JointARCodec(model, variables)
        comp = codec.compress(x)
        dec = codec.decompress(comp["strings"], comp["shape"])
        np.testing.assert_array_equal(np.asarray(dec["y_hat"]), comp["y_hat"])
        nbytes = len(comp["strings"][0][0]) + len(comp["strings"][1][0])
        assert 0 < nbytes < 64 * 64 * 3

    def test_m_equals_n_enforced(self):
        import rgbdc_tpu.models as M

        model = M.Cheng2020Anchor(N=16, M=32)
        with pytest.raises(AssertionError):
            model.init(
                {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
                jnp.zeros((1, 64, 64, 3)),
                training=True,
            )
