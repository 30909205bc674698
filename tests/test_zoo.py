"""Zoo-wide checks: registry dispatch, per-model forward + roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbdc_tpu.models import (
    Cheng2020AnchorCheckerboard,
    ELICUnitedR2D,
    ElicCodec,
    UnitedCodec,
    build_model,
    get_model_cls,
    modelZoo,
)
from rgbdc_tpu.utils import tiny_model_config


class TestRegistry:
    def test_substring_dispatch(self):
        from rgbdc_tpu.models import ELIC, ELICUnited

        assert get_model_cls("ELIC") is ELIC
        assert get_model_cls("ELIC_united") is ELICUnited
        assert get_model_cls("ELIC_united_R2D") is ELICUnitedR2D
        assert get_model_cls("ckbd") is Cheng2020AnchorCheckerboard

    def test_build_model_filters_kwargs(self):
        cfg = tiny_model_config()
        m = build_model("ckbd", cfg, in_ch=3)
        assert m.N == cfg.N
        m = build_model("ELIC", cfg, in_ch=1)
        assert m.in_ch == 1 and m.M == cfg.M


class TestCkbd:
    @pytest.fixture(scope="class")
    def setup(self):
        model = Cheng2020AnchorCheckerboard(N=16, in_ch=3)
        x = jnp.zeros((1, 64, 64, 3))
        v = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            x,
            training=True,
        )
        return model, v

    def test_forward_and_validate(self, setup, rng):
        model, v = setup
        x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), dtype=jnp.float32)
        out = model.apply(v, x, training=False)
        assert out["x_hat"].shape == x.shape
        out2 = model.apply(v, x, method=Cheng2020AnchorCheckerboard.validate)
        assert out2["x_hat"].shape == x.shape
        # both give finite positive likelihoods
        for o in (out, out2):
            assert np.all(np.asarray(o["likelihoods"]["y"]) > 0)

    def test_masked_context_is_anchor_only(self, setup, rng):
        """The context conv output at non-anchor positions must not change
        when non-anchor inputs change (kernel taps anchors only)."""
        model, v = setup
        from rgbdc_tpu.ops import ckbd_anchor, ckbd_nonanchor

        y = jnp.asarray(rng.normal(size=(1, 8, 8, 16)), dtype=jnp.float32)
        y2 = y + ckbd_nonanchor(jnp.ones_like(y))  # perturb nonanchor only

        def ctx(params, y):
            return model.apply(
                params, y, method=lambda m, y: m.context_prediction(y)
            )

        c1 = np.asarray(ckbd_nonanchor(ctx(v, y)))
        c2 = np.asarray(ckbd_nonanchor(ctx(v, y2)))
        np.testing.assert_allclose(c1, c2, atol=1e-6)

    def test_roundtrip(self, setup, rng):
        model, v = setup
        codec = ElicCodec(model, v)
        x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), dtype=jnp.float32)
        out = codec.compress(x)
        dec = codec.decompress(out["strings"], out["shape"])
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]), np.asarray(out["y_hat"])
        )
        # compare against the STE validate() forward (same rounding path)
        fwd = model.apply(v, x, method=Cheng2020AnchorCheckerboard.validate)
        np.testing.assert_allclose(
            np.asarray(dec["x_hat"]), np.asarray(fwd["x_hat"]), rtol=1e-3, atol=1e-3
        )


class TestR2D:
    def test_forward_and_roundtrip(self, rng):
        model = ELICUnitedR2D(N=16, M=24, slice_ch=(8, 16))
        rgb = jnp.asarray(rng.uniform(size=(1, 128, 128, 3)), dtype=jnp.float32)
        depth = jnp.asarray(rng.uniform(size=(1, 128, 128, 1)), dtype=jnp.float32)
        v = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            rgb,
            depth,
            training=True,
        )
        out = model.apply(v, rgb, depth, training=False)
        assert out["x_hat"]["r"].shape == rgb.shape
        assert out["x_hat"]["d"].shape == depth.shape

        codec = UnitedCodec(model, v)
        comp = codec.compress(rgb, depth)
        dec = codec.decompress(comp["r_strings"], comp["d_strings"], comp["shape"])
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]["r"]), np.asarray(comp["y_hat"]["r"])
        )
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]["d"]), np.asarray(comp["y_hat"]["d"])
        )

    def test_rgb_independent_of_depth(self, rng):
        """R2D invariant: the RGB reconstruction and likelihoods must not
        depend on the depth input at all."""
        model = ELICUnitedR2D(N=16, M=24, slice_ch=(8, 16))
        rgb = jnp.asarray(rng.uniform(size=(1, 128, 128, 3)), dtype=jnp.float32)
        d1 = jnp.asarray(rng.uniform(size=(1, 128, 128, 1)), dtype=jnp.float32)
        d2 = jnp.asarray(rng.uniform(size=(1, 128, 128, 1)), dtype=jnp.float32)
        v = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            rgb,
            d1,
            training=True,
        )
        o1 = model.apply(v, rgb, d1, training=False)
        o2 = model.apply(v, rgb, d2, training=False)
        np.testing.assert_allclose(
            np.asarray(o1["x_hat"]["r"]), np.asarray(o2["x_hat"]["r"]), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(o1["r_likelihoods"]["y"]),
            np.asarray(o2["r_likelihoods"]["y"]),
            atol=1e-6,
        )
