import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbdc_tpu.models import ELICUnited, UnitedCodec
from rgbdc_tpu.training import rate_distortion_loss_united

TINY = dict(N=32, M=48, slice_ch=(4, 4, 8, 8, 24))


@pytest.fixture(scope="module")
def united_setup():
    model = ELICUnited(**TINY)
    rgb = jnp.zeros((1, 128, 128, 3))
    depth = jnp.zeros((1, 128, 128, 1))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        rgb,
        depth,
        training=True,
    )
    return model, variables


class TestUnitedForward:
    def test_forward_shapes(self, united_setup, rng):
        model, variables = united_setup
        rgb = jnp.asarray(rng.uniform(size=(1, 128, 128, 3)), dtype=jnp.float32)
        depth = jnp.asarray(rng.uniform(size=(1, 128, 128, 1)), dtype=jnp.float32)
        out = model.apply(variables, rgb, depth, training=False)
        assert out["x_hat"]["r"].shape == (1, 128, 128, 3)
        assert out["x_hat"]["d"].shape == (1, 128, 128, 1)
        assert out["r_likelihoods"]["y"].shape == (1, 8, 8, TINY["M"])
        assert out["d_likelihoods"]["y"].shape == (1, 8, 8, TINY["M"])
        assert out["r_likelihoods"]["z"].shape == (1, 2, 2, TINY["N"])

    def test_united_loss(self, united_setup, rng):
        model, variables = united_setup
        rgb = jnp.asarray(rng.uniform(size=(1, 128, 128, 3)), dtype=jnp.float32)
        depth = jnp.asarray(rng.uniform(size=(1, 128, 128, 1)), dtype=jnp.float32)
        out = model.apply(variables, rgb, depth, training=False)
        loss = rate_distortion_loss_united(out, rgb, depth, 0.0067, 0.0067)
        for k in ("r_bpp_loss", "d_bpp_loss", "rgb_loss", "depth_loss", "loss"):
            assert np.isfinite(float(loss[k])), k

    def test_training_forward_with_noise(self, united_setup, rng):
        model, variables = united_setup
        rgb = jnp.asarray(rng.uniform(size=(1, 128, 128, 3)), dtype=jnp.float32)
        depth = jnp.asarray(rng.uniform(size=(1, 128, 128, 1)), dtype=jnp.float32)
        out = model.apply(
            variables, rgb, depth, training=True, rngs={"noise": jax.random.PRNGKey(7)}
        )
        assert np.isfinite(np.asarray(out["x_hat"]["r"])).all()


class TestUnitedRoundtrip:
    def test_compress_decompress_matches_forward(self, united_setup, rng):
        model, variables = united_setup
        codec = UnitedCodec(model, variables)
        rgb = jnp.asarray(rng.uniform(size=(1, 128, 128, 3)), dtype=jnp.float32)
        depth = jnp.asarray(rng.uniform(size=(1, 128, 128, 1)), dtype=jnp.float32)

        out = codec.compress(rgb, depth)
        assert len(out["r_strings"]) == 1 and len(out["r_strings"][0]) == 2
        dec = codec.decompress(out["r_strings"], out["d_strings"], out["shape"])

        # hard invariant: decoder latents == encoder latents, bit for bit
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]["r"]), np.asarray(out["y_hat"]["r"])
        )
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]["d"]), np.asarray(out["y_hat"]["d"])
        )
        # soft: close to the estimation forward
        fwd = model.apply(variables, rgb, depth, training=False)
        np.testing.assert_allclose(
            np.asarray(dec["x_hat"]["r"]),
            np.asarray(fwd["x_hat"]["r"]),
            rtol=1e-3,
            atol=1e-3,
        )

    @pytest.mark.full
    def test_file_bpp_vs_estimate(self, united_setup, rng):
        model, variables = united_setup
        codec = UnitedCodec(model, variables)
        rgb = jnp.asarray(rng.uniform(size=(1, 128, 128, 3)), dtype=jnp.float32)
        depth = jnp.asarray(rng.uniform(size=(1, 128, 128, 1)), dtype=jnp.float32)
        out = codec.compress(rgb, depth)
        num_px = 128 * 128
        fwd = model.apply(variables, rgb, depth, training=False)
        for strings, lik_key in ((out["r_strings"], "r_likelihoods"),
                                 (out["d_strings"], "d_likelihoods")):
            file_bpp = sum(len(s) for s in strings[0]) * 8 / num_px
            est_bpp = sum(
                -np.log2(np.asarray(l)).sum() / num_px for l in fwd[lik_key].values()
            )
            assert 0.5 * est_bpp < file_bpp < 1.1 * est_bpp, (file_bpp, est_bpp)
