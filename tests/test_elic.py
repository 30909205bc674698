import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbdc_tpu.models import ELIC, CodecTables, ElicCodec

TINY = dict(N=32, M=48, slice_ch=(4, 4, 8, 8, 24), in_ch=3)


@pytest.fixture(scope="module")
def elic_setup():
    model = ELIC(**TINY)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        x,
        training=True,
    )
    return model, variables


class TestElicForward:
    def test_forward_shapes(self, elic_setup, rng):
        model, variables = elic_setup
        x = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)), dtype=jnp.float32)
        out = model.apply(variables, x, training=False)
        assert out["x_hat"].shape == (2, 64, 64, 3)
        assert out["likelihoods"]["y"].shape == (2, 4, 4, TINY["M"])
        assert out["likelihoods"]["z"].shape == (2, 1, 1, TINY["N"])  # z = H/64
        assert np.all(np.asarray(out["likelihoods"]["y"]) > 0)

    def test_training_forward_runs_with_noise(self, elic_setup, rng):
        model, variables = elic_setup
        x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), dtype=jnp.float32)
        out = model.apply(
            variables, x, training=True, rngs={"noise": jax.random.PRNGKey(3)}
        )
        assert np.isfinite(np.asarray(out["x_hat"])).all()

    def test_bpp_is_finite_and_positive(self, elic_setup, rng):
        model, variables = elic_setup
        x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), dtype=jnp.float32)
        out = model.apply(variables, x, training=False)
        bpp = sum(
            -np.log2(np.asarray(lik)).sum() / (64 * 64)
            for lik in out["likelihoods"].values()
        )
        assert np.isfinite(bpp) and bpp > 0


class TestElicRoundtrip:
    def test_compress_decompress_identity(self, elic_setup, rng):
        """forward-bpp ~ file-bpp and exact latent reconstruction: the
        de-facto integration test of the reference (SURVEY §4.1)."""
        model, variables = elic_setup
        codec = ElicCodec(model, variables)
        x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), dtype=jnp.float32)

        out = codec.compress(x)
        assert out["shape"] == (1, 1)  # z = H/64
        dec = codec.decompress(out["strings"], out["shape"])
        x_hat = np.asarray(dec["x_hat"])
        assert x_hat.shape == (1, 64, 64, 3)

        # hard invariant: the decoder reproduces the encoder's latent
        # bit-for-bit (shared stage programs)
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]), np.asarray(out["y_hat"])
        )
        # soft invariant: close to the estimation forward (which may differ
        # at quantization boundaries by fp jitter across programs)
        fwd = model.apply(variables, x, training=False)
        np.testing.assert_allclose(
            x_hat, np.asarray(fwd["x_hat"]), rtol=1e-3, atol=1e-3
        )

    def test_roundtrip_batch(self, elic_setup, rng):
        model, variables = elic_setup
        codec = ElicCodec(model, variables)
        x = jnp.asarray(rng.uniform(size=(3, 64, 64, 3)), dtype=jnp.float32)
        out = codec.compress(x)
        assert len(out["strings"][0]) == 3
        dec = codec.decompress(out["strings"], out["shape"])
        assert np.asarray(dec["x_hat"]).shape == (3, 64, 64, 3)

    def test_bpp_estimate_matches_file_bpp(self, elic_setup, rng):
        model, variables = elic_setup
        codec = ElicCodec(model, variables)
        x = jnp.asarray(rng.uniform(size=(1, 128, 128, 3)), dtype=jnp.float32)
        out = codec.compress(x)
        nbytes = sum(len(s) for sl in out["strings"] for s in sl)
        file_bpp = nbytes * 8 / (128 * 128)
        fwd = model.apply(variables, x, training=False)
        est_bpp = sum(
            -np.log2(np.asarray(lik)).sum() / (128 * 128)
            for lik in fwd["likelihoods"].values()
        )
        # At random init the table sigmas (>= predicted sigma) code the
        # mismatched residuals cheaper than the exact-sigma estimate, so the
        # file may undershoot; it must never exceed the estimate by much.
        assert 0.5 * est_bpp < file_bpp < 1.1 * est_bpp, (file_bpp, est_bpp)
