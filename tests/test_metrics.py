import jax.numpy as jnp
import numpy as np

from rgbdc_tpu.eval import compute_metrics, ms_ssim, pad_to_multiple, crop_to, psnr


class TestPSNR:
    def test_identical_images(self, rng):
        x = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), dtype=jnp.float32)
        assert float(psnr(x, x)) > 100

    def test_known_mse(self):
        a = jnp.zeros((1, 8, 8, 1))
        b = jnp.full((1, 8, 8, 1), 0.1)
        np.testing.assert_allclose(float(psnr(a, b)), 20.0, atol=1e-4)


class TestMSSSIM:
    def test_identical_is_one(self, rng):
        x = jnp.asarray(rng.uniform(size=(1, 192, 192, 3)), dtype=jnp.float32)
        assert abs(float(ms_ssim(x, x)) - 1.0) < 1e-6

    def test_noise_lowers_score_monotonically(self, rng):
        x = jnp.asarray(rng.uniform(size=(1, 192, 192, 3)), dtype=jnp.float32)
        s1 = float(ms_ssim(x, jnp.clip(x + 0.02 * rng.normal(size=x.shape), 0, 1)))
        s2 = float(ms_ssim(x, jnp.clip(x + 0.2 * rng.normal(size=x.shape), 0, 1)))
        assert 1.0 > s1 > s2

    def test_compute_metrics_tuple(self, rng):
        x = jnp.asarray(rng.uniform(size=(1, 192, 192, 3)), dtype=jnp.float32)
        p, m = compute_metrics(x, x)
        assert p > 100 and abs(m - 1.0) < 1e-6


class TestPadding:
    def test_pad_crop_roundtrip(self, rng):
        x = jnp.asarray(rng.uniform(size=(1, 480, 640, 3)), dtype=jnp.float32)
        padded, size = pad_to_multiple(x, 64)
        assert padded.shape == (1, 512, 640, 3)
        np.testing.assert_allclose(crop_to(padded, size), x)

    def test_replicate_edge_values(self):
        x = jnp.ones((1, 63, 64, 1))
        padded, _ = pad_to_multiple(x, 64, mode="replicate0")
        assert padded.shape == (1, 64, 64, 1)
        np.testing.assert_allclose(np.asarray(padded)[0, -1], 1.0)

    def test_center_pad(self, rng):
        x = jnp.asarray(rng.uniform(size=(1, 100, 100, 3)), dtype=jnp.float32)
        padded, size = pad_to_multiple(x, 64, mode="center")
        assert padded.shape == (1, 128, 128, 3)
        np.testing.assert_allclose(crop_to(padded, size, mode="center"), x)
