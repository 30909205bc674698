import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbdc_tpu.models import STFUnited, UnitedCodec, get_model_cls


class TestSTFUnited:
    @pytest.fixture(scope="class")
    def setup(self):
        model = STFUnited(
            N=16, M=32, slice_ch=(8, 24), embed_dim=4,
            depths=(1, 1, 1, 1), num_heads=(1, 2, 2, 4),
        )
        # 256px minimum: ESA fusion operates on H/16 maps
        rgb = jnp.zeros((1, 256, 256, 3))
        depth = jnp.zeros((1, 256, 256, 1))
        v = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            rgb,
            depth,
            training=True,
        )
        return model, v

    def test_registry(self):
        assert get_model_cls("STF_united") is STFUnited

    def test_default_config_override(self):
        m = STFUnited()
        assert m.N == 192 and m.M == 384
        assert tuple(m.slice_ch) == (24, 24, 48, 96, 192)

    def test_build_model_pins_config(self):
        """build_model must NOT override the pinned swin-tower channels
        with the generic ELIC config (the reference force-pins these in
        its constructor, models/stf_united.py:639-641): the towers fix
        M = 8*embed_dim, so config M=320 would desync them."""
        from rgbdc_tpu.models import build_model
        from rgbdc_tpu.utils.config import model_config

        m = build_model("STF_united", model_config())
        assert m.N == 192 and m.M == 384
        assert tuple(m.slice_ch) == (24, 24, 48, 96, 192)

    def test_forward_and_roundtrip(self, setup, rng):
        model, v = setup
        rgb = jnp.asarray(rng.uniform(size=(1, 256, 256, 3)), dtype=jnp.float32)
        depth = jnp.asarray(rng.uniform(size=(1, 256, 256, 1)), dtype=jnp.float32)
        out = model.apply(v, rgb, depth, training=False)
        assert out["x_hat"]["r"].shape == rgb.shape
        assert out["x_hat"]["d"].shape == depth.shape

        codec = UnitedCodec(model, v)
        c = codec.compress(rgb, depth)
        d = codec.decompress(c["r_strings"], c["d_strings"], c["shape"])
        # hard invariant: decoder latents == encoder latents, bit for bit.
        # (x_hat vs the estimation forward can differ materially here: one
        # quantization-boundary flip under cross-program fp jitter smears
        # globally through the swin synthesis.)
        np.testing.assert_array_equal(
            np.asarray(d["y_hat"]["r"]), np.asarray(c["y_hat"]["r"])
        )
        np.testing.assert_array_equal(
            np.asarray(d["y_hat"]["d"]), np.asarray(c["y_hat"]["d"])
        )
