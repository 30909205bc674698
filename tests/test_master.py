import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbdc_tpu.models import ELIC, ELICMaster, ElicCodec, MasterCodec, get_model_cls

TINY = dict(N=16, M=24, slice_ch=(8, 16))


@pytest.fixture(scope="module")
def cascade(rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    aux_model = ELIC(**TINY, in_ch=1, return_mid=True)
    aux0 = jnp.zeros((1, 64, 64, 1))
    av = aux_model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        aux0,
        training=True,
    )
    aux_codec = ElicCodec(aux_model, av)

    aux = jnp.asarray(rng.uniform(size=(1, 64, 64, 1)), dtype=jnp.float32)
    ac = aux_codec.compress(aux)
    ad = aux_codec.decompress(ac["strings"], ac["shape"])

    master = ELICMaster(**TINY, in_ch=3)
    x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), dtype=jnp.float32)
    mv = master.init(
        {"params": jax.random.PRNGKey(2), "noise": jax.random.PRNGKey(3)},
        x,
        ad["x_hat"],
        ad["up1"],
        ad["up2"],
        ad["up3"],
        training=True,
    )
    return master, mv, aux_codec, ad, x


class TestMasterCascade:
    def test_registry(self):
        assert get_model_cls("ELIC_master") is ELICMaster

    def test_aux_return_mid_taps(self, cascade):
        _, _, _, ad, _ = cascade
        assert ad["up1"].shape == (1, 8, 8, TINY["N"])
        assert ad["up2"].shape == (1, 16, 16, TINY["N"])
        assert ad["up3"].shape == (1, 32, 32, TINY["N"])

    def test_forward_has_side_info(self, cascade):
        master, mv, _, ad, x = cascade
        out = master.apply(
            mv, x, ad["x_hat"], ad["up1"], ad["up2"], ad["up3"], training=False
        )
        assert out["x_hat"].shape == x.shape
        assert out["beta"].shape == (1, 1, 1, 64)
        assert out["gamma"].shape == (1, 1, 1, 64)

    def test_roundtrip(self, cascade):
        master, mv, _, ad, x = cascade
        codec = MasterCodec(master, mv)
        comp = codec.compress(x, ad["x_hat"])
        assert comp["side_info"][0].dtype == np.float16
        dec = codec.decompress(
            comp["strings"],
            comp["shape"],
            ad["x_hat"],
            (ad["up1"], ad["up2"], ad["up3"]),
            comp["side_info"],
        )
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]), np.asarray(comp["y_hat"])
        )
        fwd = master.apply(
            mv, x, ad["x_hat"], ad["up1"], ad["up2"], ad["up3"], training=False
        )
        # side info is quantized to f16, so allow a slightly looser bound
        np.testing.assert_allclose(
            np.asarray(dec["x_hat"]), np.asarray(fwd["x_hat"]), rtol=5e-3, atol=5e-3
        )
