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


class TestMasterLaneServing:
    """Round-4 cascade lane serving (models/lane_single.MasterLaneCodec):
    aux ELIC decodes through its OWN lane path (decoded image + up-taps
    stay on device), the master's fused lane programs condition on them,
    and beta/gamma ride as 256 B/image side info — whole-cascade decode is
    two lane streams, zero host-serial phases."""

    def test_lane_roundtrip_bit_exact(self, cascade):
        master, mv, aux_codec, _, x = cascade
        aux = jnp.asarray(
            np.random.default_rng(0).uniform(size=(1, 64, 64, 1)), jnp.float32
        )
        a_out = aux_codec.compress_lanes(aux)
        a_dec = aux_codec.decompress_lanes(a_out["streams"], a_out["shape"])
        # the aux lane decode must surface the cascade taps
        for k in ("up1", "up2", "up3"):
            assert k in a_dec

        codec = MasterCodec(master, mv)
        comp = codec.compress_lanes(x, a_dec["x_hat"])
        assert comp["side_info"][0].dtype == np.float16
        dec = codec.decompress_lanes(
            comp["streams"],
            comp["shape"],
            a_dec["x_hat"],
            (a_dec["up1"], a_dec["up2"], a_dec["up3"]),
            side_info=comp["side_info"],
        )
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]), np.asarray(comp["y_hat"])
        )
        assert dec["x_hat"].shape == x.shape
        # compat host wire shares the stage programs: identical y_hat
        compat = codec.compress(x, a_dec["x_hat"])
        np.testing.assert_array_equal(
            np.asarray(compat["y_hat"]), np.asarray(comp["y_hat"])
        )

    @pytest.mark.full
    def test_lane_full_serving_config(self, cascade, monkeypatch):
        """The bench knob set applied to the cascade lane path."""
        monkeypatch.setenv("RGBDC_DENSE128", "1")
        monkeypatch.setenv("RGBDC_DEC_ESCFIX", "1")
        monkeypatch.setenv("RGBDC_ENC_SCANOUT", "1")
        monkeypatch.setenv("RGBDC_ENC_GCOMPACT", "onehot")
        monkeypatch.setenv("RGBDC_FLAT_UPLOAD", "1")
        monkeypatch.setenv("RGBDC_DEC_WFETCH", "onehot")
        monkeypatch.setenv("RGBDC_BF16", "1")
        master, mv, aux_codec, ad, x = cascade
        codec = MasterCodec(master, mv)
        comp = codec.compress_lanes(x, ad["x_hat"])
        dec = codec.decompress_lanes(
            comp["streams"],
            comp["shape"],
            ad["x_hat"],
            (ad["up1"], ad["up2"], ad["up3"]),
            side_info=comp["side_info"],
        )
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]), np.asarray(comp["y_hat"])
        )

    @pytest.mark.full
    def test_lane_sharded_roundtrip(self, cascade):
        """DP-sharded cascade serving over the virtual mesh: streams equal
        the unsharded codec's, decode bit-exact (VERDICT r3 task 2)."""
        from jax.sharding import Mesh

        devs = jax.devices()
        if len(devs) < 2:
            pytest.skip("needs the multi-device CPU mesh")
        mesh = Mesh(np.array(devs[:2]), ("data",))
        master, mv, aux_codec, _, _ = cascade
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)), jnp.float32)
        aux = jnp.asarray(rng.uniform(size=(2, 64, 64, 1)), jnp.float32)
        a_out = aux_codec.compress_lanes(aux)
        a_dec = aux_codec.decompress_lanes(a_out["streams"], a_out["shape"])
        ups = (a_dec["up1"], a_dec["up2"], a_dec["up3"])
        ref = MasterCodec(master, mv).compress_lanes(x, a_dec["x_hat"])
        codec = MasterCodec(master, mv).shard_serving(mesh)
        out = codec.compress_lanes(x, a_dec["x_hat"])
        for a, b in zip(out["streams"], ref["streams"]):
            assert a == b
        dec = codec.decompress_lanes(
            out["streams"], out["shape"], a_dec["x_hat"], ups,
            side_info=out["side_info"],
        )
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]), np.asarray(out["y_hat"])
        )
