"""Single-modality lane serving path (models/lane_single.py): the ElicCodec
family's on-device compress_lanes/decompress_lanes must satisfy the same
bit-exact closure as the flagship united lane codec — decoder y_hat equal
to the encoder's EXACTLY — under the default and the full serving-knob
configurations, for both ELIC and the Cheng2020-ckbd family."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbdc_tpu.models import ELIC, ElicCodec


def _tiny_elic():
    model = ELIC(N=32, M=48, slice_ch=(4, 4, 8, 8, 24), in_ch=3)
    x0 = jnp.zeros((1, 64, 64, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        x0,
        training=True,
    )
    return model, variables


@pytest.fixture(scope="module")
def elic_mv():
    return _tiny_elic()


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.uniform(size=(2, 64, 64, 3)), jnp.float32)


class TestSingleLaneCodec:
    def test_roundtrip_bit_exact(self, elic_mv, images):
        model, variables = elic_mv
        codec = ElicCodec(model, variables)
        out = codec.compress_lanes(images)
        assert len(out["streams"]) == 2
        dec = codec.decompress_lanes(out["streams"], out["shape"])
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]), np.asarray(out["y_hat"])
        )
        assert dec["x_hat"].shape == images.shape
        # the compat (host-serial) path shares every stage program object,
        # so its y_hat must be identical too
        compat = codec.compress(images)
        np.testing.assert_array_equal(
            np.asarray(compat["y_hat"]), np.asarray(out["y_hat"])
        )
        # prepared-decode path drives the SAME executables to the same bits
        prep = codec.prepare_decode_lanes_single(out["streams"])
        dec_p = codec.decompress_lanes(out["streams"], out["shape"],
                                       prepared=prep)
        np.testing.assert_array_equal(
            np.asarray(dec_p["y_hat"]), np.asarray(dec["y_hat"])
        )

    def test_streams_deterministic(self, elic_mv, images):
        model, variables = elic_mv
        codec = ElicCodec(model, variables)
        a = codec.compress_lanes(images)
        b = codec.compress_lanes(images)
        for s_a, s_b in zip(a["streams"], b["streams"]):
            assert s_a == s_b

    def test_full_serving_config(self, elic_mv, images, monkeypatch):
        """The bench's united serving-knob set, applied to the single-lane
        path: dense-capped tables, escfix decode, scan-out encoder with
        one-hot gather compaction, flat upload + one-hot word fetch, tight
        word cap, bf16 front/synth."""
        monkeypatch.setenv("RGBDC_DENSE128", "1")
        monkeypatch.setenv("RGBDC_DEC_ESCFIX", "1")
        monkeypatch.setenv("RGBDC_ENC_SCANOUT", "1")
        monkeypatch.setenv("RGBDC_ENC_GCOMPACT", "onehot")
        monkeypatch.setenv("RGBDC_FLAT_UPLOAD", "1")
        monkeypatch.setenv("RGBDC_DEC_WFETCH", "onehot")
        model, variables = elic_mv
        codec = ElicCodec(model, variables)
        out = codec.compress_lanes(images)
        dec = codec.decompress_lanes(out["streams"], out["shape"])
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]), np.asarray(out["y_hat"])
        )
        # the knob set must not change the y_hat closure vs the default
        # config (the symbols come from the same f32 front + stage
        # programs; only the wire layout / decode lowering changed)
        codec0 = ElicCodec(model, variables)
        for k in ("RGBDC_DENSE128", "RGBDC_DEC_ESCFIX", "RGBDC_ENC_SCANOUT",
                  "RGBDC_ENC_GCOMPACT", "RGBDC_FLAT_UPLOAD",
                  "RGBDC_DEC_WFETCH"):
            monkeypatch.delenv(k)
        out0 = codec0.compress_lanes(images)
        np.testing.assert_array_equal(
            np.asarray(out0["y_hat"]), np.asarray(out["y_hat"])
        )

    def test_bf16_serving_roundtrip(self, elic_mv, images, monkeypatch):
        """bf16 analysis/synthesis (RGBDC_BF16=1) changes WHICH symbols get
        coded (encoder-internal), never the closure: roundtrip stays
        bit-exact and the reconstruction stays close to the f32 path's."""
        model, variables = elic_mv
        codec0 = ElicCodec(model, variables)
        dec0 = None
        out0 = codec0.compress_lanes(images)
        dec0 = codec0.decompress_lanes(out0["streams"], out0["shape"])
        monkeypatch.setenv("RGBDC_BF16", "1")
        codec = ElicCodec(model, variables)
        out = codec.compress_lanes(images)
        dec = codec.decompress_lanes(out["streams"], out["shape"])
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]), np.asarray(out["y_hat"])
        )
        err = float(
            np.mean(np.abs(np.asarray(dec["x_hat"]) - np.asarray(dec0["x_hat"])))
        )
        assert err < 0.1, f"bf16 reconstruction drifted: {err}"

    def test_escape_paths(self, elic_mv, images):
        """An untrained model's streams are escape-heavy: whichever escape
        path fired (compacted sideband or the full-pull fallback), the
        decode must still be bit-exact (both paths produce identical
        containers by construction — the sideband only changes HOW the
        nibble streams reach the host)."""
        model, variables = elic_mv
        codec = ElicCodec(model, variables)
        out = codec.compress_lanes(images)
        assert codec.last_esc_path in (None, "sideband", "full")
        dec = codec.decompress_lanes(out["streams"], out["shape"])
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]), np.asarray(out["y_hat"])
        )

    @pytest.mark.full
    def test_fuse_slices_roundtrip(self, elic_mv, images, monkeypatch):
        """RGBDC_FUSE_SLICES=1 traces the z program + every fused slice
        program into ONE executable per direction; the op sequence is
        identical, so the streams must match the per-slice dispatch flow
        and the roundtrip must stay bit-exact."""
        model, variables = elic_mv
        ref = ElicCodec(model, variables).compress_lanes(images)
        monkeypatch.setenv("RGBDC_FUSE_SLICES", "1")
        codec = ElicCodec(model, variables)
        out = codec.compress_lanes(images)
        for a, b in zip(out["streams"], ref["streams"]):
            assert a == b
        dec = codec.decompress_lanes(out["streams"], out["shape"])
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]), np.asarray(out["y_hat"])
        )

    def test_every_family_lane_serves(self):
        """Round 4: the master cascade joined the lane path (MasterLaneCodec
        threads the aux conditioning) — every codec driver in the zoo now
        serves on-device."""
        from rgbdc_tpu.models import MasterCodec, MlicCodec

        assert MasterCodec.LANE_SERVING is True
        assert MlicCodec.LANE_SERVING is True


class TestChengCkbdLane:
    def test_roundtrip_bit_exact(self, images):
        from rgbdc_tpu.models import build_model

        model = build_model("ckbd", {"N": 32}, in_ch=3)
        x0 = jnp.zeros((1, 64, 64, 3))
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            x0,
            training=True,
        )
        codec = ElicCodec(model, variables)
        out = codec.compress_lanes(images)
        dec = codec.decompress_lanes(out["streams"], out["shape"])
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]), np.asarray(out["y_hat"])
        )


class TestMlicLane:
    """MLIC++ lane serving (MlicLaneCodec): checkerboard phases whose
    nonanchor/merge stages thread prev+hyper through the global contexts."""

    def test_roundtrip_bit_exact(self, images):
        from rgbdc_tpu.models import MLICPlusPlus, MlicCodec

        model = MLICPlusPlus(N=16, M=32, slice_num=4, in_ch=3)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            jnp.zeros((1, 64, 64, 3)),
            training=True,
        )
        codec = MlicCodec(model, variables)
        out = codec.compress_lanes(images)
        dec = codec.decompress_lanes(out["streams"], out["shape"])
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]), np.asarray(out["y_hat"])
        )
        compat = codec.compress(images)
        np.testing.assert_array_equal(
            np.asarray(compat["y_hat"]), np.asarray(out["y_hat"])
        )

    @pytest.mark.full
    def test_fuse_slices_roundtrip(self, images, monkeypatch):
        """The consolidation target (VERDICT r3 task 3): MLIC's 10-slice
        flow as ONE executable per direction under RGBDC_FUSE_SLICES=1,
        streams identical to the per-slice dispatch flow."""
        from rgbdc_tpu.models import MLICPlusPlus, MlicCodec

        model = MLICPlusPlus(N=16, M=32, slice_num=4, in_ch=3)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            jnp.zeros((1, 64, 64, 3)),
            training=True,
        )
        ref = MlicCodec(model, variables).compress_lanes(images)
        monkeypatch.setenv("RGBDC_FUSE_SLICES", "1")
        codec = MlicCodec(model, variables)
        out = codec.compress_lanes(images)
        for a, b in zip(out["streams"], ref["streams"]):
            assert a == b
        dec = codec.decompress_lanes(out["streams"], out["shape"])
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]), np.asarray(out["y_hat"])
        )


class TestSTFLane:
    """Channel-AR lane serving (CarLaneCodec): one dense group per slice,
    same closure contract as the checkerboard schedule."""

    @pytest.fixture(scope="class")
    def stf_mv(self):
        from rgbdc_tpu.models import SymmetricalTransFormer

        model = SymmetricalTransFormer(
            embed_dim=8, depths=(1, 1, 2, 1), num_heads=(1, 2, 4, 8),
            num_slices=4, in_ch=3,
        )
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            jnp.zeros((1, 64, 64, 3)),
            training=True,
        )
        return model, variables

    def test_roundtrip_bit_exact(self, stf_mv, images):
        from rgbdc_tpu.models import ChannelARCodec

        model, variables = stf_mv
        codec = ChannelARCodec(model, variables)
        out = codec.compress_lanes(images)
        dec = codec.decompress_lanes(out["streams"], out["shape"])
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]), np.asarray(out["y_hat"])
        )
        assert dec["x_hat"].shape == images.shape
        # the compat (host-serial) path shares the front/quantize programs'
        # closure: identical y_hat
        compat = codec.compress(images)
        np.testing.assert_array_equal(
            np.asarray(compat["y_hat"]), np.asarray(out["y_hat"])
        )

    def test_full_serving_config(self, stf_mv, images, monkeypatch):
        from rgbdc_tpu.models import ChannelARCodec

        monkeypatch.setenv("RGBDC_DENSE128", "1")
        monkeypatch.setenv("RGBDC_DEC_ESCFIX", "1")
        monkeypatch.setenv("RGBDC_ENC_SCANOUT", "1")
        monkeypatch.setenv("RGBDC_ENC_GCOMPACT", "onehot")
        monkeypatch.setenv("RGBDC_FLAT_UPLOAD", "1")
        monkeypatch.setenv("RGBDC_DEC_WFETCH", "onehot")
        model, variables = stf_mv
        codec = ChannelARCodec(model, variables)
        out = codec.compress_lanes(images)
        dec = codec.decompress_lanes(out["streams"], out["shape"])
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]), np.asarray(out["y_hat"])
        )


class TestSingleLaneSharded:
    @pytest.mark.full
    def test_dp_serving_roundtrip(self, elic_mv):
        """Batch-sharded single-lane serving over the virtual device mesh:
        streams identical to the unsharded codec's, decode bit-exact."""
        from jax.sharding import Mesh

        devs = jax.devices()
        if len(devs) < 2:
            pytest.skip("needs the multi-device CPU mesh")
        mesh = Mesh(np.array(devs[:2]), ("data",))
        model, variables = elic_mv
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)), jnp.float32)
        ref = ElicCodec(model, variables).compress_lanes(x)
        codec = ElicCodec(model, variables).shard_serving(mesh)
        out = codec.compress_lanes(x)
        for a, b in zip(out["streams"], ref["streams"]):
            assert a == b
        dec = codec.decompress_lanes(out["streams"], out["shape"])
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]), np.asarray(out["y_hat"])
        )
