"""Multi-chip DP serving over the virtual 8-device CPU mesh (SURVEY §2.11):
the lane codec's batch shards over the 'data' axis — each device runs the
fused stage programs + lockstep rans scans on its own sub-batch, with no
cross-chip collectives in the codec (entropy coding is per-image).

The bit-exact enc/dec closure must hold under sharding exactly as it does
single-chip: encoder and decoder drive the SAME sharded executables
(models/codec.py shard_serving)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbdc_tpu.models import ELICUnited, UnitedCodec
from rgbdc_tpu.parallel import get_mesh


@pytest.fixture(scope="module")
def sharded_codec():
    mesh = get_mesh()
    model = ELICUnited(N=16, M=24, slice_ch=(8, 16))
    v = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, 128, 128, 3)),
        jnp.zeros((1, 128, 128, 1)),
        training=True,
    )
    codec = UnitedCodec(model, v).shard_serving(mesh)
    b = len(mesh.devices.reshape(-1))
    rng = np.random.default_rng(7)
    rgb = jnp.asarray(rng.uniform(size=(b, 128, 128, 3)), jnp.float32)
    depth = jnp.asarray(rng.uniform(size=(b, 128, 128, 1)), jnp.float32)
    return codec, rgb, depth


class TestShardedServing:
    def test_roundtrip_bit_exact(self, sharded_codec):
        codec, rgb, depth = sharded_codec
        out = codec.compress_lanes(rgb, depth)
        dec = codec.decompress_lanes(out["r_streams"], out["d_streams"], out["shape"])
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]["r"]), np.asarray(out["y_hat"]["r"])
        )
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]["d"]), np.asarray(out["y_hat"]["d"])
        )
        assert dec["x_hat"]["r"].shape == rgb.shape
        assert dec["x_hat"]["d"].shape == depth.shape

    def test_device_encode_sharded(self, sharded_codec, monkeypatch):
        """DP sharding + fully on-device encoding (reverse rans scan +
        escape sideband), the bench.py serving default.  Streams must
        match the host-encode path's byte for byte — same wire format,
        same closure."""
        codec, rgb, depth = sharded_codec
        ref = codec.compress_lanes(rgb, depth)
        monkeypatch.setenv("RGBDC_DEVICE_ENCODE", "1")
        out = codec.compress_lanes(rgb, depth)
        assert out["r_streams"] == ref["r_streams"]
        assert out["d_streams"] == ref["d_streams"]
        dec = codec.decompress_lanes(out["r_streams"], out["d_streams"], out["shape"])
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]["r"]), np.asarray(out["y_hat"]["r"])
        )

    def test_batch_is_actually_sharded(self, sharded_codec):
        """The decoded tensors must carry the 'data'-axis batch sharding —
        i.e. the codec really ran DP over the mesh, not replicated."""
        codec, rgb, depth = sharded_codec
        out = codec.compress_lanes(rgb, depth)
        dec = codec.decompress_lanes(out["r_streams"], out["d_streams"], out["shape"])
        sh = dec["x_hat"]["r"].sharding
        assert not sh.is_fully_replicated
        spec = sh.spec
        assert spec and spec[0] == "data"

    def test_streams_match_host_decoder(self, sharded_codec):
        """Cross-implementation check: the per-image streams produced under
        sharding decode with the host C mirror into the same z symbols the
        device decoder consumed (container format is device-layout
        independent)."""
        from rgbdc_tpu.coder.rans import lanes_decode

        codec, rgb, depth = sharded_codec
        out = codec.compress_lanes(rgb, depth)
        zh, zw = out["shape"]
        n = codec.model.N
        z_len = zh * zw * n
        z_idx = (np.zeros((z_len,), np.int64) + 64 + (
            np.arange(z_len) % n)).astype(np.uint8)
        # decode just the z group of image 0 with the C mirror
        sym = lanes_decode(
            out["r_streams"][0], z_idx, [z_len], codec._comb_r,
            lanes=codec.LANES,
        )
        assert sym.shape == (z_len,)
