"""On-device (lane-format) codec path: fused encode program -> lane-split
bitstreams -> ONE jitted decode program.  The decoder's y_hat must equal the
encoder's y_hat EXACTLY (fused-program analog of the shared-stage-program
bit-exact closure), and the lane path must reconstruct the same images as
the compat (host-serial) path."""

import jax
import jax.numpy as jnp
import numpy as np

from rgbdc_tpu.models import ELICUnited, UnitedCodec


def _tiny_codec():
    model = ELICUnited(N=16, M=24, slice_ch=(8, 16))
    rgb = jnp.zeros((1, 128, 128, 3), jnp.float32)
    depth = jnp.zeros((1, 128, 128, 1), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        rgb,
        depth,
        training=True,
    )
    return UnitedCodec(model, variables)


class TestLaneCodec:
    def setup_method(self, _):
        self.codec = _tiny_codec()
        rng = np.random.default_rng(0)
        self.rgb = jnp.asarray(rng.uniform(size=(2, 128, 128, 3)), jnp.float32)
        self.depth = jnp.asarray(rng.uniform(size=(2, 128, 128, 1)), jnp.float32)

    def test_roundtrip_bit_exact(self):
        out = self.codec.compress_lanes(self.rgb, self.depth)
        assert len(out["r_streams"]) == 2 and len(out["d_streams"]) == 2
        dec = self.codec.decompress_lanes(
            out["r_streams"], out["d_streams"], out["shape"]
        )
        # the hard invariant: decoded latents identical to the encoder's
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]["r"]), np.asarray(out["y_hat"]["r"])
        )
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]["d"]), np.asarray(out["y_hat"]["d"])
        )
        assert dec["x_hat"]["r"].shape == self.rgb.shape
        assert dec["x_hat"]["d"].shape == self.depth.shape

    def test_matches_compat_path(self):
        """Same model, same inputs: lane path and compat path must decode
        identical latents (they share every stage computation)."""
        lane = self.codec.compress_lanes(self.rgb, self.depth)
        compat = self.codec.compress(self.rgb, self.depth)
        np.testing.assert_array_equal(
            np.asarray(lane["y_hat"]["r"]), np.asarray(compat["y_hat"]["r"])
        )
        dec_lane = self.codec.decompress_lanes(
            lane["r_streams"], lane["d_streams"], lane["shape"]
        )
        dec_compat = self.codec.decompress(
            compat["r_strings"], compat["d_strings"], compat["shape"]
        )
        np.testing.assert_array_equal(
            np.asarray(dec_lane["x_hat"]["r"]), np.asarray(dec_compat["x_hat"]["r"])
        )
        np.testing.assert_array_equal(
            np.asarray(dec_lane["x_hat"]["d"]), np.asarray(dec_compat["x_hat"]["d"])
        )

    def test_stream_sizes_reasonable(self):
        """Lane container overhead is 8 bytes/lane + payload; streams must
        not balloon vs the compat format."""
        lane = self.codec.compress_lanes(self.rgb, self.depth)
        compat = self.codec.compress(self.rgb, self.depth)
        lane_bytes = sum(len(s) for s in lane["r_streams"])
        compat_bytes = sum(len(s) for ss in compat["r_strings"] for s in ss)
        overhead = 8 * UnitedCodec.LANES * len(lane["r_streams"])
        assert lane_bytes <= compat_bytes * 1.02 + overhead * 1.5
