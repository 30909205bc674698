"""Trained-statistics rate integrity in the DEFAULT suite (VERDICT r3
task 6): the committed TINY calibration checkpoint makes the
file-bytes-vs-quantized-CDF-cross-entropy check CPU-speed, so it no
longer hides behind RGBDC_CALIB_TEST=1 + TPU (the flagship-sized variant
stays in tests/test_calib_checkpoint.py for TPU runs).

The check is the reference's manual cross-validation
(models/elic_united.py:255-257,404-406): actual stream bytes must match
the discrete cross-entropy of the (symbol, cdf-row) streams under the
coder's quantized tables to 0.5% + per-stream container constants — any
CDF/quantization miscalibration fails it.  The TRAINED checkpoint makes
the statistics live: sigma predictions vary per position (the degenerate
all-floor index regime cannot satisfy the live-index assertion below).
"""

import os

import numpy as np
import pytest

CKPT = os.path.join(
    os.path.dirname(__file__), "..", "calib", "tiny_united_q2.f16.msgpack"
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(CKPT),
    reason="needs the committed tiny calibration checkpoint",
)


@pytest.fixture(scope="module")
def tiny_trained():
    import jax
    import jax.numpy as jnp

    from rgbdc_tpu.models import ELICUnited, UnitedCodec
    from rgbdc_tpu.utils.config import tiny_model_config
    from tools.export_calib import load_calib_params_device

    cfg = tiny_model_config()
    model = ELICUnited(
        N=cfg["N"], M=cfg["M"], slice_ch=tuple(cfg["slice_ch"])
    )
    abstract = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            jnp.zeros((1, 128, 128, 3)), jnp.zeros((1, 128, 128, 1)),
            training=True,
        )
    )
    variables = {"params": load_calib_params_device(CKPT, abstract["params"])}
    codec = UnitedCodec(model, variables)

    from PIL import Image

    root = os.path.join(os.path.dirname(__file__), "fixtures", "rgbd")
    rgb = np.asarray(
        Image.open(os.path.join(root, "rgb", "0001.png")).convert("RGB"),
        np.float32,
    ) / 255.0
    depth = np.asarray(
        Image.open(os.path.join(root, "depth", "0001.png")).convert("I"),
        np.float32,
    )
    depth = depth / max(float(depth.max()), 1.0)
    # the calibration trained on 128px crops of the 640x512 resize; eval
    # on a center 128px crop of the same content distribution
    h0, w0 = rgb.shape[0] // 2 - 64, rgb.shape[1] // 2 - 64
    rgb = rgb[h0 : h0 + 128, w0 : w0 + 128][None]
    depth = depth[h0 : h0 + 128, w0 : w0 + 128][None, ..., None]
    return codec, jnp.asarray(rgb), jnp.asarray(depth)


class TestTinyRateIntegrity:
    def test_file_bytes_match_quantized_cross_entropy(self, tiny_trained):
        import jax

        from rgbdc_tpu.models.codec import eb_channel_indexes
        from test_rd_parity_codec import expected_bits

        codec, rgb, depth = tiny_trained
        (rz_sym, dz_sym, (r_packed, _), (d_packed, _), _, _) = (
            codec._encode_stage_flow(rgb, depth)
        )
        rz, dz, (r_sym, r_idx), (d_sym, d_idx) = jax.device_get(
            (rz_sym, dz_sym, r_packed, d_packed)
        )
        z_idx = eb_channel_indexes(rz.shape)
        comp = codec.compress(rgb, depth)
        live_indexes = 0
        for key, y, yi, z, eb_name in (
            ("r_strings", r_sym, r_idx, rz, "rgb_entropy_bottleneck"),
            ("d_strings", d_sym, d_idx, dz, "depth_entropy_bottleneck"),
        ):
            nbits = 8 * sum(len(s) for s in comp[key][0])
            exp = expected_bits(y[0], yi[0], codec.tables.gc) + expected_bits(
                np.clip(z[0], -32768, 32767), z_idx[0],
                codec.tables.eb[eb_name],
            )
            assert abs(nbits - exp) <= 0.005 * exp + 64 * 8, (
                key, nbits, exp, nbits / exp,
            )
            live_indexes += len(np.unique(yi))
        # TRAINED statistics: sigma predictions are live — more than one
        # gaussian table row must actually be used across the modalities
        assert live_indexes > 2, f"index stream degenerate: {live_indexes}"

    def test_roundtrip_bit_exact(self, tiny_trained):
        codec, rgb, depth = tiny_trained
        comp = codec.compress(rgb, depth)
        dec = codec.decompress(
            comp["r_strings"], comp["d_strings"], comp["shape"]
        )
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]["r"]), np.asarray(comp["y_hat"]["r"])
        )
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]["d"]), np.asarray(comp["y_hat"]["d"])
        )
