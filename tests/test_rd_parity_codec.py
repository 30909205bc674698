"""Codec-level RD parity with CONVERTED reference weights (VERDICT r2 #4):
close the loop the reference cross-checks manually
(/root/reference/models/elic_united.py:255-257,404-406) — the REAL
compress -> file -> decompress path must be calibrated end-to-end:

  1. decoded latents reproduce the encoder's exactly (bit-exact closure);
  2. PSNR(roundtrip) matches PSNR(estimation forward) to the BASELINE bar
     (0.05 dB) — the codec quantizes like the forward rounds;
  3. the actual FILE size matches the quantized-CDF cross-entropy of the
     coded symbols to 0.5% (+ container/flush constants): any CDF table,
     offset, index, or escape-coding miscalibration shows up here.  (The
     forward's continuous-likelihood bpp is NOT the right yardstick at
     random-init weights: untrained sigma predictions make escape symbols
     common, and escapes legitimately cost more than the Gaussian
     estimate.  The quantized-CDF cross-entropy IS what a correct coder
     must achieve; a trained-checkpoint file-vs-forward check lives in
     tests/test_calib_checkpoint.py.)
"""

import io

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from reference_compat import RefConfig, ensure_reference_importable, nchw  # noqa: E402

from rgbdc_tpu.coder.bitstream import read_body, read_uints, write_body, write_uints  # noqa: E402
from rgbdc_tpu.eval.metrics import psnr  # noqa: E402
from rgbdc_tpu.models import ELICUnited, UnitedCodec  # noqa: E402
from rgbdc_tpu.utils import torch_import as ti  # noqa: E402

ensure_reference_importable()

import models as ref_models  # noqa: E402  (reference package)


def expected_bits(sym: np.ndarray, idx: np.ndarray, table) -> float:
    """Exact expected code length of (sym, idx) under the quantized CDFs —
    including the escape-bypass cost model of the C coder (rans.cpp:
    escape codes the top row symbol, then 4-bit count nibble + LSB-first
    4-bit chunks of the raw value)."""
    sym = sym.astype(np.int64).reshape(-1)
    idx = idx.astype(np.int64).reshape(-1)
    cdf = table.cdf.astype(np.int64)
    off = table.offset[idx]
    maxv = table.cdf_length[idx] - 2
    v = sym - off
    esc = (v < 0) | (v >= maxv)
    vv = np.where(esc, maxv, v)
    freq = cdf[idx, vv + 1] - cdf[idx, vv]
    bits = float(np.sum(-np.log2(freq / 65536.0)))
    for raw in np.where(
        v[esc] < 0, 2 * (-v[esc]) - 1, 2 * (v[esc] - maxv[esc])
    ):
        n_byp = 0
        while (int(raw) >> (n_byp * 4)) != 0:
            n_byp += 1
        bits += 4.0 * (1 + n_byp)
    return bits


@pytest.fixture(scope="module")
def imported_codec():
    cfg = RefConfig(
        N=32, M=48, slice_num=3, slice_ch=[8, 16, 24], quant="ste",
        context_window=5,
    )
    tm = ref_models.modelZoo["ELIC_united"](cfg)
    tm.eval()
    fm = ELICUnited(N=32, M=48, slice_ch=(8, 16, 24))
    params = ti.elic_united_params(tm)
    codec = UnitedCodec(fm, {"params": params})

    from PIL import Image

    rgb = np.asarray(
        Image.open("tests/fixtures/rgbd/rgb/0001.png").convert("RGB"), np.float32
    )[None] / 255.0
    depth = np.asarray(
        Image.open("tests/fixtures/rgbd/depth/0001.png").convert("I"), np.float32
    )[None, ..., None]
    depth = depth / max(float(depth.max()), 1.0)
    return fm, params, codec, jnp.asarray(rgb), jnp.asarray(depth)


class TestCodecRDParity:
    def test_file_roundtrip_matches_forward(self, imported_codec, tmp_path):
        fm, params, codec, rgb, depth = imported_codec
        h, w = rgb.shape[1:3]

        # estimation forward (the reference's manual cross-check reference)
        fwd = fm.apply({"params": params}, rgb, depth, training=False)
        psnr_fwd_r = float(psnr(fwd["x_hat"]["r"], rgb))
        psnr_fwd_d = float(psnr(fwd["x_hat"]["d"], depth))

        # real codec path through actual FILES (tester protocol)
        comp = codec.compress(rgb, depth)
        paths = []
        for key in ("r_strings", "d_strings"):
            buf = io.BytesIO()
            write_uints(buf, (h, w))
            strings = [[comp[key][0][0]], [comp[key][0][1]]]
            write_body(buf, comp["shape"], strings)
            p = tmp_path / f"{key}.bin"
            p.write_bytes(buf.getvalue())
            paths.append(p)

        read = []
        for p in paths:
            with open(p, "rb") as f:
                read_uints(f, 2)
                strings, shape = read_body(f)
                read.append([strings[0][0], strings[1][0]])
        dec = codec.decompress([read[0]], [read[1]], comp["shape"])

        # 1. bit-exact closure
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]["r"]), np.asarray(comp["y_hat"]["r"])
        )
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]["d"]), np.asarray(comp["y_hat"]["d"])
        )
        # 2. roundtrip quality == forward quality (BASELINE 0.05 dB bar)
        psnr_rt_r = float(psnr(dec["x_hat"]["r"], rgb))
        psnr_rt_d = float(psnr(dec["x_hat"]["d"], depth))
        assert abs(psnr_rt_r - psnr_fwd_r) < 0.05, (psnr_rt_r, psnr_fwd_r)
        assert abs(psnr_rt_d - psnr_fwd_d) < 0.05, (psnr_rt_d, psnr_fwd_d)

    def test_file_size_matches_quantized_cdf_cross_entropy(self, imported_codec):
        fm, params, codec, rgb, depth = imported_codec
        (rz_sym, dz_sym, (r_packed, _), (d_packed, _), _, _) = (
            codec._encode_stage_flow(rgb, depth)
        )
        rz, dz, (r_sym, r_idx), (d_sym, d_idx) = jax.device_get(
            (rz_sym, dz_sym, r_packed, d_packed)
        )
        comp = codec.compress(rgb, depth)

        from rgbdc_tpu.models.codec import eb_channel_indexes

        z_idx = eb_channel_indexes(rz.shape)
        for strings, y, yi, z, eb_name in (
            (comp["r_strings"][0], r_sym, r_idx, rz, "rgb_entropy_bottleneck"),
            (comp["d_strings"][0], d_sym, d_idx, dz, "depth_entropy_bottleneck"),
        ):
            exp = expected_bits(y[0], yi[0], codec.tables.gc) + expected_bits(
                np.clip(z[0], -32768, 32767), z_idx[0], codec.tables.eb[eb_name]
            )
            actual = 8.0 * (len(strings[0]) + len(strings[1]))
            # 0.5% + fixed flush/container constants (two streams)
            assert abs(actual - exp) <= 0.005 * exp + 64 * 8, (
                actual, exp, actual / exp,
            )
