"""End-to-end tester integration: real bitstream files on disk, metrics,
reconstructions, manifests — over a tiny synthetic image folder."""

import types
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from rgbdc_tpu.eval.tester import TesterSingle, TesterUnited
from rgbdc_tpu.utils.config import tiny_model_config


@pytest.fixture(scope="module")
def image_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("testimgs")
    (root / "rgb").mkdir()
    (root / "depth").mkdir()
    rng = np.random.default_rng(3)
    for i in range(2):
        arr = (rng.uniform(size=(96, 130, 3)) * 255).astype(np.uint8)  # non-x64
        Image.fromarray(arr).save(root / "rgb" / f"im{i}.png")
        d = (rng.uniform(size=(96, 130)) * 9000 + 100).astype(np.uint16)
        Image.fromarray(d).save(root / "depth" / f"im{i}.png")
    return root


def _args(root, exp_dir, model, channel):
    return types.SimpleNamespace(
        model=model,
        channel=channel,
        dataset_path=str(root),
        quality="2" if channel != 4 else "2_2",
        checkpoint=None,
        checkpoint_aux=None,
        debug=False,
        experiment="t",
        experiments_dir=str(exp_dir),
    )


class TestTesterSingle:
    def test_roundtrip_files_and_metrics(self, image_root, tmp_path):
        tester = TesterSingle(
            _args(image_root, tmp_path, "ELIC", 3), tiny_model_config()
        )
        res = tester.test_model()
        assert np.isfinite(res["psnr"]) and res["bpp"] > 0
        streams = list(tester.stream_dir.glob("*.bin"))
        recs = list(tester.rec_dir.glob("*.png"))
        assert len(streams) == 2 and len(recs) == 2
        assert (tester.exp_dir / "rec_manifest.txt").exists()
        # the bitstream file is a real container: header + body re-readable
        from rgbdc_tpu.coder import read_body, read_uints

        with open(streams[0], "rb") as f:
            h, w = read_uints(f, 2)
            strings, shape = read_body(f)
        assert (h, w) == (96, 130)
        assert len(strings) == 2


class TestTesterUnited:
    def test_paired_streams(self, image_root, tmp_path):
        tester = TesterUnited(
            _args(image_root, tmp_path, "ELIC_united", 4), tiny_model_config()
        )
        res = tester.test_model()
        assert np.isfinite(res["r_psnr"]) and np.isfinite(res["d_psnr"])
        assert res["r_bpp"] > 0 and res["d_bpp"] > 0
        rgb_streams = list(tester.stream_dir.glob("*_rgb.bin"))
        depth_streams = list(tester.stream_dir.glob("*_depth.bin"))
        assert len(rgb_streams) == 2 and len(depth_streams) == 2
        # 16-bit depth reconstructions saved
        assert list(tester.rec_dir.glob("*depth.16bit.png"))
