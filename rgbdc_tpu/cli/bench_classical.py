"""Classical-codec benchmark CLI (reference
CompressAI/compressai/utils/bench/__main__.py + codecs.py): run standard
image codecs over a folder and collect RD points.

In-process codecs (PIL): jpeg, webp, jpeg2000.  External binaries (bpg,
vtm, hm, av1) follow the reference's subprocess pattern and are gated on
availability in PATH.

Usage: python -m rgbdc_tpu.cli.bench_classical jpeg -d <root> -q 10 30 50
"""

from __future__ import annotations

import argparse
import io
import json
import shutil
import subprocess
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np


def _metrics(a: np.ndarray, b: np.ndarray):
    import jax.numpy as jnp

    from ..eval.metrics import compute_metrics

    return compute_metrics(jnp.asarray(a)[None], jnp.asarray(b)[None])


class PILCodec:
    fmt = "JPEG"
    ext = ".jpg"

    def __init__(self, quality: int):
        self.quality = int(quality)

    def run(self, img: np.ndarray) -> dict:
        from PIL import Image

        pil = Image.fromarray((img * 255).round().astype(np.uint8))
        buf = io.BytesIO()
        t0 = time.time()
        pil.save(buf, format=self.fmt, quality=self.quality)
        enc_t = time.time() - t0
        nbytes = buf.tell()
        buf.seek(0)
        t0 = time.time()
        rec = np.asarray(Image.open(buf).convert("RGB"), dtype=np.float32) / 255.0
        dec_t = time.time() - t0
        p, m = _metrics(img, rec)
        h, w = img.shape[:2]
        return {
            "psnr": p, "ms-ssim": m, "bpp": nbytes * 8 / (h * w),
            "encoding_time": enc_t, "decoding_time": dec_t,
        }


class JPEGCodec(PILCodec):
    fmt, ext = "JPEG", ".jpg"


class WebPCodec(PILCodec):
    fmt, ext = "WebP", ".webp"


class JPEG2000Codec(PILCodec):
    fmt, ext = "JPEG2000", ".jp2"

    def run(self, img):
        from PIL import Image

        pil = Image.fromarray((img * 255).round().astype(np.uint8))
        buf = io.BytesIO()
        t0 = time.time()
        # quality -> compression ratio (reference codecs.py uses rates)
        pil.save(buf, format="JPEG2000", quality_mode="rates",
                 quality_layers=[self.quality])
        enc_t = time.time() - t0
        nbytes = buf.tell()
        buf.seek(0)
        t0 = time.time()
        rec = np.asarray(Image.open(buf).convert("RGB"), dtype=np.float32) / 255.0
        dec_t = time.time() - t0
        p, m = _metrics(img, rec)
        h, w = img.shape[:2]
        return {
            "psnr": p, "ms-ssim": m, "bpp": nbytes * 8 / (h * w),
            "encoding_time": enc_t, "decoding_time": dec_t,
        }


class BPGCodec:
    """bpgenc/bpgdec subprocess codec (reference codecs.py BPG class)."""

    ext = ".bpg"

    def __init__(self, quality: int):
        self.quality = int(quality)
        if shutil.which("bpgenc") is None or shutil.which("bpgdec") is None:
            raise RuntimeError("bpgenc/bpgdec not found in PATH")

    def run(self, img: np.ndarray) -> dict:
        from PIL import Image

        with tempfile.TemporaryDirectory() as td:
            src = Path(td) / "in.png"
            enc = Path(td) / "out.bpg"
            dec = Path(td) / "dec.png"
            Image.fromarray((img * 255).round().astype(np.uint8)).save(src)
            t0 = time.time()
            subprocess.run(
                ["bpgenc", "-q", str(self.quality), "-o", str(enc), str(src)],
                check=True,
            )
            enc_t = time.time() - t0
            t0 = time.time()
            subprocess.run(["bpgdec", "-o", str(dec), str(enc)], check=True)
            dec_t = time.time() - t0
            rec = np.asarray(Image.open(dec).convert("RGB"), np.float32) / 255.0
            nbytes = enc.stat().st_size
        p, m = _metrics(img, rec)
        h, w = img.shape[:2]
        return {
            "psnr": p, "ms-ssim": m, "bpp": nbytes * 8 / (h * w),
            "encoding_time": enc_t, "decoding_time": dec_t,
        }


class VTMCodec:
    """VTM (VVC reference software) subprocess codec following the
    reference's driver shape (utils/bench/VTM_codecs.py): EncoderApp /
    DecoderApp over raw YUV, quality = QP.  Gated on the binaries +
    VTM_CFG_DIR pointing at the encoder config."""

    ext = ".bin"

    def __init__(self, quality: int):
        import os

        self.qp = int(quality)
        self.cfg = os.environ.get("VTM_CFG_DIR")
        if (
            shutil.which("EncoderApp") is None
            or shutil.which("DecoderApp") is None
            or not self.cfg
        ):
            raise RuntimeError(
                "VTM needs EncoderApp/DecoderApp in PATH and VTM_CFG_DIR set"
            )

    def run(self, img: np.ndarray) -> dict:
        from ..ops.color import rgb2ycbcr, ycbcr2rgb
        import jax.numpy as jnp

        h, w = img.shape[:2]
        ycc = np.asarray(rgb2ycbcr(jnp.asarray(img)[None]))[0]
        yuv = np.clip(ycc * 255, 0, 255).round().astype(np.uint8)
        with tempfile.TemporaryDirectory() as td:
            raw = Path(td) / "in.yuv"
            out = Path(td) / "out.bin"
            rec = Path(td) / "rec.yuv"
            # 4:4:4 planar
            raw.write_bytes(
                b"".join(yuv[..., c].tobytes() for c in range(3))
            )
            t0 = time.time()
            subprocess.run(
                [
                    "EncoderApp", "-c", f"{self.cfg}/encoder_intra_vtm.cfg",
                    "-i", str(raw), "-o", "", "-b", str(out),
                    "-wdt", str(w), "-hgt", str(h),
                    "-fr", "1", "-f", "1", "-q", str(self.qp),
                    "--InputChromaFormat=444", "--ConformanceWindowMode=1",
                ],
                check=True, capture_output=True,
            )
            enc_t = time.time() - t0
            t0 = time.time()
            subprocess.run(
                ["DecoderApp", "-b", str(out), "-o", str(rec), "-d", "8"],
                check=True, capture_output=True,
            )
            dec_t = time.time() - t0
            data = np.frombuffer(rec.read_bytes(), np.uint8)
            planes = data.reshape(3, h, w).transpose(1, 2, 0).astype(np.float32) / 255
            rgb_rec = np.asarray(ycbcr2rgb(jnp.asarray(planes)[None]))[0]
            nbytes = out.stat().st_size
        p, m = _metrics(img, np.clip(rgb_rec, 0, 1))
        return {
            "psnr": p, "ms-ssim": m, "bpp": nbytes * 8 / (h * w),
            "encoding_time": enc_t, "decoding_time": dec_t,
        }


CODECS = {
    "jpeg": JPEGCodec,
    "webp": WebPCodec,
    "jpeg2000": JPEG2000Codec,
    "bpg": BPGCodec,
    "vtm": VTMCodec,
}


def options(argv=None):
    p = argparse.ArgumentParser(description="benchmark classical codecs")
    p.add_argument("codec", choices=sorted(CODECS))
    p.add_argument("-d", "--dataset_path", required=True)
    p.add_argument("-q", "--qualities", type=int, nargs="+", default=[25, 50, 75])
    p.add_argument("-j", "--jobs", type=int, default=4)
    p.add_argument("--debug", action="store_true")
    p.add_argument("-o", "--output", default=None)
    return p.parse_args(argv)


def main(argv=None):
    args = options(argv)
    from ..data import ImageFolder

    ds = ImageFolder(args.dataset_path, channel=3, debug=args.debug)
    imgs = [ds[i][0] for i in range(len(ds))]

    results = {"name": args.codec, "results": {}}
    for q in args.qualities:
        codec = CODECS[args.codec](q)
        with ThreadPoolExecutor(args.jobs) as pool:
            rows = list(pool.map(codec.run, imgs))
        agg = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
        for k, v in agg.items():
            results["results"].setdefault(k, []).append(v)

    text = json.dumps(results, indent=2)
    print(text)
    if args.output:
        Path(args.output).write_text(text)
    return results


if __name__ == "__main__":
    main(sys.argv[1:])
