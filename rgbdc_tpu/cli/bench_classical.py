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


CODECS = {
    "jpeg": JPEGCodec,
    "webp": WebPCodec,
    "jpeg2000": JPEG2000Codec,
    "bpg": BPGCodec,
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
