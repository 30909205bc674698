"""Classical-codec benchmark CLI (reference
CompressAI/compressai/utils/bench/__main__.py + codecs.py): run standard
image codecs over a folder and collect RD points.

In-process codecs (PIL): jpeg, webp, jpeg2000.  External binaries (bpg,
vtm, hm, av1, tfci) follow the reference's subprocess pattern
(codecs.py:188-717) and are gated on availability in PATH / env config,
raising a RuntimeError with setup instructions when absent.

Usage: python -m rgbdc_tpu.cli.bench_classical jpeg -d <root> -q 10 30 50
"""

from __future__ import annotations

import argparse
import io
import json
import os
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

        depth_modal = img.ndim == 3 and img.shape[2] == 1
        if depth_modal:
            # depth codes as 8-bit mono (the reference's depth_8bit protocol,
            # VTM_codecs.py:244 — PIL formats have no 16-bit path here)
            pil = Image.fromarray(
                (img[..., 0] * 255).round().astype(np.uint8), mode="L"
            )
        else:
            pil = Image.fromarray((img * 255).round().astype(np.uint8))
        buf = io.BytesIO()
        t0 = time.time()
        pil.save(buf, format=self.fmt, quality=self.quality)
        enc_t = time.time() - t0
        nbytes = buf.tell()
        buf.seek(0)
        t0 = time.time()
        mode = "L" if depth_modal else "RGB"
        rec = np.asarray(Image.open(buf).convert(mode), dtype=np.float32) / 255.0
        if depth_modal:
            rec = rec[..., None]
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


class _YUVBinaryCodec:
    """Shared raw-YUV subprocess driver (the pattern behind the reference's
    VTM/HM/AV1 classes, utils/bench/codecs.py:361-612 and the RGB-D modal
    variants in utils/bench/VTM_codecs.py:410-537): two layouts —

      * RGB modal: RGB -> YCbCr, 4:4:4 planar 8-bit raw (reference
        ``--modal RGB`` path);
      * depth modal: single-plane 4:0:0 monochrome raw at ``bitdepth`` 8
        (the reference's own depth path, VTM_codecs.py:410 ``mode="L"``,
        ``input_chroma_format="400"``) or 16 — the full fidelity of the
        16-bit depth PNGs, which the reference's "Taking 8bit input for
        now" driver truncates.

    Subclasses provide the command lines and availability gating."""

    ext = ".bin"
    qp_range = (0, 63)

    def __init__(self, quality: int, bitdepth: int = 8):
        self.qp = int(quality)
        self.bitdepth = int(bitdepth)
        assert self.bitdepth in (8, 16)
        lo, hi = self.qp_range
        if not lo <= self.qp <= hi:
            raise ValueError(f"Invalid quality value: {self.qp} ({lo},{hi})")
        self._check_available()

    def _check_available(self):
        raise NotImplementedError

    def _encode_cmd(self, raw: Path, out: Path, w: int, h: int,
                    chroma: str, bitdepth: int) -> list:
        raise NotImplementedError

    def _decode_cmd(self, out: Path, rec: Path, bitdepth: int) -> list:
        raise NotImplementedError

    def run(self, img: np.ndarray) -> dict:
        import jax.numpy as jnp

        from ..ops.color import rgb2ycbcr, ycbcr2rgb

        h, w = img.shape[:2]
        depth_modal = img.ndim == 3 and img.shape[2] == 1
        bitdepth = self.bitdepth if depth_modal else 8
        maxv = (1 << bitdepth) - 1
        dt = np.uint16 if bitdepth == 16 else np.uint8
        if depth_modal:
            planes = [np.clip(img[..., 0] * maxv, 0, maxv).round().astype(dt)]
            chroma = "400"
        else:
            ycc = np.asarray(rgb2ycbcr(jnp.asarray(img)[None]))[0]
            yuv = np.clip(ycc * 255, 0, 255).round().astype(np.uint8)
            planes = [yuv[..., c] for c in range(3)]
            chroma = "444"
        with tempfile.TemporaryDirectory() as td:
            raw = Path(td) / "in.yuv"
            out = Path(td) / f"out{self.ext}"
            rec = Path(td) / "rec.yuv"
            raw.write_bytes(b"".join(p.tobytes() for p in planes))
            t0 = time.time()
            subprocess.run(
                [str(c) for c in self._encode_cmd(raw, out, w, h, chroma, bitdepth)],
                check=True, capture_output=True,
            )
            enc_t = time.time() - t0
            t0 = time.time()
            subprocess.run(
                [str(c) for c in self._decode_cmd(out, rec, bitdepth)],
                check=True, capture_output=True,
            )
            dec_t = time.time() - t0
            data = np.frombuffer(rec.read_bytes(), dt)
            if depth_modal:
                rec_img = data.reshape(h, w, 1).astype(np.float32) / maxv
            else:
                pl = data.reshape(3, h, w).transpose(1, 2, 0).astype(np.float32) / 255
                rec_img = np.asarray(ycbcr2rgb(jnp.asarray(pl)[None]))[0]
            nbytes = out.stat().st_size
        p, m = _metrics(img, np.clip(rec_img, 0, 1))
        return {
            "psnr": p, "ms-ssim": m, "bpp": nbytes * 8 / (h * w),
            "encoding_time": enc_t, "decoding_time": dec_t,
        }


class VTMCodec(_YUVBinaryCodec):
    """VTM (VVC reference software): EncoderApp/DecoderApp, quality = QP
    0..63 (reference codecs.py:361-480; depth modal 4:0:0 variant
    VTM_codecs.py:410-537).  Gated on the binaries in PATH + VTM_CFG_DIR
    pointing at the encoder config dir."""

    qp_range = (0, 63)

    def _check_available(self):
        self.cfg = os.environ.get("VTM_CFG_DIR")
        if (
            shutil.which("EncoderApp") is None
            or shutil.which("DecoderApp") is None
            or not self.cfg
        ):
            raise RuntimeError(
                "VTM needs EncoderApp/DecoderApp in PATH and VTM_CFG_DIR set"
            )

    def _encode_cmd(self, raw, out, w, h, chroma, bitdepth):
        return [
            "EncoderApp", "-c", f"{self.cfg}/encoder_intra_vtm.cfg",
            "-i", raw, "-o", "", "-b", out,
            "-wdt", w, "-hgt", h, "-fr", "1", "-f", "1", "-q", self.qp,
            f"--InputChromaFormat={chroma}",
            f"--InputBitDepth={bitdepth}",
            f"--InternalBitDepth={min(bitdepth, 10) if bitdepth == 8 else bitdepth}",
            "--ConformanceWindowMode=1",
        ]

    def _decode_cmd(self, out, rec, bitdepth):
        return ["DecoderApp", "-b", out, "-o", rec, "-d", str(bitdepth)]


class HMCodec(_YUVBinaryCodec):
    """HM (H.265/HEVC reference software): TAppEncoder/TAppDecoder (or
    the *Static builds), quality = QP 0..51 (reference codecs.py:488-610;
    depth modal variant VTM_codecs.py:539-670).  Gated on the binaries in
    PATH + HM_CFG pointing at the intra config.  HM's RExt profiles cap
    at 16-bit input (monochrome16), covering the full depth range."""

    qp_range = (0, 51)

    def _check_available(self):
        self.enc = shutil.which("TAppEncoderStatic") or shutil.which("TAppEncoder")
        self.dec = shutil.which("TAppDecoderStatic") or shutil.which("TAppDecoder")
        self.cfg = os.environ.get("HM_CFG")
        if not (self.enc and self.dec and self.cfg):
            raise RuntimeError(
                "HM needs TAppEncoder[Static]/TAppDecoder[Static] in PATH "
                "and HM_CFG set to the encoder_intra config file"
            )

    def _encode_cmd(self, raw, out, w, h, chroma, bitdepth):
        cmd = [
            self.enc, "-c", self.cfg,
            "-i", raw, "-o", "/dev/null", "-b", out,
            "-wdt", w, "-hgt", h, "-fr", "1", "-f", "1", "-q", self.qp,
            f"--InputChromaFormat={chroma}",
            f"--InputBitDepth={bitdepth}",
            "--SEIDecodedPictureHash", "--Level=5.1",
            "--CUNoSplitIntraACT=0", "--ConformanceMode=1",
        ]
        if bitdepth == 16:
            cmd += ["--InternalBitDepth=16", "--Profile=monochrome16"]
        return cmd

    def _decode_cmd(self, out, rec, bitdepth):
        return [self.dec, "-b", out, "-o", rec, "-d", str(bitdepth)]


class AV1Codec(_YUVBinaryCodec):
    """AV1 (AOM reference software): aomenc/aomdec over raw i444, quality
    = cq-level 0..63 in 2-pass q mode (reference codecs.py:613-717).
    Gated on the binaries in PATH.  Depth modal uses monochrome 12-bit
    (libaom's maximum bit depth; 16-bit depth is clamped there)."""

    ext = ".webm"
    qp_range = (0, 63)

    def __init__(self, quality: int, bitdepth: int = 8):
        if bitdepth == 16:
            bitdepth = 8  # libaom caps at 12-bit; keep the 8-bit parity path
        super().__init__(quality, bitdepth)

    def _check_available(self):
        if shutil.which("aomenc") is None or shutil.which("aomdec") is None:
            raise RuntimeError("AV1 needs aomenc/aomdec in PATH")

    def _encode_cmd(self, raw, out, w, h, chroma, bitdepth):
        return [
            "aomenc", "-w", w, "-h", h,
            "--fps=1/1", "--limit=1", f"--input-bit-depth={bitdepth}",
            "--cpu-used=0", "--threads=1", "--passes=2", "--end-usage=q",
            f"--cq-level={self.qp}",
            "--monochrome" if chroma == "400" else "--i444", "--skip=0",
            "--tune=psnr", "--psnr", f"--bit-depth={bitdepth}",
            "-o", out, raw,
        ]

    def _decode_cmd(self, out, rec, bitdepth):
        return ["aomdec", out, "-o", rec, "--rawvideo",
                f"--output-bit-depth={bitdepth}"]


class TFCICodec:
    """tensorflow/compression `tfci.py` script driver (reference
    codecs.py:305-340): encode/decode PNGs via subprocess, quality 1..8,
    model picked by TFCI_MODEL.  Gated on TFCI_SCRIPT pointing at tfci.py
    (tensorflow is not in this image, so the script must bring its own
    interpreter environment via TFCI_PYTHON if needed)."""

    ext = ".tfci"
    models = (
        "bmshj2018-factorized-mse",
        "bmshj2018-hyperprior-mse",
        "mbt2018-mean-mse",
    )

    def __init__(self, quality: int):
        self.quality = int(quality)
        if not 1 <= self.quality <= 8:
            raise ValueError(f"Invalid quality value: {self.quality} (1,8)")
        self.script = os.environ.get("TFCI_SCRIPT")
        if not self.script or not Path(self.script).is_file():
            raise RuntimeError("TFCI needs TFCI_SCRIPT set to the tfci.py path")
        self.python = os.environ.get("TFCI_PYTHON", sys.executable)
        self.model = os.environ.get("TFCI_MODEL", self.models[0])

    def run(self, img: np.ndarray) -> dict:
        from PIL import Image

        if img.ndim == 3 and img.shape[2] == 1:
            raise RuntimeError("tfci models are RGB-only; use --modal rgb")
        h, w = img.shape[:2]
        with tempfile.TemporaryDirectory() as td:
            src = Path(td) / "in.png"
            out = Path(td) / "out.tfci"
            rec = Path(td) / "rec.png"
            Image.fromarray((img * 255).round().astype(np.uint8)).save(src)
            t0 = time.time()
            subprocess.run(
                [self.python, self.script, "compress",
                 f"{self.model}-{self.quality:d}", str(src), str(out)],
                check=True, capture_output=True,
            )
            enc_t = time.time() - t0
            t0 = time.time()
            subprocess.run(
                [self.python, self.script, "decompress", str(out), str(rec)],
                check=True, capture_output=True,
            )
            dec_t = time.time() - t0
            arr = np.asarray(Image.open(rec).convert("RGB"), np.float32) / 255.0
            nbytes = out.stat().st_size
        p, m = _metrics(img, arr)
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
    "hm": HMCodec,
    "av1": AV1Codec,
    "tfci": TFCICodec,
}


def options(argv=None):
    p = argparse.ArgumentParser(description="benchmark classical codecs")
    p.add_argument("codec", choices=sorted(CODECS))
    p.add_argument("-d", "--dataset_path", required=True)
    p.add_argument("-q", "--qualities", type=int, nargs="+", default=[25, 50, 75])
    p.add_argument("-j", "--jobs", type=int, default=4)
    p.add_argument(
        "--modal", choices=["rgb", "depth"], default="rgb",
        help="rgb: {root}/rgb as YCbCr 4:4:4; depth: {root}/depth as "
        "monochrome 4:0:0 (reference --modal, VTM_codecs.py:410)",
    )
    p.add_argument(
        "--depth-bitdepth", type=int, choices=[8, 16], default=16,
        help="raw bit depth for the depth modal on vtm/hm (8 = reference "
        "parity, 16 = full 16-bit depth-PNG fidelity)",
    )
    p.add_argument("--debug", action="store_true")
    p.add_argument("-o", "--output", default=None)
    return p.parse_args(argv)


def main(argv=None):
    args = options(argv)
    from ..data import ImageFolder

    channel = 3 if args.modal == "rgb" else 1
    ds = ImageFolder(args.dataset_path, channel=channel, debug=args.debug)
    imgs = [ds[i][0] for i in range(len(ds))]

    results = {"name": args.codec, "modal": args.modal, "results": {}}
    for q in args.qualities:
        cls = CODECS[args.codec]
        if args.modal == "depth" and issubclass(cls, _YUVBinaryCodec):
            codec = cls(q, bitdepth=args.depth_bitdepth)
        else:
            codec = cls(q)
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
