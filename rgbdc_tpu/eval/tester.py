"""Codec evaluation (L5) — real enc/dec round-trips through bitstream files.

Reference behaviors (testing/tester*.py):
  - pad input to x64 (replicate), compress, write file with (H,W) header +
    body, re-read, decompress, crop, compute PSNR/MS-SSIM
  - bpp = encoded filesize * 8 / (H*W) (tester_single.py:115-135)
  - united: two files (rgb, depth), per-modality metrics
  - reconstructions saved as 8-bit PNGs (+16-bit depth via x10000/x100000)
  - per-image log lines + final averages
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..coder import read_body, read_uints, write_body, write_uints
from ..data import ImageFolder, ImageFolderUnited
from ..eval.metrics import AverageMeter, compute_metrics
from ..eval.padding import crop_to, pad_to_multiple
from ..models import ElicCodec, UnitedCodec, build_model
from ..training.checkpoint import restore_checkpoint
from ..utils.logger import setup_logger


def _save_png(arr: np.ndarray, path: Path, depth_scale: float | None = None):
    from PIL import Image

    arr = np.clip(np.asarray(arr), 0, 1)
    if arr.shape[-1] == 1:
        if depth_scale:
            img16 = (arr[..., 0] * depth_scale).astype(np.uint16)
            Image.fromarray(img16).save(path.with_suffix(".16bit.png"))
        img = (arr[..., 0] * 255).round().astype(np.uint8)
    else:
        img = (arr * 255).round().astype(np.uint8)
    Image.fromarray(img).save(path)


class Tester:
    """Base: build model, restore weights, build CDF tables (update)."""

    codec_cls = ElicCodec
    in_ch = 3

    def __init__(self, args, config):
        self.args = args
        self.config = config
        self.debug = getattr(args, "debug", False)
        exp_root = "experiments_test" if self.debug else "experiments"
        self.exp_dir = Path(getattr(args, "experiments_dir", exp_root)) / (
            getattr(args, "experiment", "") or f"test_{args.model}_{args.quality}"
        )
        self.stream_dir = self.exp_dir / "codestream"
        self.rec_dir = self.exp_dir / "rec"
        self.stream_dir.mkdir(parents=True, exist_ok=True)
        self.rec_dir.mkdir(parents=True, exist_ok=True)
        self.logger = setup_logger("test", str(self.exp_dir / "logs"))

        self.model = self.build_model()
        self.variables = self.restore()
        self.codec = self.codec_cls(self.model, self.variables)

    def build_model(self):
        in_ch = self.in_ch if self.codec_cls is ElicCodec else None
        return build_model(self.args.model, self.config, in_ch=in_ch)

    def _example_inputs(self):
        if self.codec_cls is UnitedCodec:
            return (
                jnp.zeros((1, 128, 128, 3)),
                jnp.zeros((1, 128, 128, 1)),
            )
        return (jnp.zeros((1, 128, 128, self.in_ch)),)

    def restore(self):
        variables = self.model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            *self._example_inputs(),
            training=True,
        )
        ckpt = getattr(self.args, "checkpoint", None)
        if not ckpt:
            # default to the experiment's best checkpoint, like the
            # reference tester (testing/tester.py:100-108)
            cand = self.exp_dir / "checkpoints" / "checkpoint_best_loss.msgpack"
            ckpt = str(cand) if cand.exists() else None
        if ckpt:
            from ..training.checkpoint import load_params

            variables = {"params": load_params(ckpt, variables["params"])}
            self.logger.info(f"restored {ckpt}")
        else:
            self.logger.warning("no checkpoint given/found — random weights")
        return variables


class TesterSingle(Tester):
    """Single-modality round-trip over {root}/rgb or {root}/depth."""

    def __init__(self, args, config):
        self.in_ch = 3 if getattr(args, "channel", 3) == 3 else 1
        super().__init__(args, config)

    def dataset(self):
        return ImageFolder(
            self.args.dataset_path, channel=3 if self.in_ch == 3 else 1,
            debug=self.debug,
        )

    def test_model(self, padding_mode="replicate0", padding=True):
        ds = self.dataset()
        meters = {k: AverageMeter() for k in ("psnr", "msssim", "bpp", "enc_t", "dec_t")}
        for i in range(len(ds)):
            img, stem = ds[i]
            x = jnp.asarray(img)[None]
            h, w = x.shape[1:3]
            x_pad, size = pad_to_multiple(x, 64, padding_mode)

            path = self.stream_dir / f"{stem}.bin"
            t0 = time.time()
            out = self.codec.compress(x_pad)
            with open(path, "wb") as f:
                write_uints(f, (h, w))
                write_body(f, out["shape"], out["strings"])
            enc_t = time.time() - t0

            t0 = time.time()
            with open(path, "rb") as f:
                read_uints(f, 2)
                strings, shape = read_body(f)
            dec = self.codec.decompress(strings, shape)
            x_hat = crop_to(dec["x_hat"], (h, w), padding_mode)
            jax.block_until_ready(x_hat)
            dec_t = time.time() - t0

            bpp = path.stat().st_size * 8 / (h * w)
            p, m = compute_metrics(x, x_hat)
            for k, v in zip(
                ("psnr", "msssim", "bpp", "enc_t", "dec_t"), (p, m, bpp, enc_t, dec_t)
            ):
                meters[k].update(v)
            scale = {1: 10000.0}.get(self.in_ch) if self.in_ch == 1 else None
            _save_png(
                np.asarray(x_hat)[0],
                self.rec_dir / f"{stem}_bpp{bpp:.3f}_psnr{p:.2f}.png",
                depth_scale=scale,
            )
            self.logger.info(
                f"{stem}: bpp={bpp:.4f} psnr={p:.3f} msssim={m:.5f} "
                f"enc={enc_t:.3f}s dec={dec_t:.3f}s"
            )
        self._finish(meters)
        return {k: v.avg for k, v in meters.items()}

    def _finish(self, meters):
        self.logger.info(
            "AVG: "
            + " ".join(f"{k}={v.avg:.4f}" for k, v in meters.items())
        )
        self._write_manifest()

    def _write_manifest(self):
        """Filename manifest of the written reconstructions (reference
        tester_single.py:108-113)."""
        recs = sorted(p.name for p in self.rec_dir.iterdir())
        (self.exp_dir / "rec_manifest.txt").write_text("\n".join(recs) + "\n")


class TesterUnited(Tester):
    """Paired-stream RGB-D round-trip over {root}/rgb + {root}/depth."""

    codec_cls = UnitedCodec

    def test_model(self, padding_mode="replicate0", padding=True):
        ds = ImageFolderUnited(self.args.dataset_path, debug=self.debug)
        keys = ("r_psnr", "r_msssim", "r_bpp", "d_psnr", "d_msssim", "d_bpp",
                "enc_t", "dec_t")
        meters = {k: AverageMeter() for k in keys}
        for i in range(len(ds)):
            rgb, depth, rname, dname = ds[i]
            r = jnp.asarray(rgb)[None]
            d = jnp.asarray(depth)[None]
            h, w = r.shape[1:3]
            r_pad, size = pad_to_multiple(r, 64, padding_mode)
            d_pad, _ = pad_to_multiple(d, 64, padding_mode)

            rpath = self.stream_dir / f"{rname}_rgb.bin"
            dpath = self.stream_dir / f"{dname}_depth.bin"
            t0 = time.time()
            out = self.codec.compress(r_pad, d_pad)
            with open(rpath, "wb") as f:
                write_uints(f, (h, w))
                write_body(f, out["shape"], out["r_strings"])
            with open(dpath, "wb") as f:
                write_uints(f, (h, w))
                write_body(f, out["shape"], out["d_strings"])
            enc_t = time.time() - t0

            t0 = time.time()
            with open(rpath, "rb") as f:
                read_uints(f, 2)
                r_strings, shape = read_body(f)
            with open(dpath, "rb") as f:
                read_uints(f, 2)
                d_strings, _ = read_body(f)
            dec = self.codec.decompress(r_strings, d_strings, shape)
            r_hat = crop_to(dec["x_hat"]["r"], (h, w), padding_mode)
            d_hat = crop_to(dec["x_hat"]["d"], (h, w), padding_mode)
            jax.block_until_ready(r_hat)
            dec_t = time.time() - t0

            r_bpp = rpath.stat().st_size * 8 / (h * w)
            d_bpp = dpath.stat().st_size * 8 / (h * w)
            rp, rm = compute_metrics(r, r_hat)
            dp, dm = compute_metrics(d, d_hat)
            for k, v in zip(keys, (rp, rm, r_bpp, dp, dm, d_bpp, enc_t, dec_t)):
                meters[k].update(v)
            _save_png(np.asarray(r_hat)[0], self.rec_dir / f"{rname}_rgb.png")
            _save_png(
                np.asarray(d_hat)[0],
                self.rec_dir / f"{dname}_depth.png",
                depth_scale=10000.0,
            )
            self.logger.info(
                f"{rname}: r_bpp={r_bpp:.4f} r_psnr={rp:.3f} "
                f"d_bpp={d_bpp:.4f} d_psnr={dp:.3f} enc={enc_t:.3f}s dec={dec_t:.3f}s"
            )
        self.logger.info(
            "AVG: " + " ".join(f"{k}={v.avg:.4f}" for k, v in meters.items())
        )
        return {k: v.avg for k, v in meters.items()}


class TesterConcat(TesterSingle):
    """Early-fusion: one 4-channel stream; metrics split rgb / depth."""

    def __init__(self, args, config):
        args.channel = 4
        self.in_ch = 4
        Tester.__init__(self, args, config)

    def test_model(self, padding_mode="replicate0", padding=True):
        ds = ImageFolderUnited(self.args.dataset_path, debug=self.debug)
        keys = ("r_psnr", "d_psnr", "bpp", "enc_t", "dec_t")
        meters = {k: AverageMeter() for k in keys}
        for i in range(len(ds)):
            rgb, depth, rname, _ = ds[i]
            x = jnp.asarray(np.concatenate([rgb, depth], axis=-1))[None]
            h, w = x.shape[1:3]
            x_pad, _ = pad_to_multiple(x, 64, padding_mode)
            path = self.stream_dir / f"{rname}.bin"
            t0 = time.time()
            out = self.codec.compress(x_pad)
            with open(path, "wb") as f:
                write_uints(f, (h, w))
                write_body(f, out["shape"], out["strings"])
            enc_t = time.time() - t0
            t0 = time.time()
            with open(path, "rb") as f:
                read_uints(f, 2)
                strings, shape = read_body(f)
            dec = self.codec.decompress(strings, shape)
            x_hat = crop_to(dec["x_hat"], (h, w), padding_mode)
            jax.block_until_ready(x_hat)
            dec_t = time.time() - t0
            bpp = path.stat().st_size * 8 / (h * w)
            rp, _ = compute_metrics(x[..., :3], x_hat[..., :3])
            dp, _ = compute_metrics(x[..., 3:], x_hat[..., 3:])
            for k, v in zip(keys, (rp, dp, bpp, enc_t, dec_t)):
                meters[k].update(v)
            self.logger.info(
                f"{rname}: bpp={bpp:.4f} r_psnr={rp:.3f} d_psnr={dp:.3f}"
            )
        self.logger.info(
            "AVG: " + " ".join(f"{k}={v.avg:.4f}" for k, v in meters.items())
        )
        return {k: v.avg for k, v in meters.items()}
