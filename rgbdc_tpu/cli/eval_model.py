"""Offline model evaluation CLI (reference
CompressAI/compressai/utils/eval_model/__main__.py:80-129): pad to x64,
compress/decompress (or estimation-only forward), aggregate
psnr/ms-ssim/bpp/enc-time/dec-time over a folder, emit JSON.

Usage: python -m rgbdc_tpu.cli.eval_model -m ELIC -d <root> [-c ckpt]
       [--entropy-estimation] [--tiny]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def options(argv=None):
    p = argparse.ArgumentParser(description="evaluate a codec over a folder")
    p.add_argument("-m", "--model", default="ELIC")
    p.add_argument("-d", "--dataset_path", required=True)
    p.add_argument("--channel", type=int, default=3, choices=[1, 3, 4])
    p.add_argument("-q", "--quality", default="2")
    p.add_argument("-c", "--checkpoint", default=None)
    p.add_argument("--entropy-estimation", action="store_true",
                   help="likelihood-based bpp instead of real coding")
    p.add_argument("--debug", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("-o", "--output", default=None, help="JSON output path")
    return p.parse_args(argv)


def main(argv=None):
    args = options(argv)
    from ..data import ImageFolder
    from ..eval.metrics import compute_metrics
    from ..eval.padding import crop_to, pad_to_multiple
    from ..models import ElicCodec, build_model
    from ..utils.config import mlic_model_config, model_config, tiny_model_config

    if args.tiny:
        config = tiny_model_config()
    elif "MLIC" in args.model:
        config = mlic_model_config()
    else:
        config = model_config()

    in_ch = 3 if args.channel == 3 else 1
    model = build_model(args.model, config, in_ch=in_ch)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, 128, 128, in_ch)),
        training=True,
    )
    if args.checkpoint:
        from ..training.checkpoint import load_params

        variables = {"params": load_params(args.checkpoint, variables["params"])}

    ds = ImageFolder(args.dataset_path, channel=in_ch, debug=args.debug)
    results = {"psnr": [], "ms-ssim": [], "bpp": [], "enc_time": [], "dec_time": []}

    if args.entropy_estimation:
        fwd = jax.jit(lambda v, x: model.apply(v, x, training=False))
        for i in range(len(ds)):
            img, _ = ds[i]
            x = jnp.asarray(img)[None]
            h, w = x.shape[1:3]
            x_pad, _ = pad_to_multiple(x, 64)
            t0 = time.time()
            out = fwd(variables, x_pad)
            jax.block_until_ready(out["x_hat"])
            dt = time.time() - t0
            bpp = float(
                sum(
                    -jnp.sum(jnp.log2(lik)) for lik in out["likelihoods"].values()
                )
                / (h * w)
            )
            p, m = compute_metrics(x, crop_to(out["x_hat"], (h, w)))
            results["psnr"].append(p)
            results["ms-ssim"].append(m)
            results["bpp"].append(bpp)
            results["enc_time"].append(dt)
            results["dec_time"].append(0.0)
    else:
        codec = ElicCodec(model, variables)
        for i in range(len(ds)):
            img, _ = ds[i]
            x = jnp.asarray(img)[None]
            h, w = x.shape[1:3]
            x_pad, _ = pad_to_multiple(x, 64)
            t0 = time.time()
            out = codec.compress(x_pad)
            enc_t = time.time() - t0
            nbytes = sum(len(s) for sl in out["strings"] for s in sl)
            t0 = time.time()
            dec = codec.decompress(out["strings"], out["shape"])
            x_hat = crop_to(dec["x_hat"], (h, w))
            jax.block_until_ready(x_hat)
            dec_t = time.time() - t0
            p, m = compute_metrics(x, x_hat)
            results["psnr"].append(p)
            results["ms-ssim"].append(m)
            results["bpp"].append(nbytes * 8 / (h * w))
            results["enc_time"].append(enc_t)
            results["dec_time"].append(dec_t)

    summary = {
        "name": args.model,
        "results": {k: float(np.mean(v)) for k, v in results.items()},
    }
    text = json.dumps(summary, indent=2)
    print(text)
    if args.output:
        with open(args.output, "w") as f:
            f.write(text)
    return summary


if __name__ == "__main__":
    main(sys.argv[1:])
