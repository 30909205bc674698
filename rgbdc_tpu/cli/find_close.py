"""Bisect a classical codec's quality to hit a target metric value
(reference CompressAI/compressai/utils/find_close/__main__.py:37-114).

Usage: python -m rgbdc_tpu.cli.find_close jpeg image.png 35 --metric psnr
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from .bench_classical import CODECS


def options(argv=None):
    p = argparse.ArgumentParser(description="find codec quality hitting a target")
    p.add_argument("codec", choices=sorted(CODECS))
    p.add_argument("image")
    p.add_argument("target", type=float)
    p.add_argument("--metric", default="psnr", choices=["psnr", "ms-ssim", "bpp"])
    p.add_argument("--tol", type=float, default=0.1)
    return p.parse_args(argv)


def main(argv=None):
    args = options(argv)
    from PIL import Image

    img = np.asarray(Image.open(args.image).convert("RGB"), np.float32) / 255.0

    lo, hi = 1, 100
    best = None
    while hi - lo > 1:
        q = (lo + hi) // 2
        res = CODECS[args.codec](q).run(img)
        val = res[args.metric]
        best = (q, res)
        print(f"q={q}: {args.metric}={val:.4f}")
        if abs(val - args.target) <= args.tol:
            break
        # psnr/ms-ssim/bpp all increase with quality for these codecs
        if val < args.target:
            lo = q
        else:
            hi = q
    q, res = best
    print(f"closest: q={q} -> {res}")
    return best


if __name__ == "__main__":
    main(sys.argv[1:])
