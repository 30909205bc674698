"""RD-curve plotting CLI (reference CompressAI/compressai/utils/plot):
read bench/eval JSON files and plot metric-vs-bpp curves.

Usage: python -m rgbdc_tpu.cli.plot -f a.json b.json --metric psnr -o rd.png
"""

from __future__ import annotations

import argparse
import json
import sys


def options(argv=None):
    p = argparse.ArgumentParser(description="plot RD curves from result JSON")
    p.add_argument("-f", "--results-file", nargs="+", required=True)
    p.add_argument("--metric", default="psnr", choices=["psnr", "ms-ssim"])
    p.add_argument("-t", "--title", default="RD curve")
    p.add_argument("-o", "--output", default=None)
    return p.parse_args(argv)


def _series(data, metric):
    res = data["results"]
    bpp = res["bpp"]
    vals = res[metric]
    if not isinstance(bpp, list):
        bpp, vals = [bpp], [vals]
    order = sorted(range(len(bpp)), key=lambda i: bpp[i])
    return [bpp[i] for i in order], [vals[i] for i in order]


def main(argv=None):
    args = options(argv)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 5))
    for path in args.results_file:
        with open(path) as f:
            data = json.load(f)
        bpp, vals = _series(data, args.metric)
        ax.plot(bpp, vals, ".-", label=data.get("name", path))
    ax.set_xlabel("bpp")
    ax.set_ylabel(args.metric)
    ax.set_title(args.title)
    ax.grid(True, alpha=0.3)
    ax.legend()
    out = args.output or "rd_curve.png"
    fig.savefig(out, dpi=150, bbox_inches="tight")
    print(f"wrote {out}")


if __name__ == "__main__":
    main(sys.argv[1:])
