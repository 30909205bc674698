"""Serving-path stream statistics of a (trained) ELIC_united checkpoint on
the bench content: per-slice CDF-index histograms, symbol residual range,
escape rate, and stream sizes — the numbers that decide which pull format
the host lane encoder uses (docs/PERF.md "Index-stream elimination",
"5-bit symbol packing") and how fast the on-device scan decodes (escape
rows cost ~3x).

Run (real TPU):  python tools/stream_stats.py --ckpt calib/elic_united_q2.f16.msgpack
"""

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="calib/elic_united_q2.f16.msgpack")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--bound", default=None,
                    help="RGBDC_SCALE_BOUND override (default: leave env)")
    args = ap.parse_args()
    if args.bound is not None:
        os.environ["RGBDC_SCALE_BOUND"] = args.bound

    from rgbdc_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    from bench import _bench_images
    from rgbdc_tpu.models import ELICUnited, UnitedCodec
    from tools.export_calib import load_calib_params

    model = ELICUnited()
    rgb_np, depth_np = _bench_images(args.batch)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, 128, 128, 3)),
        jnp.zeros((1, 128, 128, 1)),
        training=True,
    )
    if args.ckpt and os.path.exists(args.ckpt):
        # device_put once — numpy args would re-upload per jitted call
        variables = jax.device_put(
            {"params": load_calib_params(args.ckpt, variables["params"])}
        )
        print(f"loaded {args.ckpt}", flush=True)
    else:
        print("UNTRAINED weights (no checkpoint found)")

    codec = UnitedCodec(model, variables)
    rgb, depth = jnp.asarray(rgb_np), jnp.asarray(depth_np)
    flow = codec._encode_stage_flow(rgb, depth)
    rz_sym, dz_sym, (r_packed, _), (d_packed, _), _, _ = flow
    rz, dz, (r_sym, r_idx), (d_sym, d_idx) = jax.device_get(
        (rz_sym, dz_sym, r_packed, d_packed)
    )

    def esc_rate(sym, idx, table):
        off = table.offset[idx.astype(np.int64)]
        maxv = table.cdf_length[idx.astype(np.int64)] - 2
        v = sym.astype(np.int64) - off
        return float(np.mean((v < 0) | (v >= maxv)))

    def z_esc(z_sym, eb_table):
        """EB (z-stream) escape rate: symbols outside the quantile-derived
        pmf support (+RGBDC_EB_MARGIN) divert to the bypass sideband —
        the q6 depth leak of VERDICT r4 weak #3."""
        c = z_sym.shape[-1]
        off = eb_table.offset[:c]
        maxv = eb_table.cdf_length[:c] - 2
        v = z_sym.astype(np.int64) - off
        return float(np.mean((v < 0) | (v >= maxv)))

    out = {"eb_margin": int(os.environ.get("RGBDC_EB_MARGIN", "2"))}
    for (name, sym, idx), z in (
        (("r", r_sym, r_idx), rz), (("d", d_sym, d_idx), dz)
    ):
        hist = np.bincount(idx.reshape(-1), minlength=64)
        top = np.argsort(hist)[::-1][:5]
        out[name] = {
            "n_sym": int(sym.size),
            "sym_min": int(sym.min()), "sym_max": int(sym.max()),
            "frac_in_5bit": float(np.mean((sym >= -15) & (sym <= 15))),
            "idx_distinct": int((hist > 0).sum()),
            "idx_top5": {int(i): float(hist[i] / idx.size) for i in top},
            "esc_rate_y": esc_rate(sym, idx, codec.tables.gc),
            "esc_rate_z": z_esc(
                z, codec.tables.eb[f"{'rgb' if name == 'r' else 'depth'}"
                                   "_entropy_bottleneck"]
            ),
            "esc_count_z": int(round(
                z_esc(z, codec.tables.eb[
                    f"{'rgb' if name == 'r' else 'depth'}_entropy_bottleneck"
                ]) * z.size
            )),
        }
    comp = codec.compress_lanes(rgb, depth)
    out["stream_bytes_per_img"] = {
        "r": int(np.mean([len(s) for s in comp["r_streams"]])),
        "d": int(np.mean([len(s) for s in comp["d_streams"]])),
    }
    h, w = rgb.shape[1:3]
    out["bpp"] = (
        8.0
        * (out["stream_bytes_per_img"]["r"] + out["stream_bytes_per_img"]["d"])
        / (h * w)
    )
    out["fallback_slices"] = getattr(codec, "last_fallback_slices", None)
    out["fast_slices"] = getattr(codec, "last_fast_slices", None)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
