"""Rate-distortion evaluation over the multi-lambda calibration sweep
(VERDICT r3 task 1): bpp / PSNR / MS-SSIM per quality point from the REAL
codec path (actual stream bytes, lane wire), next to classical-codec
anchors (JPEG / WebP / JPEG2000 via cli/bench_classical.py's PIL codecs)
on the SAME fixture images.

Protocol: the 3 committed photographic fixtures at 640x512 (the bench
content distribution, clean — no jitter).  Learned rows use the committed
calibration checkpoints calib/<stem>_q<Q>.f16.msgpack (fixture-overfit at
the reference lambda grid utils/rd_loss.py:15 — q0 0.0018 / q2 0.0067 /
q6 0.0932); this is a CALIBRATION sweep on the fixture corpus, not a
NYUv2 result (the reference's training data is not mounted here — see
docs/RD.md).  bpp is counted from the actual container bytes including
side info, per modality, exactly like the reference's file-size
accounting (testing/tester_united.py bpp-from-filesize).

Run (TPU):  python tools/rd_eval.py                 # all committed ckpts
            python tools/rd_eval.py --json out.json # also dump rows
Env: RGBDC_* serving knobs are set by this script for capacity, not perf.
"""

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
# capacity knobs: q6 streams are 3-5x wider than q2's — the eval process
# runs every quality, so the caps must fit the widest (import-time consts)
os.environ.setdefault("RGBDC_LANES", "512")
os.environ.setdefault("RGBDC_WMAX", "512")
os.environ.setdefault("RGBDC_DEVICE_ENCODE", "1")
os.environ.setdefault("RGBDC_DENSE128", "1")
os.environ.setdefault("RGBDC_DEC_ESCFIX", "1")
os.environ.setdefault("RGBDC_ENC_SCANOUT", "1")
os.environ.setdefault("RGBDC_FLAT_UPLOAD", "1")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

LAMBDAS = [0.0018, 0.0035, 0.0067, 0.013, 0.025, 0.0483, 0.0932, 0.18]


def fixture_images():
    """The 3 committed fixtures at 640x512, clean (no jitter)."""
    import numpy as np
    from PIL import Image

    root = os.path.join(_REPO, "tests", "fixtures", "rgbd")
    h, w = 512, 640
    rgbs, depths = [], []
    for i in range(3):
        stem = f"000{i + 1}.png"
        r = np.asarray(
            Image.open(os.path.join(root, "rgb", stem)).resize((w, h)),
            np.float32,
        ) / 255.0
        d = np.asarray(
            Image.open(os.path.join(root, "depth", stem)).convert("I").resize((w, h)),
            np.float32,
        )
        d = d / max(float(d.max()), 1.0)
        rgbs.append(r)
        depths.append(d[..., None])
    return np.stack(rgbs), np.stack(depths)


def eval_united(ckpt, quality, rgb_np, depth_np, model_name="ELIC_united"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rgbdc_tpu.eval.metrics import compute_metrics
    from rgbdc_tpu.models import UnitedCodec, build_model
    from rgbdc_tpu.utils.config import model_config

    from tools.export_calib import load_calib_params_device

    model = build_model(model_name, model_config())
    abstract = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            jnp.zeros((1, 128, 128, 3)), jnp.zeros((1, 128, 128, 1)),
            training=True,
        )
    )
    variables = {"params": load_calib_params_device(ckpt, abstract["params"])}
    codec = UnitedCodec(model, variables)
    rgb, depth = jnp.asarray(rgb_np), jnp.asarray(depth_np)
    out = codec.compress_lanes(rgb, depth)
    dec = codec.decompress_lanes(out["r_streams"], out["d_streams"], out["shape"])
    np.testing.assert_array_equal(
        np.asarray(dec["y_hat"]["r"]), np.asarray(out["y_hat"]["r"])
    )
    np.testing.assert_array_equal(
        np.asarray(dec["y_hat"]["d"]), np.asarray(out["y_hat"]["d"])
    )
    npix = rgb.shape[1] * rgb.shape[2]
    b = rgb.shape[0]
    r_bpp = sum(len(s) for s in out["r_streams"]) * 8 / (b * npix)
    d_bpp = sum(len(s) for s in out["d_streams"]) * 8 / (b * npix)
    r_psnr, r_ms = compute_metrics(dec["x_hat"]["r"], rgb)
    d_psnr, d_ms = compute_metrics(dec["x_hat"]["d"], depth)
    return {
        "model": model_name, "quality": quality,
        "lambda": LAMBDAS[int(quality[1:])],
        "r_bpp": round(r_bpp, 4), "d_bpp": round(d_bpp, 4),
        "r_psnr": round(r_psnr, 2), "r_msssim": round(r_ms, 4),
        "d_psnr": round(d_psnr, 2), "d_msssim": round(d_ms, 4),
    }


def eval_single(ckpt, quality, rgb_np):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rgbdc_tpu.eval.metrics import compute_metrics
    from rgbdc_tpu.models import ElicCodec, build_model
    from rgbdc_tpu.utils.config import model_config

    model = build_model("ELIC", model_config(), in_ch=3)
    abstract = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            jnp.zeros((1, 128, 128, 3)),
            training=True,
        )
    )
    from tools.export_calib import load_calib_params_device

    variables = {"params": load_calib_params_device(ckpt, abstract["params"])}
    codec = ElicCodec(model, variables)
    rgb = jnp.asarray(rgb_np)
    out = codec.compress_lanes(rgb)
    dec = codec.decompress_lanes(out["streams"], out["shape"])
    np.testing.assert_array_equal(
        np.asarray(dec["y_hat"]), np.asarray(out["y_hat"])
    )
    npix = rgb.shape[1] * rgb.shape[2]
    b = rgb.shape[0]
    bpp = sum(len(s) for s in out["streams"]) * 8 / (b * npix)
    psnr, ms = compute_metrics(dec["x_hat"], rgb)
    return {
        "model": "ELIC", "quality": quality,
        "lambda": LAMBDAS[int(quality[1:])],
        "bpp": round(bpp, 4), "psnr": round(psnr, 2), "msssim": round(ms, 4),
    }


def eval_classical(rgb_np, depth_np):
    """JPEG / WebP / JPEG2000 anchors on the same images (the PIL codecs of
    cli/bench_classical.py; VTM/HM/BPG/AV1 are binary-gated and absent in
    this image — their harness support is tested separately)."""
    import numpy as np

    from rgbdc_tpu.cli.bench_classical import (
        JPEG2000Codec, JPEGCodec, WebPCodec,
    )

    rows = []
    grids = {
        "jpeg": (JPEGCodec, [10, 20, 35, 50, 70, 85, 95]),
        "webp": (WebPCodec, [5, 15, 30, 50, 70, 85, 95]),
        "jpeg2000": (JPEG2000Codec, [25, 35, 50, 70, 90, 120, 160]),
    }
    for name, (cls, qs) in grids.items():
        for q in qs:
            codec = cls(q)
            agg = {"bpp": [], "psnr": [], "msssim": [],
                   "d_bpp": [], "d_psnr": []}
            depth_ok = name != "jpeg2000"  # its PIL path is RGB-only
            for i in range(rgb_np.shape[0]):
                r = codec.run(rgb_np[i])
                agg["bpp"].append(r["bpp"])
                agg["psnr"].append(r["psnr"])
                agg["msssim"].append(r["ms-ssim"])
                if depth_ok:
                    d = codec.run(depth_np[i])
                    agg["d_bpp"].append(d["bpp"])
                    agg["d_psnr"].append(d["psnr"])
            row = {
                "model": name, "quality": q,
                "bpp": round(float(np.mean(agg["bpp"])), 4),
                "psnr": round(float(np.mean(agg["psnr"])), 2),
                "msssim": round(float(np.mean(agg["msssim"])), 4),
            }
            if depth_ok:
                row["d_bpp"] = round(float(np.mean(agg["d_bpp"])), 4)
                row["d_psnr"] = round(float(np.mean(agg["d_psnr"])), 2)
            else:
                # RGB-only PIL path (JPEG2000): no depth-modal datapoint
                row["d_bpp"] = row["d_psnr"] = "n/a (RGB-only PIL path)"
            rows.append(row)
    return rows


def _interp_anchor(classical, name, bpp):
    """PSNR of anchor ``name`` interpolated at rate ``bpp`` (linear in
    log-bpp, the usual RD-curve interpolation).  None outside the anchor's
    measured rate range — no extrapolated claims."""
    import math

    pts = sorted(
        (float(r["bpp"]), float(r["psnr"]))
        for r in classical if r["model"] == name
    )
    if not pts or bpp < pts[0][0] or bpp > pts[-1][0]:
        return None
    for (b0, p0), (b1, p1) in zip(pts, pts[1:]):
        if b0 <= bpp <= b1:
            t = (math.log(bpp) - math.log(b0)) / (math.log(b1) - math.log(b0))
            return p0 + t * (p1 - p0)
    return None


def _reading_section(learned_u, learned_su, learned_e, classical):
    """Generated claims: computed from the rows being written, never
    hand-maintained (the round-4 text went stale against its own table)."""
    lines = ["", "## Reading", ""]
    lines += [
        "What the table proves is the END-TO-END MULTI-RATE PIPELINE: "
        "every learned row came through train -> f16 export -> quantile "
        "fit -> REAL entropy-coded streams -> bit-exact decode -> "
        "file-size accounting, across the reference lambda grid.",
        "",
    ]
    # monotonicity: PSNR non-decreasing in lambda, per family/modality
    checks = []
    for tag, rows_, key in (
        ("flagship RGB", learned_u, "r_psnr"),
        ("flagship depth", learned_u, "d_psnr"),
        ("STF_united RGB", learned_su, "r_psnr"),
        ("STF_united depth", learned_su, "d_psnr"),
        ("ELIC", learned_e, "psnr"),
    ):
        if len(rows_) < 2:
            continue
        seq = [float(r[key]) for r in sorted(rows_, key=lambda r: r["lambda"])]
        ok = all(a <= b + 1e-9 for a, b in zip(seq, seq[1:]))
        checks.append((tag, ok, seq))
    mono = [t for t, ok, _ in checks if ok]
    non = [(t, s) for t, ok, s in checks if not ok]
    if mono:
        lines.append(
            "Distortion is monotone in lambda for: " + ", ".join(mono) + "."
        )
    for t, s in non:
        lines.append(
            f"NON-MONOTONE: {t} PSNR over the grid reads "
            + " -> ".join(f"{v:.2f}" for v in s) + " dB."
        )
    # learned vs anchors at matched rate (interpolated on the anchor curve)
    beats = []
    for fam, rows_ in (("flagship", learned_u), ("STF_united", learned_su)):
        for r in rows_:
            for anchor in ("webp", "jpeg"):
                a = _interp_anchor(classical, anchor, float(r["r_bpp"]))
                if a is not None and float(r["r_psnr"]) > a:
                    beats.append(
                        f"{fam} {r['quality']} RGB {r['r_psnr']} dB @ "
                        f"{r['r_bpp']} bpp vs {anchor} {a:.2f} dB"
                    )
    for r in learned_e:
        for anchor in ("webp", "jpeg"):
            a = _interp_anchor(classical, anchor, float(r["bpp"]))
            if a is not None and float(r["psnr"]) > a:
                beats.append(
                    f"ELIC {r['quality']} {r['psnr']} dB @ {r['bpp']} bpp "
                    f"vs {anchor} {a:.2f} dB"
                )
    lines.append("")
    if beats:
        lines.append(
            "Learned points beating a classical anchor at matched rate "
            "(anchor PSNR log-bpp-interpolated at the learned point's "
            "rate):"
        )
        lines += [f"- {b}" for b in beats]
    else:
        lines.append(
            "No learned point beats the classical anchors at matched rate "
            "on this corpus at the current calibration budget."
        )
    lines += [
        "",
        "What the table does NOT claim: parity with the reference's "
        "published NYUv2 curves — these calibrations are 3-16k "
        "fixture-overfit steps against the reference protocol's 400 "
        "epochs on NYU5k.  Closing that gap is a training-compute "
        "question, not a framework one: the trainers, losses, lambda "
        "grid, export path, and serving stack exercised here are the "
        "production path.",
    ]
    return lines


def write_md(rows, path):
    """docs/RD.md: the multi-lambda calibration RD table with classical
    anchors (VERDICT r3 task 1)."""
    learned_u = [r for r in rows if r["model"] == "ELIC_united"]
    learned_su = [r for r in rows if r["model"] == "STF_united"]
    learned_e = [r for r in rows if r["model"] == "ELIC"]
    classical = [r for r in rows if r["model"] in ("jpeg", "webp", "jpeg2000")]
    lines = [
        "# Rate-distortion evidence (round 5)",
        "",
        "Multi-lambda calibration sweep on the committed fixture corpus "
        "(3 photographic RGB-D images at 640x512 — the bench content "
        "distribution), learned rows from the REAL codec path (actual lane "
        "container bytes incl. side info; roundtrip bit-exactness asserted "
        "per run), classical anchors on the SAME images.",
        "",
        "**Scope**: the reference's headline result is NYUv2/SUN RD curves "
        "(`/root/reference/README.md:20-24`); its training data is not "
        "mounted in this environment, so these are fixture-overfit "
        "calibration points at the reference lambda grid "
        "(`utils/rd_loss.py:15`) — they demonstrate the full multi-rate "
        "pipeline (train -> export -> serve -> RD-account across the "
        "grid), not NYUv2 generalization.  Produced by "
        "`tools/rd_eval.py` (protocol + accounting there).",
        "",
        "## ELIC_united (flagship, RGB-D) — reference lambda grid",
        "",
        "| q | lambda | RGB bpp | RGB PSNR | RGB MS-SSIM | D bpp | D PSNR | D MS-SSIM |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in learned_u:
        lines.append(
            f"| {r['quality']} | {r['lambda']} | {r['r_bpp']} | "
            f"{r['r_psnr']} | {r['r_msssim']} | {r['d_bpp']} | "
            f"{r['d_psnr']} | {r['d_msssim']} |"
        )
    if learned_su:
        lines += [
            "",
            "## STF_united (swin united, RGB-D) — multi-rate "
            "(VERDICT r4 task 4)",
            "",
            "| q | lambda | RGB bpp | RGB PSNR | RGB MS-SSIM | D bpp "
            "| D PSNR | D MS-SSIM |",
            "|---|---|---|---|---|---|---|---|",
        ]
        for r in learned_su:
            lines.append(
                f"| {r['quality']} | {r['lambda']} | {r['r_bpp']} | "
                f"{r['r_psnr']} | {r['r_msssim']} | {r['d_bpp']} | "
                f"{r['d_psnr']} | {r['d_msssim']} |"
            )
    lines += [
        "",
        "## ELIC (single-modality RGB)",
        "",
        "| q | lambda | bpp | PSNR | MS-SSIM |",
        "|---|---|---|---|---|",
    ]
    for r in learned_e:
        lines.append(
            f"| {r['quality']} | {r['lambda']} | {r['bpp']} | {r['psnr']} | "
            f"{r['msssim']} |"
        )
    lines += [
        "",
        "## Classical anchors (same images; PIL codecs — VTM/HM/BPG/AV1 "
        "binaries are absent in this environment, their harnesses are "
        "binary-gated in cli/bench_classical.py)",
        "",
        "RGB coded natively; depth coded as 8-bit mono (the reference's "
        "JPEG-family depth protocol).",
        "",
        "| codec | q | RGB bpp | RGB PSNR | RGB MS-SSIM | D bpp | D PSNR |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in classical:
        lines.append(
            f"| {r['model']} | {r['quality']} | {r['bpp']} | {r['psnr']} | "
            f"{r['msssim']} | {r['d_bpp']} | {r['d_psnr']} |"
        )
    lines += _reading_section(learned_u, learned_su, learned_e, classical)
    lines += [
        "",
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="")
    ap.add_argument("--md", default="")
    ap.add_argument("--skip-learned", action="store_true")
    ap.add_argument("--skip-classical", action="store_true")
    ap.add_argument(
        "--only", default="",
        help="comma list of <stem>_<q> tokens (e.g. elic_united_q6,"
             "STF_united_q0): evaluate only these learned rows",
    )
    ap.add_argument(
        "--merge-json", default="",
        help="prior rows JSON (e.g. docs/RD.json): rows NOT re-evaluated "
             "this run are carried over, so a partial --only run still "
             "writes the full table",
    )
    args = ap.parse_args()
    only = set(t for t in args.only.split(",") if t)

    from rgbdc_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    rgb_np, depth_np = fixture_images()
    rows = []
    if not args.skip_learned:
        for q in [f"q{i}" for i in range(8)]:
            for stem, model_name in (
                ("elic_united", "ELIC_united"),
                ("STF_united", "STF_united"),
                ("ELIC", "ELIC"),
            ):
                ck = os.path.join(_REPO, "calib", f"{stem}_{q}.f16.msgpack")
                if not os.path.exists(ck):
                    continue
                if only and f"{stem}_{q}" not in only:
                    continue
                if model_name == "ELIC":
                    row = eval_single(ck, q, rgb_np)
                else:
                    row = eval_united(ck, q, rgb_np, depth_np, model_name)
                rows.append(row)
                print(json.dumps(row), flush=True)
    if not args.skip_classical:
        for row in eval_classical(rgb_np, depth_np):
            rows.append(row)
            print(json.dumps(row), flush=True)
    if args.merge_json:
        with open(args.merge_json) as f:
            prior = json.load(f)
        fresh = {(r["model"], str(r["quality"])) for r in rows}
        carried = [
            r for r in prior if (r["model"], str(r["quality"])) not in fresh
        ]
        def _qkey(q):
            s = str(q)
            return int(s[1:]) if s.startswith("q") else int(s)

        rows = sorted(rows + carried, key=lambda r: (r["model"], _qkey(r["quality"])))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)
    if args.md:
        write_md(rows, args.md)


if __name__ == "__main__":
    main()
