"""Zoo-wide serving throughput datapoints (VERDICT r2 weak #3): enc+dec
throughput of each model family's codec driver on 640x480 content, one
JSON line per model.  BASELINE.json's five configs name ELIC / ckbd / R2D /
ELIC_united / STF_united (+ MLIC++); bench.py measures the flagship lane
path — this harness covers the rest: the on-device lane path for every
standalone family (united, ELIC/ckbd, MLIC++, STF via
models/lane_single.py); only the aux-conditioned master cascade stays on
the compat host-serial format.

Models with a committed calibration checkpoint (calib/<name>_q2.f16.msgpack,
tools/train_calib.py --model <name>) bench on TRAINED statistics — live
sigma predictions at the reference 0.11 bound, with the checkpoint-gated
serving knobs (WMAX=128, onehot compaction/fetch) — exactly the flagship
bench protocol.  Models without one keep the round-2 untrained protocol
(sigma floor 16, neutral knobs).  Because the lane capacity knobs
(RGBDC_LANES/WMAX) are module-import-time constants, the default driver
mode runs EACH MODEL IN ITS OWN SUBPROCESS with the right env; --inproc is
the child entry (one model, env already set).

Run (real TPU):  python tools/bench_zoo.py --models ELIC ckbd MLIC STF STF_united
Env: ZOO_BATCH (default 8), ZOO_ITERS (default 3).
"""

import argparse
import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def calib_path(name: str) -> str:
    return os.path.join(_REPO, "calib", f"{name}_q2.f16.msgpack")


def env_for(name: str) -> dict:
    """Child env: the bench.py serving knob set, with the checkpoint-gated
    knobs enabled iff this model has a committed calibration checkpoint.
    Values already present in the caller's env win (A/B harness override)."""
    ck = calib_path(name)
    trained = os.path.exists(ck)
    knobs = {
        "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_cache",
        "RGBDC_DEVICE_ENCODE": "1",
        "RGBDC_BF16": "1",
        "RGBDC_LANES": "512",
        "RGBDC_DENSE128": "1",
        "RGBDC_DEC_ESCFIX": "1",
        "RGBDC_ENC_SCANOUT": "1",
        "RGBDC_FLAT_UPLOAD": "1",
    }
    if trained:
        knobs.update(
            RGBDC_WMAX="128",
            RGBDC_ENC_GCOMPACT="onehot",
            RGBDC_DEC_WFETCH="onehot",
            ZOO_CKPT=ck,
        )
    else:
        # untrained: sigma floor + wide word cap (floored streams run
        # ~170-330 u16/lane at 512 lanes) + neutral knobs (the onehot
        # modes only pay at a tight cap)
        knobs.update(
            RGBDC_SCALE_BOUND="16",
            RGBDC_WMAX="512",
            RGBDC_ENC_GCOMPACT="0",
            RGBDC_DEC_WFETCH="gather",
        )
    env = dict(os.environ)
    env.update({k: v for k, v in knobs.items() if k not in os.environ})
    return env


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _codec_for(name, model, variables):
    from rgbdc_tpu.models import (
        ChannelARCodec, ElicCodec, MlicCodec, UnitedCodec,
    )

    if name in ("ELIC_united", "ELIC_united_R2D", "STF_united"):
        return UnitedCodec(model, variables)
    if name == "MLIC":
        return MlicCodec(model, variables)
    if name in ("STF",):
        return ChannelARCodec(model, variables)
    return ElicCodec(model, variables)


def bench_master(batch: int, iters: int, rgb_np, depth_np):
    """Full master cascade (reference testing/tester_master.py:27-148): the
    aux codec round-trips depth first, the master codec is conditioned on
    the DECODED aux + decoder taps.  Host-serial compat wire — the master
    front/synth take per-image aux conditioning, so it stays off the lane
    path (models/codec.py MasterCodec.LANE_SERVING)."""
    from rgbdc_tpu.models import ELIC, ELICMaster, ElicCodec, MasterCodec
    from rgbdc_tpu.utils.config import model_config

    cfg = model_config()
    kw = dict(N=cfg["N"], M=cfg["M"], slice_ch=tuple(cfg["slice_ch"]))
    aux_model = ELIC(**kw, in_ch=1, return_mid=True)
    aux_vars = aux_model.init(
        {"params": jax.random.PRNGKey(42), "noise": jax.random.PRNGKey(43)},
        jnp.zeros((1, 256, 256, 1)),
        training=True,
    )
    ckpt = os.environ.get("ZOO_CKPT")
    if ckpt:
        from tools.export_calib import load_calib_params_device

        aux_ck = ckpt.replace("_q2.f16.msgpack", "_aux_q2.f16.msgpack")
        aux_vars = {
            "params": load_calib_params_device(aux_ck, aux_vars["params"])
        }
        print(
            f"# master: calibration checkpoints {os.path.basename(ckpt)} + "
            f"{os.path.basename(aux_ck)}, sigma bound "
            f"{os.environ.get('RGBDC_SCALE_BOUND', '0.11 (default)')}",
            flush=True,
        )
    aux_codec = ElicCodec(aux_model, aux_vars)

    master = ELICMaster(**kw, in_ch=3)
    n = cfg["N"]
    mv = master.init(
        {"params": jax.random.PRNGKey(2), "noise": jax.random.PRNGKey(3)},
        jnp.zeros((1, 256, 256, 3)),
        jnp.zeros((1, 256, 256, 1)),
        jnp.zeros((1, 32, 32, n)),
        jnp.zeros((1, 64, 64, n)),
        jnp.zeros((1, 128, 128, n)),
        training=True,
    )
    if ckpt:
        from tools.export_calib import load_calib_params_device

        mv = {"params": load_calib_params_device(ckpt, mv["params"])}
    codec = MasterCodec(master, mv)
    rgb = jnp.asarray(rgb_np)
    depth = jnp.asarray(depth_np)

    def run():
        ac = aux_codec.compress(depth)
        ad = aux_codec.decompress(ac["strings"], ac["shape"])
        aux_hat = ad["x_hat"]
        ups = (ad["up1"], ad["up2"], ad["up3"])
        comp = codec.compress(rgb, aux_hat)
        dec = codec.decompress(
            comp["strings"], comp["shape"], aux_hat, ups, comp["side_info"]
        )
        np.asarray(dec["x_hat"][:1, :1, :1, :1])
        return comp, dec

    t0 = time.time()
    comp, dec = run()
    warm = time.time() - t0
    np.testing.assert_array_equal(np.asarray(dec["y_hat"]), np.asarray(comp["y_hat"]))
    times = []
    for _ in range(iters):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    return {
        "model": "master",
        "wire": "compat-cascade",
        "batch": batch,
        "img_per_s": round(batch / min(times), 3),
        "warmup_s": round(warm, 1),
        "times_s": [round(t, 2) for t in times],
    }


def bench_one(name: str, batch: int, iters: int, rgb_np, depth_np):
    from rgbdc_tpu.models import build_model
    from rgbdc_tpu.utils.config import mlic_model_config, model_config

    if name == "master":
        return bench_master(batch, iters, rgb_np, depth_np)

    united = name in ("ELIC_united", "ELIC_united_R2D", "STF_united")
    cfg = mlic_model_config() if name == "MLIC" else model_config()
    in_ch = None if united else 3
    model = build_model(name, cfg, in_ch=in_ch)

    example = (
        (jnp.zeros((1, 256, 256, 3)), jnp.zeros((1, 256, 256, 1)))
        if united
        else (jnp.zeros((1, 256, 256, 3)),)
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        *example,
        training=True,
    )
    ckpt = os.environ.get("ZOO_CKPT")
    if ckpt:
        from tools.export_calib import load_calib_params_device

        variables = {"params": load_calib_params_device(ckpt, variables["params"])}
        print(
            f"# {name}: calibration checkpoint {os.path.basename(ckpt)}, "
            f"sigma bound {os.environ.get('RGBDC_SCALE_BOUND', '0.11 (default)')}",
            flush=True,
        )
    codec = _codec_for(name, model, variables)
    rgb = jnp.asarray(rgb_np)
    depth = jnp.asarray(depth_np)

    def sync(arr):
        np.asarray(arr[:1, :1, :1, :1])

    # single-latent lane serving (models/lane_single.py): ELIC/ckbd/MLIC/STF
    # get the same on-device path as the united flagship; only the
    # aux-conditioned master cascade stays on the compat host-serial format
    lanes = (not united) and getattr(type(codec), "LANE_SERVING", False)

    def run():
        if united:
            out = codec.compress_lanes(rgb, depth)
            dec = codec.decompress_lanes(
                out["r_streams"], out["d_streams"], out["shape"]
            )
            sync(dec["x_hat"]["r"])
        elif lanes:
            out = codec.compress_lanes(rgb)
            dec = codec.decompress_lanes(out["streams"], out["shape"])
            sync(dec["x_hat"])
        else:
            out = codec.compress(rgb)
            dec = codec.decompress(out["strings"], out["shape"])
            sync(dec["x_hat"])
        return out, dec

    t0 = time.time()
    out, dec = run()  # compile + warmup
    warm = time.time() - t0
    if united:
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]["r"]), np.asarray(out["y_hat"]["r"])
        )
    else:
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]), np.asarray(out["y_hat"])
        )
    times = []
    for _ in range(iters):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    return {
        "model": name,
        "wire": "lanes" if (united or lanes) else "compat",
        "batch": batch,
        "img_per_s": round(batch / min(times), 3),
        "warmup_s": round(warm, 1),
        "times_s": [round(t, 2) for t in times],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--models", nargs="+",
        default=["ELIC", "ckbd", "MLIC", "STF", "ELIC_united_R2D", "STF_united", "master"],
    )
    ap.add_argument("--batch", type=int, default=int(os.environ.get("ZOO_BATCH", 8)))
    ap.add_argument("--iters", type=int, default=int(os.environ.get("ZOO_ITERS", 3)))
    ap.add_argument(
        "--inproc", action="store_true",
        help="child mode: bench the given models in THIS process (env "
        "must already carry the right knob set — the default driver mode "
        "sets it per model and spawns one child each)",
    )
    args = ap.parse_args()

    if not args.inproc:
        for name in args.models:
            proc = subprocess.run(
                [
                    sys.executable, os.path.abspath(__file__), "--inproc",
                    "--models", name, "--batch", str(args.batch),
                    "--iters", str(args.iters),
                ],
                env=env_for(name), cwd=_REPO,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
            out = proc.stdout.strip()
            # forward the child's JSON row(s); surface a crash as a row
            if out:
                print(out, flush=True)
            if proc.returncode != 0:
                tail = "; ".join(proc.stderr.strip().splitlines()[-3:])
                print(
                    json.dumps({"model": name, "error": f"child rc={proc.returncode}: {tail}"}),
                    flush=True,
                )
        return

    from rgbdc_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    from bench import _bench_images

    rgb_np, depth_np = _bench_images(args.batch)
    for name in args.models:
        try:
            row = bench_one(name, args.batch, args.iters, rgb_np, depth_np)
        except Exception as e:  # record the failure, keep benching the rest
            row = {"model": name, "error": f"{type(e).__name__}: {e}"}
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
