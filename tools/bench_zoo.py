"""Zoo-wide serving throughput datapoints (VERDICT r2 weak #3): enc+dec
throughput of each model family's codec driver on 640x480 content, one
JSON line per model.  BASELINE.json's five configs name ELIC / ckbd / R2D /
ELIC_united / STF_united (+ MLIC++); bench.py measures the flagship lane
path — this harness covers the rest: the on-device lane path for every
family, INCLUDING the master cascade (round 4: aux ELIC round-trips
through its own lane path and the master's lane programs condition on the
decoded image + taps — models/lane_single.MasterLaneCodec).

Protocol (round 4, VERDICT r3 weak #3/#7): the FLAGSHIP bench's pipelined
best/median-of-N-windows measurement — decompress(i) overlaps
compress(i+1) on a worker thread, ZOO_PASSES (default 5) steady-state
windows of ZOO_ITERS batches each, reporting BEST and MEDIAN window
rates.  ZOO_PIPELINE=0 restores the round-3 serial protocol (the
sessions-7/10/11 tables compare on serial numbers).

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
Env: ZOO_BATCH (default 8), ZOO_ITERS (default 3), ZOO_PASSES (default 5),
     ZOO_PIPELINE (default 1).
"""

import argparse
import json
import os
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

# per-model word-cap carve-outs (docs/PERF.md session 11: the cap tracks
# checkpoint CONVERGENCE — a less-converged calibration codes wider lanes).
# Round 4: empty — STF_united's re-converged checkpoint (+3500 steps,
# loss 3.3 -> 1.34) fits the uniform WMAX=128 (10.9 img/s measured).
_WMAX_TRAINED: dict = {}


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
        # round-4 default: +4% on the flagship A/B, ~2.5x faster cold
        # compile, neutral on MLIC (docs/PERF.md round 4)
        "RGBDC_FUSE_SLICES": "1",
    }
    if trained:
        knobs.update(
            RGBDC_WMAX=_WMAX_TRAINED.get(name, "128"),
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


def measure(compress_fn, decompress_fn, batch: int, iters: int):
    """The flagship bench's sustained-window protocol: ZOO_PASSES windows
    of ``iters`` batches; under ZOO_PIPELINE=1 (default) decompress(i)
    overlaps compress(i+1) on a worker thread.  Returns a row fragment
    with BEST and MEDIAN window rates (VERDICT r3 weak #3/#7: one
    protocol, both statistics)."""
    passes = int(os.environ.get("ZOO_PASSES", "5"))
    pipelined = os.environ.get("ZOO_PIPELINE", "1") == "1"
    rates = []
    if pipelined:
        pool = ThreadPoolExecutor(1)
        comp = compress_fn()  # prime the pipeline
        for _ in range(passes):
            t0 = time.time()
            for _ in range(iters):
                fut = pool.submit(compress_fn)
                decompress_fn(comp)
                comp = fut.result()
            rates.append(batch * iters / (time.time() - t0))
        pool.shutdown(wait=False)
    else:
        for _ in range(passes):
            t0 = time.time()
            for _ in range(iters):
                decompress_fn(compress_fn())
            rates.append(batch * iters / (time.time() - t0))
    return {
        "img_per_s": round(max(rates), 3),
        "median": round(float(np.median(rates)), 3),
        "protocol": ("pipelined" if pipelined else "serial")
        + f"-best-of-{passes}",
    }


def bench_master(batch: int, iters: int, rgb_np, depth_np):
    """Full master cascade on the LANE path (round 4, VERDICT r3 task 2;
    reference testing/tester_master.py:27-148): the aux ELIC round-trips
    depth through its own on-device lane stream, the master's lane
    programs condition on the DECODED aux image + decoder taps (which
    never leave the device), and beta/gamma ride as 256 B/image side
    info.  Decode-side cost is honest: the receiver re-decodes the aux
    stream before the master (exactly what a real receiver does)."""
    from rgbdc_tpu.models import ELIC, ELICMaster, ElicCodec, MasterCodec
    from rgbdc_tpu.utils.config import model_config

    cfg = model_config()
    kw = dict(N=cfg["N"], M=cfg["M"], slice_ch=tuple(cfg["slice_ch"]))
    aux_model = ELIC(**kw, in_ch=1, return_mid=True)
    ckpt = os.environ.get("ZOO_CKPT")
    aux_init = lambda: aux_model.init(  # noqa: E731
        {"params": jax.random.PRNGKey(42), "noise": jax.random.PRNGKey(43)},
        jnp.zeros((1, 256, 256, 1)),
        training=True,
    )
    if ckpt:
        from tools.export_calib import load_calib_params_device

        aux_ck = ckpt.replace("_q2.f16.msgpack", "_aux_q2.f16.msgpack")
        # abstract init: the checkpoint overwrites every param (bench.py
        # cold-start rationale — skip the init forward's compile)
        aux_vars = {
            "params": load_calib_params_device(
                aux_ck, jax.eval_shape(aux_init)["params"]
            )
        }
        print(
            f"# master: calibration checkpoints {os.path.basename(ckpt)} + "
            f"{os.path.basename(aux_ck)}, sigma bound "
            f"{os.environ.get('RGBDC_SCALE_BOUND', '0.11 (default)')}",
            flush=True,
        )
    else:
        aux_vars = aux_init()
    aux_codec = ElicCodec(aux_model, aux_vars)

    master = ELICMaster(**kw, in_ch=3)
    n = cfg["N"]
    m_init = lambda: master.init(  # noqa: E731
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

        mv = {
            "params": load_calib_params_device(
                ckpt, jax.eval_shape(m_init)["params"]
            )
        }
    else:
        mv = m_init()
    codec = MasterCodec(master, mv)
    rgb = jnp.asarray(rgb_np)
    depth = jnp.asarray(depth_np)

    def sync(arr):
        np.asarray(arr[:1, :1, :1, :1])

    def compress_fn():
        # sender: encode aux, decode it (the conditioning MUST be the
        # decoded aux — reference protocol), encode master against it
        a_out = aux_codec.compress_lanes(depth)
        a_dec = aux_codec.decompress_lanes(a_out["streams"], a_out["shape"])
        m_out = codec.compress_lanes(rgb, a_dec["x_hat"])
        return {"a_out": a_out, "m_out": m_out}

    def decompress_fn(c):
        # receiver: decode the aux stream, then the master conditioned on it
        a_dec = aux_codec.decompress_lanes(
            c["a_out"]["streams"], c["a_out"]["shape"]
        )
        dec = codec.decompress_lanes(
            c["m_out"]["streams"], c["m_out"]["shape"], a_dec["x_hat"],
            (a_dec["up1"], a_dec["up2"], a_dec["up3"]),
            side_info=c["m_out"]["side_info"],
        )
        sync(dec["x_hat"])
        return dec

    t0 = time.time()
    comp = compress_fn()
    dec = decompress_fn(comp)
    warm = time.time() - t0
    np.testing.assert_array_equal(
        np.asarray(dec["y_hat"]), np.asarray(comp["m_out"]["y_hat"])
    )
    row = {"model": "master", "wire": "lanes-cascade", "batch": batch,
           "warmup_s": round(warm, 1)}
    row.update(measure(compress_fn, decompress_fn, batch, iters))
    return row


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
    init_fn = lambda: model.init(  # noqa: E731
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        *example,
        training=True,
    )
    ckpt = os.environ.get("ZOO_CKPT")
    if ckpt:
        from tools.export_calib import load_calib_params_device

        variables = {
            "params": load_calib_params_device(
                ckpt, jax.eval_shape(init_fn)["params"]
            )
        }
        print(
            f"# {name}: calibration checkpoint {os.path.basename(ckpt)}, "
            f"sigma bound {os.environ.get('RGBDC_SCALE_BOUND', '0.11 (default)')}",
            flush=True,
        )
    else:
        variables = init_fn()
    codec = _codec_for(name, model, variables)
    rgb = jnp.asarray(rgb_np)
    depth = jnp.asarray(depth_np)

    def sync(arr):
        np.asarray(arr[:1, :1, :1, :1])

    # every standalone family serves on the on-device lane path
    # (models/lane_single.py), same as the united flagship
    lanes = (not united) and getattr(type(codec), "LANE_SERVING", False)

    if united:
        def compress_fn():
            return codec.compress_lanes(rgb, depth)

        def decompress_fn(out):
            dec = codec.decompress_lanes(
                out["r_streams"], out["d_streams"], out["shape"]
            )
            sync(dec["x_hat"]["r"])
            return dec
    elif lanes:
        def compress_fn():
            return codec.compress_lanes(rgb)

        def decompress_fn(out):
            dec = codec.decompress_lanes(out["streams"], out["shape"])
            sync(dec["x_hat"])
            return dec
    else:
        def compress_fn():
            return codec.compress(rgb)

        def decompress_fn(out):
            dec = codec.decompress(out["strings"], out["shape"])
            sync(dec["x_hat"])
            return dec

    t0 = time.time()
    out = compress_fn()
    dec = decompress_fn(out)  # compile + warmup
    warm = time.time() - t0
    if united:
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]["r"]), np.asarray(out["y_hat"]["r"])
        )
    else:
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]), np.asarray(out["y_hat"])
        )
    row = {"model": name, "wire": "lanes" if (united or lanes) else "compat",
           "batch": batch, "warmup_s": round(warm, 1)}
    row.update(measure(compress_fn, decompress_fn, batch, iters))
    return row


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
