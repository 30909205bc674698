"""Parameterized serving-path profiler CLI (round 5, VERDICT r4 task 9).

Consolidates the round-2..4 one-shot `prof_*`/`probe_*`/`check_*` scripts
(whose findings live in docs/PERF.md) into four reusable subcommands on
the flagship serving path:

  ab       interleaved env-knob A/B (the docs/PERF.md measurement
           discipline: build both arms over the same trained params, warm
           both, alternate timed reps A B A B in ONE process/session)
      python tools/prof.py ab --on RGBDC_BF16_FLOW=1
      python tools/prof.py ab --on RGBDC_WMAX=64 --off RGBDC_WMAX=128 \
          --base RGBDC_ENC_GCOMPACT=onehot --no-byte-check
  phases   wall-clock split of compress/decompress into the fused
           sub-phases (front / slice flow / encode scans / upload / synth)
      python tools/prof.py phases --batch 16
  quality  roundtrip PSNR + real-stream bpp cost of a knob on the trained
           checkpoint (off-arm vs on-arm)
      python tools/prof.py quality --on RGBDC_BF16=1 --off RGBDC_BF16=0
  trace    jax.profiler xplane capture of one phase + per-op device-time
           table (tools/xplane_ops.py)
      python tools/prof.py trace --phase dec --out /tmp/xp

All subcommands run on the real TPU with the bench content distribution
(bench._bench_images) and the committed flagship calibration checkpoint
(--ckpt to override).  Trace-time knobs bake in at first trace, so each
arm constructs AND warms its own codec while its env is set.
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("RGBDC_DEVICE_ENCODE", "1")
os.environ.setdefault("RGBDC_BF16", "1")
os.environ.setdefault("RGBDC_LANES", "512")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _parse_env(pairs):
    out = {}
    for p in pairs or []:
        k, _, v = p.partition("=")
        if not k or not v:
            raise SystemExit(f"bad env pair {p!r} (want K=V)")
        out[k] = v
    return out


def _setup(args):
    import jax
    import jax.numpy as jnp

    from rgbdc_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import bench as B
    from rgbdc_tpu.models import ELICUnited, UnitedCodec
    from tools.export_calib import load_calib_params_device

    model = ELICUnited()
    rgb_np, depth_np = B._bench_images(args.batch)
    rgb, depth = jnp.asarray(rgb_np), jnp.asarray(depth_np)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, 128, 128, 3)), jnp.zeros((1, 128, 128, 1)),
        training=True,
    )
    ck = args.ckpt or os.path.join(_REPO, "calib", "elic_united_q2.f16.msgpack")
    variables = {"params": load_calib_params_device(ck, variables["params"])}

    def make_codec():
        return UnitedCodec(model, variables)

    return model, make_codec, rgb, depth


def _sync1(x):
    import jax
    import numpy as np

    leaf = next(a for a in jax.tree.leaves(x) if hasattr(a, "ravel"))
    _ = np.asarray(leaf.ravel()[0])


def _warm_roundtrip(codec, rgb, depth):
    import numpy as np

    out = codec.compress_lanes(rgb, depth)
    out = codec.compress_lanes(rgb, depth)  # second: speculative paths
    dec = codec.decompress_lanes(out["r_streams"], out["d_streams"], out["shape"])
    _sync1(dec["x_hat"]["r"])
    np.testing.assert_array_equal(
        np.asarray(dec["y_hat"]["r"]), np.asarray(out["y_hat"]["r"])
    )
    return out, dec


def _two_arms(args, make_codec, rgb, depth):
    """Build + warm the off/on codecs with their env arms set."""
    base = _parse_env(args.base)
    on = _parse_env(args.on)
    off = _parse_env(args.off)
    if not on:
        raise SystemExit("--on K=V is required")
    if not off:  # default off-arm: same keys at "0"
        off = {k: "0" for k in on}
    os.environ.update(base)
    arms = {}
    for name, env in (("off", off), ("on", on)):
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        codec = make_codec()
        t0 = time.time()
        out, dec = _warm_roundtrip(codec, rgb, depth)
        print(f"warm {name} ({env}): {time.time() - t0:.1f} s (closure ok)",
              flush=True)
        arms[name] = (codec, out, dec, env)
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    return arms


def cmd_ab(args):
    _, make_codec, rgb, depth = _setup(args)
    arms = _two_arms(args, make_codec, rgb, depth)
    if args.byte_check:
        a, b = arms["off"][1], arms["on"][1]
        same = (a["r_streams"] == b["r_streams"]
                and a["d_streams"] == b["d_streams"])
        print(f"streams byte-identical across the knob: {same}", flush=True)

    comp = {"off": [], "on": []}
    dect = {"off": [], "on": []}
    for r in range(args.reps):
        for name in ("off", "on"):
            codec, out = arms[name][0], arms[name][1]
            t0 = time.time()
            out2 = codec.compress_lanes(rgb, depth)
            t1 = time.time()
            dec = codec.decompress_lanes(
                out2["r_streams"], out2["d_streams"], out2["shape"]
            )
            _sync1(dec["x_hat"]["r"])
            t2 = time.time()
            comp[name].append(t1 - t0)
            dect[name].append(t2 - t1)
            print(f"rep {r} {name}: comp {1e3 * (t1 - t0):.0f} ms  "
                  f"dec {1e3 * (t2 - t1):.0f} ms  "
                  f"e2e {1e3 * (t2 - t0):.0f} ms", flush=True)
    for name in ("off", "on"):
        e2e = [c + d for c, d in zip(comp[name], dect[name])]
        print(f"{name}: comp min {1e3 * min(comp[name]):.0f} ms  "
              f"dec min {1e3 * min(dect[name]):.0f} ms  "
              f"e2e min {1e3 * min(e2e):.0f} ms  "
              f"({args.batch / min(e2e):.2f} img/s serial)", flush=True)


def cmd_quality(args):
    import numpy as np  # noqa: F401

    from rgbdc_tpu.eval.metrics import psnr

    _, make_codec, rgb, depth = _setup(args)
    arms = _two_arms(args, make_codec, rgb, depth)
    res = {}
    npix = args.batch * rgb.shape[1] * rgb.shape[2]
    for name in ("off", "on"):
        _, out, dec, env = arms[name]
        pr = float(psnr(dec["x_hat"]["r"], rgb))
        pd = float(psnr(dec["x_hat"]["d"], depth))
        nb = sum(len(s) for s in out["r_streams"] + out["d_streams"])
        res[name] = (pr, pd, nb * 8 / npix)
        print(f"{name} ({env}): psnr_rgb {pr:.3f} dB  psnr_depth {pd:.3f} dB  "
              f"bpp {nb * 8 / npix:.4f}", flush=True)
    dr = res["off"][0] - res["on"][0]
    dd = res["off"][1] - res["on"][1]
    db = (res["on"][2] - res["off"][2]) / max(res["off"][2], 1e-9)
    print(f"knob cost: rgb {dr:+.3f} dB, depth {dd:+.3f} dB, bpp {db:+.2%}",
          flush=True)


def _phase_fns(codec, model, rgb, depth, out):
    """Label -> zero-arg callable for each serving sub-phase (shapes from a
    warm roundtrip)."""
    import jax.numpy as jnp
    import numpy as np

    batch = rgb.shape[0]
    v = codec.variables
    rgb_d, depth_d = codec._put_batch((rgb, depth))
    rgb_y, depth_y, rz, dz = codec._encode_front_srv(v, rgb_d, depth_d)
    zst3, zw, zb = codec._dummy_lane_inputs(batch)
    enc_flow = lambda: codec._fused_flow(  # noqa: E731
        v, rgb_y, depth_y, rz, dz, zst3, zw, zb, zst3, zw, zb,
        jnp.asarray(False),
    )
    fl = enc_flow()
    rz2, dz2, r_groups, d_groups, _, _ = fl
    y_lens = [int(np.prod(g[0].shape[1:])) for g in r_groups]
    enc_fn, _ = codec._device_encode_setup(
        batch, (int(rz.shape[1]), int(rz.shape[2])), y_lens
    )
    prepared = (codec._stack_streams(out["r_streams"]),
                codec._stack_streams(out["d_streams"]))
    (r_st3, r_words, r_byp), (d_st3, d_words, d_byp) = prepared
    zh, zw_ = int(rz.shape[1]), int(rz.shape[2])
    rz0 = jnp.zeros((batch, zh, zw_, model.N), jnp.int32)
    y0 = jnp.zeros((batch, zh * 4, zw_ * 4, model.M), jnp.float32)
    dec_flow = lambda: codec._fused_flow(  # noqa: E731
        v, y0, y0, rz0, rz0, r_st3, r_words, r_byp, d_st3, d_words, d_byp,
        jnp.asarray(True),
    )
    dfl = dec_flow()
    r_yh = jnp.concatenate(dfl[4], axis=-1)
    d_yh = jnp.concatenate(dfl[5], axis=-1)
    return {
        "front": lambda: codec._encode_front_srv(v, rgb_d, depth_d),
        "enc_flow": enc_flow,
        "enc_scans": lambda: enc_fn(rz2, dz2, r_groups, d_groups),
        "upload": lambda: (codec._stack_streams(out["r_streams"]),
                           codec._stack_streams(out["d_streams"])),
        "dec_flow": dec_flow,
        "synth": lambda: codec._synth_srv(v, r_yh, d_yh),
    }


def cmd_phases(args):
    model, make_codec, rgb, depth = _setup(args)
    codec = make_codec()
    out, _ = _warm_roundtrip(codec, rgb, depth)

    def timed(label, fn, n=args.reps):
        fn()
        ts = []
        for _ in range(n):
            t0 = time.time()
            r = fn()
            _sync1(r)
            ts.append(time.time() - t0)
        print(f"{label}: min {min(ts) * 1e3:.0f} ms "
              f"all {[round(x * 1e3) for x in ts]}", flush=True)

    timed("compress_lanes (wall)", lambda: codec.compress_lanes(rgb, depth))
    timed("decompress_lanes (wall)", lambda: codec.decompress_lanes(
        out["r_streams"], out["d_streams"], out["shape"]))
    for label, fn in _phase_fns(codec, model, rgb, depth, out).items():
        timed(f"  {label} (synced)", fn)


def cmd_trace(args):
    import jax

    model, make_codec, rgb, depth = _setup(args)
    codec = make_codec()
    out, _ = _warm_roundtrip(codec, rgb, depth)
    fns = _phase_fns(codec, model, rgb, depth, out)
    fns["roundtrip"] = lambda: codec.decompress_lanes(
        out["r_streams"], out["d_streams"], out["shape"]
    )
    if args.phase not in fns:
        raise SystemExit(f"--phase must be one of {sorted(fns)}")
    fn = fns[args.phase]
    fn()
    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        for _ in range(args.reps):
            _sync1(fn())
    print(f"trace written to {args.out}", flush=True)
    import glob
    import subprocess

    pbs = sorted(glob.glob(os.path.join(args.out, "**", "*.xplane.pb"),
                           recursive=True))
    if pbs:
        subprocess.run([sys.executable,
                        os.path.join(_REPO, "tools", "xplane_ops.py"), pbs[-1]])


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--batch", type=int,
                        default=int(os.environ.get("PROF_BATCH", "16")))
    common.add_argument("--reps", type=int,
                        default=int(os.environ.get("REPS", "4")))
    common.add_argument("--ckpt", default="")
    arm = argparse.ArgumentParser(add_help=False)
    arm.add_argument("--on", action="append", metavar="K=V",
                     help="on-arm env (repeatable)")
    arm.add_argument("--off", action="append", metavar="K=V",
                     help="off-arm env (default: on-arm keys at 0)")
    arm.add_argument("--base", action="append", metavar="K=V",
                     help="env applied to BOTH arms")

    p = sub.add_parser("ab", parents=[common, arm])
    p.add_argument("--no-byte-check", dest="byte_check", action="store_false",
                   help="skip the cross-arm stream-equality assert (for "
                        "knobs that legitimately change the streams)")
    p.set_defaults(fn=cmd_ab, byte_check=True)
    p = sub.add_parser("quality", parents=[common, arm])
    p.set_defaults(fn=cmd_quality)
    p = sub.add_parser("phases", parents=[common])
    p.set_defaults(fn=cmd_phases)
    p = sub.add_parser("trace", parents=[common])
    p.add_argument("--phase", default="dec_flow")
    p.add_argument("--out", default="/tmp/rgbdc_trace")
    p.set_defaults(fn=cmd_trace)

    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
