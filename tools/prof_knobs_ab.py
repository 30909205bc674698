"""Interleaved A/B of the staged serving knobs at bench shapes, one knob
per run (tunnel drifts by the hour — never compare across sessions):

    KNOB=scanout python tools/prof_knobs_ab.py   # RGBDC_ENC_SCANOUT
    KNOB=flat    python tools/prof_knobs_ab.py   # RGBDC_FLAT_UPLOAD
    KNOB=flow16  python tools/prof_knobs_ab.py   # RGBDC_BF16_FLOW
    KNOB=escfix  python tools/prof_knobs_ab.py   # RGBDC_DEC_ESCFIX
    KNOB=dense   python tools/prof_knobs_ab.py   # RGBDC_DENSE128 (tables only)
    KNOB=stack   python tools/prof_knobs_ab.py   # dense+escfix+Pallas scans

Builds TWO UnitedCodec instances over the same calib params (knob read at
construction), warms both, then alternates timed runs A B A B ... per
docs/PERF.md discipline.  scanout/flat/escfix are byte-identical layouts,
so the script also cross-checks stream equality; flow16/dense/stack change
the streams (mu/sigma resp. capped tables), so they only check each
side's own closure.  KNOB=stack forces RGBDC_WMAX=128 for BOTH sides (the
Pallas renorm fetch is a one-hot over the word columns; trained 512-lane
streams use ~7).
"""
import os, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("RGBDC_DEVICE_ENCODE", "1")
os.environ.setdefault("RGBDC_BF16", "1")
os.environ.setdefault("RGBDC_LANES", "512")

KNOB = os.environ.get("KNOB", "scanout").lower()
ENVS = {
    "scanout": ["RGBDC_ENC_SCANOUT"],
    "flat": ["RGBDC_FLAT_UPLOAD"],
    "flow16": ["RGBDC_BF16_FLOW"],
    "escfix": ["RGBDC_DEC_ESCFIX"],
    "dense": ["RGBDC_DENSE128"],
    "stack": ["RGBDC_DENSE128", "RGBDC_DEC_ESCFIX", "RGBDC_DEC_PALLAS",
              "RGBDC_ENC_PALLAS"],
    "gcompact": ["RGBDC_ENC_GCOMPACT"],
    "decunroll": ["RGBDC_DEC_UNROLL"],
    "wfetch": ["RGBDC_DEC_WFETCH"],
    "dot1x1": ["RGBDC_DOT1X1"],
    "wmax64": ["RGBDC_WMAX"],
    "gc1h": ["RGBDC_ENC_GCOMPACT"],
}[KNOB]
# value-knobs: (off, on) env values when not the default "0"/"1"
VALS = {
    "decunroll": ("1", os.environ.get("PROF_UNROLL", "4")),
    "wfetch": ("gather", "onehot"),
    "wmax64": ("128", "64"),
    "gc1h": ("1", "onehot"),
}.get(KNOB, ("0", "1"))
ENV = "+".join(ENVS)
if KNOB == "stack":
    os.environ["RGBDC_WMAX"] = os.environ.get("RGBDC_WMAX", "128")
if KNOB in ("gcompact", "decunroll", "wfetch", "dot1x1", "wmax64", "gc1h", "flow16"):
    # measure on top of the current serving defaults (bench.py)
    for e in ("RGBDC_DENSE128", "RGBDC_DEC_ESCFIX", "RGBDC_ENC_SCANOUT",
              "RGBDC_FLAT_UPLOAD"):
        os.environ.setdefault(e, "1")
if KNOB in ("decunroll", "wfetch", "dot1x1"):
    os.environ.setdefault("RGBDC_WMAX", "128")
if KNOB in ("wfetch", "dot1x1"):
    os.environ.setdefault("RGBDC_ENC_GCOMPACT", "1")
if KNOB == "decunroll":
    # measure on the full current bench default stack (onehot wfetch
    # changed the per-row cost profile the original unroll A/B saw)
    os.environ.setdefault("RGBDC_ENC_GCOMPACT", "onehot")
    os.environ.setdefault("RGBDC_DEC_WFETCH", "onehot")
if KNOB == "wmax64":
    os.environ.setdefault("RGBDC_ENC_GCOMPACT", "1")
    os.environ.setdefault("RGBDC_DEC_WFETCH", "onehot")
if KNOB in ("gc1h", "flow16"):
    os.environ.setdefault("RGBDC_WMAX", "128")
    os.environ.setdefault("RGBDC_DEC_WFETCH", "onehot")
if KNOB == "flow16":
    os.environ.setdefault("RGBDC_ENC_GCOMPACT", "onehot")
if KNOB == "dot1x1":
    os.environ.setdefault("RGBDC_DEC_WFETCH", "onehot")
REPS = int(os.environ.get("REPS", "4"))

import jax, jax.numpy as jnp, numpy as np
from rgbdc_tpu.utils.cache import enable_compile_cache

enable_compile_cache()
import bench as B
from rgbdc_tpu.models import ELICUnited, UnitedCodec
from tools.export_calib import load_calib_params_device

batch = int(os.environ.get("PROF_BATCH", "16"))
model = ELICUnited()
rgb_np, depth_np = B._bench_images(batch)
rgb, depth = jnp.asarray(rgb_np), jnp.asarray(depth_np)
variables = model.init(
    {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
    jnp.zeros((1, 128, 128, 3)), jnp.zeros((1, 128, 128, 1)), training=True,
)
ck = os.path.join(os.path.dirname(__file__), "..", "calib",
                  "elic_united_q2.f16.msgpack")
variables = {"params": load_calib_params_device(ck, variables["params"])}


def sync1(x):
    _ = np.asarray(x.ravel()[0])


outs = {}


def build(on: bool):
    """Build AND warm with the knob env set: trace-time knobs (dot1x1 —
    read inside the flax modules) bake in at first trace, not at
    _lane_setup, so the warmup must run before the env is restored."""
    name = "on" if on else "off"
    for e in ENVS:
        os.environ[e] = VALS[1] if on else VALS[0]
    c = UnitedCodec(model, variables)
    c._lane_setup()
    t0 = time.time()
    out = c.compress_lanes(rgb, depth)
    out = c.compress_lanes(rgb, depth)  # second: speculative/steady paths
    dec = c.decompress_lanes(out["r_streams"], out["d_streams"], out["shape"])
    sync1(dec["x_hat"]["r"])
    np.testing.assert_array_equal(
        np.asarray(dec["y_hat"]["r"]), np.asarray(out["y_hat"]["r"])
    )
    outs[name] = out
    print(f"warm {ENV}={name}: {time.time()-t0:.1f} s (closure ok)", flush=True)
    return c


codec_a, codec_b = build(False), build(True)
for e in ENVS:
    os.environ[e] = VALS[0]

if KNOB in ("scanout", "flat", "escfix", "gcompact", "decunroll", "wfetch", "wmax64", "gc1h"):
    assert outs["on"]["r_streams"] == outs["off"]["r_streams"], "streams diverge!"
    assert outs["on"]["d_streams"] == outs["off"]["d_streams"], "streams diverge!"
    print("streams byte-identical across the knob", flush=True)

comp, dec_t, e2e = {"off": [], "on": []}, {"off": [], "on": []}, {"off": [], "on": []}
for r in range(REPS):
    for name, c in (("off", codec_a), ("on", codec_b)):
        t0 = time.time()
        out = c.compress_lanes(rgb, depth)
        t1 = time.time()
        dec = c.decompress_lanes(out["r_streams"], out["d_streams"], out["shape"])
        sync1(dec["x_hat"]["r"])
        t2 = time.time()
        comp[name].append(t1 - t0)
        dec_t[name].append(t2 - t1)
        e2e[name].append(t2 - t0)
        print(f"rep {r} {ENV}={name}: comp {1e3*(t1-t0):.0f} ms  "
              f"dec {1e3*(t2-t1):.0f} ms  e2e {1e3*(t2-t0):.0f} ms", flush=True)

for name in ("off", "on"):
    print(f"{ENV}={name}: comp min {1e3*min(comp[name]):.0f} ms  "
          f"dec min {1e3*min(dec_t[name]):.0f} ms  "
          f"e2e min {1e3*min(e2e[name]):.0f} ms  "
          f"({batch/min(e2e[name]):.2f} img/s serial)", flush=True)
