"""Isolated interleaved A/B of RGBDC_BF16_FLOW at the PROGRAM level: time
the fused flow (z + 5 slices) in decode AND encode mode for both knob
values in one process.

Why re-measure: the 2026-08-18 campaign called BF16_FLOW neutral at batch
16 when the pipeline was link/scan-bound; after the wfetch/gcompact/batch
-32 wins the slice programs' f32 context/aggregation convs (~190 ms per
batch-32, MXU at a fraction of bf16 rate) are a top-3 device phase, so
the knob deserves a program-level verdict (full-pipeline e2e reps vary
+/-40 ms and cannot see a ~50 ms win).

Run on the real TPU:
  PYTHONPATH=/root/repo:$PYTHONPATH python tools/prof_flow16_iso.py
"""
import os, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
for k, v in [("RGBDC_DEVICE_ENCODE", "1"), ("RGBDC_BF16", "1"),
             ("RGBDC_LANES", "512"), ("RGBDC_DEC_ESCFIX", "1"),
             ("RGBDC_ENC_SCANOUT", "1"), ("RGBDC_FLAT_UPLOAD", "1"),
             ("RGBDC_DENSE128", "1"), ("RGBDC_ENC_GCOMPACT", "onehot"),
             ("RGBDC_WMAX", "128"), ("RGBDC_DEC_WFETCH", "onehot")]:
    os.environ.setdefault(k, v)

import jax, jax.numpy as jnp, numpy as np
from rgbdc_tpu.utils.cache import enable_compile_cache

enable_compile_cache()
import bench as B
from rgbdc_tpu.models import ELICUnited, UnitedCodec
from tools.export_calib import load_calib_params_device

batch = int(os.environ.get("PROF_BATCH", "32"))
REPS = int(os.environ.get("REPS", "5"))
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

codecs = {}
for name, val in (("off", "0"), ("on", "1")):
    os.environ["RGBDC_BF16_FLOW"] = val
    c = UnitedCodec(model, variables)
    c._lane_setup()
    codecs[name] = c
os.environ["RGBDC_BF16_FLOW"] = "0"


def sync1(x):
    _ = np.asarray(x[:1, :1, :1, :1])


v = variables
base = codecs["off"]
rgb_d, depth_d = base._put_batch((rgb, depth))
rgb_y, depth_y, rz_sym, dz_sym = base._encode_front_srv(v, rgb_d, depth_d)
zh, zw = int(rz_sym.shape[1]), int(rz_sym.shape[2])
rz0 = jnp.zeros((batch, zh, zw, model.N), jnp.int32)
y0 = jnp.zeros((batch, zh * 4, zw * 4, model.M), jnp.float32)

args = {}
for name, c in codecs.items():
    # each codec decodes ITS OWN streams: a bf16 stage flow produces
    # (self-consistent) different streams, and decoding the other knob's
    # bytes would desync and skew the data-dependent escape post-pass
    out = c.compress_lanes(rgb, depth)
    (r_st3, r_words, r_byp) = c._stack_streams(out["r_streams"])
    (d_st3, d_words, d_byp) = c._stack_streams(out["d_streams"])
    zst3, zwz, zbz = c._dummy_lane_inputs(batch)
    args[name] = dict(dec=(r_st3, r_words, r_byp, d_st3, d_words, d_byp),
                      enc=(zst3, zwz, zbz, zst3, zwz, zbz))
    # warm both modes (each codec decodes ITS OWN knob's streams — the
    # flow is self-consistent per knob; cross-knob stream equality is NOT
    # expected for a bf16 stage change)
    for mode, isdec in (("dec", True), ("enc", False)):
        r = c._fused_flow(v, y0, y0, rz0, rz0, *args[name][mode],
                          jnp.asarray(isdec))
        sync1(r[4][-1])
    print(f"warm {name}: ok", flush=True)

res = {(n, m): [] for n in codecs for m in ("dec", "enc")}
for rep in range(REPS):
    for name, c in codecs.items():
        for mode, isdec in (("dec", True), ("enc", False)):
            t0 = time.time()
            r = c._fused_flow(v, y0, y0, rz0, rz0, *args[name][mode],
                              jnp.asarray(isdec))
            sync1(r[4][-1])
            res[(name, mode)].append(time.time() - t0)

for (name, mode), ts in res.items():
    print(f"flow16={name} {mode}: min {min(ts)*1e3:.0f} ms "
          f"all {[round(t*1e3) for t in ts]}", flush=True)
