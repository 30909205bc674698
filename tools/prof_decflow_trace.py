"""Capture an xplane trace of the SERVING fused decode flow (dense+escfix+
flat-upload defaults) at bench shapes and print the per-op breakdown — the
decode flow (~240 ms wall) is the largest remaining device phase.  This
splits it into stage/hyper convs vs the decode scans vs escape fixup vs
relayouts, under the EXACT bench config (unlike prof_scan_trace.py, which
isolates the classic LUT-path scan).

Run on the real TPU:  PYTHONPATH=/root/repo:$PYTHONPATH python tools/prof_decflow_trace.py
"""
import os, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("RGBDC_DEVICE_ENCODE", "1")
os.environ.setdefault("RGBDC_BF16", "1")
os.environ.setdefault("RGBDC_LANES", "512")
os.environ.setdefault("RGBDC_DEC_ESCFIX", "1")
os.environ.setdefault("RGBDC_ENC_SCANOUT", "1")
os.environ.setdefault("RGBDC_FLAT_UPLOAD", "1")
os.environ.setdefault("RGBDC_DENSE128", "1")
os.environ.setdefault("RGBDC_ENC_GCOMPACT", "1")
os.environ.setdefault("RGBDC_WMAX", "128")

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
ck = os.path.join(os.path.dirname(__file__), "..", "calib", "elic_united_q2.f16.msgpack")
variables = {"params": load_calib_params_device(ck, variables["params"])}
codec = UnitedCodec(model, variables)


def sync1(x):
    leaf = next(a for a in jax.tree.leaves(x) if hasattr(a, "ravel"))
    _ = np.asarray(leaf.ravel()[0])


out = codec.compress_lanes(rgb, depth)
v = codec.variables
(r_st3, r_words, r_byp) = codec._stack_streams(out["r_streams"])
(d_st3, d_words, d_byp) = codec._stack_streams(out["d_streams"])
rgb_d, depth_d = codec._put_batch((rgb, depth))
_, _, rz_f, _ = codec._encode_front_srv(v, rgb_d, depth_d)
zh, zw = int(rz_f.shape[1]), int(rz_f.shape[2])
rz0 = jnp.zeros((batch, zh, zw, model.N), jnp.int32)
y0 = jnp.zeros((batch, zh * 4, zw * 4, model.M), jnp.float32)


def dec_flow():
    r = codec._fused_flow(v, y0, y0, rz0, rz0, r_st3, r_words, r_byp,
                          d_st3, d_words, d_byp, jnp.asarray(True))
    sync1(r[4][-1])
    return r


dec_flow()
ts = []
for _ in range(3):
    t0 = time.time()
    dec_flow()
    ts.append(time.time() - t0)
print(f"fused flow dec: min {min(ts)*1e3:.0f} ms all {[round(x*1e3) for x in ts]}",
      flush=True)

logdir = "/tmp/jaxtrace_decflow"
os.system(f"rm -rf {logdir}")
jax.profiler.start_trace(logdir)
dec_flow()
jax.profiler.stop_trace()
print("parsing...", flush=True)
import subprocess, sys
subprocess.run([sys.executable, os.path.join(os.path.dirname(__file__), "xplane_ops.py"), logdir, "60"])
