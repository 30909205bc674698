"""A/B the encode-scan unroll factor (RGBDC_ENC_UNROLL) at bench shapes.

The reverse encode scan is ROW-latency-bound (docs/PERF.md), so packing
more rows per scan step should keep cutting serial step count.  The knob
is read at UnitedCodec construction, so one process can hold codecs with
different unrolls (shared variables, shared stage programs) and
interleave their compress_lanes walls — robust to tunnel drift.
Streams must be byte-identical across unroll (same emission order).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/prof_encunroll.py
Env: PROF_UNROLLS=4,8,16  PROF_BATCH=16  PROF_N=5
"""
import os, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("RGBDC_DEVICE_ENCODE", "1")
os.environ.setdefault("RGBDC_BF16", "1")
os.environ.setdefault("RGBDC_LANES", "512")
os.environ.setdefault("RGBDC_DENSE128", "1")
os.environ.setdefault("RGBDC_DEC_ESCFIX", "1")
os.environ.setdefault("RGBDC_ENC_SCANOUT", "1")
os.environ.setdefault("RGBDC_FLAT_UPLOAD", "1")

import jax, jax.numpy as jnp, numpy as np
from rgbdc_tpu.utils.cache import enable_compile_cache

enable_compile_cache()
import bench as B
from rgbdc_tpu.models import ELICUnited, UnitedCodec
from tools.export_calib import load_calib_params_device

batch = int(os.environ.get("PROF_BATCH", "16"))
n = int(os.environ.get("PROF_N", "5"))
unrolls = [int(u) for u in os.environ.get("PROF_UNROLLS", "4,8,16").split(",")]

model = ELICUnited()
rgb_np, depth_np = B._bench_images(batch)
rgb, depth = jnp.asarray(rgb_np), jnp.asarray(depth_np)
variables = model.init(
    {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
    jnp.zeros((1, 128, 128, 3)), jnp.zeros((1, 128, 128, 1)), training=True,
)
ck = os.path.join(os.path.dirname(__file__), "..", "calib", "elic_united_q2.f16.msgpack")
variables = {"params": load_calib_params_device(ck, variables["params"])}

codecs, outs = {}, {}
for u in unrolls:
    os.environ["RGBDC_ENC_UNROLL"] = str(u)
    codecs[u] = UnitedCodec(model, variables)
    outs[u] = codecs[u].compress_lanes(rgb, depth)  # warm/compile
    print(f"unroll {u}: warmed", flush=True)

base = outs[unrolls[0]]
for u in unrolls[1:]:
    for k in ("r_streams", "d_streams"):
        for a, b2 in zip(outs[u][k], base[k]):
            assert a == b2, f"unroll {u} changed {k} bytes"
print("streams byte-identical across unrolls", flush=True)

ts = {u: [] for u in unrolls}
for i in range(n):
    for u in unrolls:
        t0 = time.time()
        codecs[u].compress_lanes(rgb, depth)
        ts[u].append(time.time() - t0)
for u in unrolls:
    ms = [round(x * 1e3) for x in ts[u]]
    print(f"compress_lanes unroll={u}: min {min(ts[u])*1e3:.0f} ms all {ms}", flush=True)
