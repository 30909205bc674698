"""Interleaved batch-16 vs batch-32 A/B of the serving path (one process,
alternating reps — sequential bench.py runs CANNOT compare batch sizes
because the tunnel drifts by the hour; the earlier "batch-32 recheck
flat" note predates this harness).

Why batch 32 might win: the rANS scans are ROW-bound (row count set by
the y/z spatial size, not the batch), so doubling the batch doubles the
per-row lane work (~free on the VPU) while the conv stacks scale
linearly — amortizing the scan + dispatch + RTT fixed costs over 2x
images.

Run on the real TPU:
  PYTHONPATH=/root/repo:$PYTHONPATH python tools/prof_batch_ab.py
"""
import os, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
for k, v in [("RGBDC_DEVICE_ENCODE", "1"), ("RGBDC_BF16", "1"),
             ("RGBDC_LANES", "512"), ("RGBDC_DEC_ESCFIX", "1"),
             ("RGBDC_ENC_SCANOUT", "1"), ("RGBDC_FLAT_UPLOAD", "1"),
             ("RGBDC_DENSE128", "1"), ("RGBDC_ENC_GCOMPACT", "1"),
             ("RGBDC_WMAX", "128"), ("RGBDC_DEC_WFETCH", "onehot")]:
    os.environ.setdefault(k, v)

import jax, jax.numpy as jnp, numpy as np
from rgbdc_tpu.utils.cache import enable_compile_cache

enable_compile_cache()
import bench as B
from rgbdc_tpu.models import ELICUnited, UnitedCodec
from tools.export_calib import load_calib_params_device

BATCHES = [int(x) for x in os.environ.get("PROF_BATCHES", "16,32").split(",")]
REPS = int(os.environ.get("REPS", "4"))
model = ELICUnited()
variables = model.init(
    {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
    jnp.zeros((1, 128, 128, 3)), jnp.zeros((1, 128, 128, 1)), training=True,
)
ck = os.path.join(os.path.dirname(__file__), "..", "calib",
                  "elic_united_q2.f16.msgpack")
variables = {"params": load_calib_params_device(ck, variables["params"])}
codec = UnitedCodec(model, variables)

data = {}
for b in BATCHES:
    rgb_np, depth_np = B._bench_images(b)
    data[b] = (jnp.asarray(rgb_np), jnp.asarray(depth_np))


def sync1(x):
    _ = np.asarray(x[:1, :1, :1, :1])


for b in BATCHES:
    rgb, depth = data[b]
    t0 = time.time()
    out = codec.compress_lanes(rgb, depth)
    out = codec.compress_lanes(rgb, depth)
    dec = codec.decompress_lanes(out["r_streams"], out["d_streams"], out["shape"])
    sync1(dec["x_hat"]["r"])
    np.testing.assert_array_equal(
        np.asarray(dec["y_hat"]["r"]), np.asarray(out["y_hat"]["r"])
    )
    print(f"warm b={b}: {time.time()-t0:.1f} s (closure ok)", flush=True)

e2e = {b: [] for b in BATCHES}
for r in range(REPS):
    for b in BATCHES:
        rgb, depth = data[b]
        t0 = time.time()
        out = codec.compress_lanes(rgb, depth)
        t1 = time.time()
        dec = codec.decompress_lanes(out["r_streams"], out["d_streams"],
                                     out["shape"])
        sync1(dec["x_hat"]["r"])
        t2 = time.time()
        e2e[b].append(t2 - t0)
        print(f"rep {r} b={b}: comp {1e3*(t1-t0):.0f} ms  dec {1e3*(t2-t1):.0f} "
              f"ms  e2e {1e3*(t2-t0):.0f} ms  ({b/(t2-t0):.2f} img/s serial)",
              flush=True)

for b in BATCHES:
    m = min(e2e[b])
    print(f"b={b}: e2e min {1e3*m:.0f} ms -> {b/m:.2f} img/s serial", flush=True)
