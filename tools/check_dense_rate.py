"""Rate cost of the dense-capped tables (RGBDC_DENSE128) on the TRAINED
calibration checkpoint: compress the bench content with and without the
cap and report stream bytes + bpp delta.

The cap folds each wide row's tails into its escape interval; a trained
codec's residuals sit far inside the kept window (calib: max |residual|
= 9), so the expected delta is ~0 on real content — this script is the
evidence.  Runs fine on CPU (host-encode path):

    JAX_PLATFORMS=cpu python tools/check_dense_rate.py
Env: RATE_BATCH (default 2), RATE_H/RATE_W (default 512x640),
RGBDC_DENSE_CAP to sweep the cap.
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from rgbdc_tpu.utils.cache import enable_compile_cache

enable_compile_cache()
import bench as B
from rgbdc_tpu.models import ELICUnited, UnitedCodec
from tools.export_calib import load_calib_params_device

batch = int(os.environ.get("RATE_BATCH", "2"))
H = int(os.environ.get("RATE_H", "512"))
W = int(os.environ.get("RATE_W", "640"))

model = ELICUnited()
rgb_np, depth_np = B._bench_images(batch)
rgb = jnp.asarray(rgb_np[:, :H, :W])
depth = jnp.asarray(depth_np[:, :H, :W])
variables = model.init(
    {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
    jnp.zeros((1, 128, 128, 3)), jnp.zeros((1, 128, 128, 1)), training=True,
)
ck = os.path.join(os.path.dirname(__file__), "..", "calib",
                  "elic_united_q2.f16.msgpack")
variables = {"params": load_calib_params_device(ck, variables["params"])}

results = {}
for dense in ("0", "1"):
    os.environ["RGBDC_DENSE128"] = dense
    codec = UnitedCodec(model, variables)
    codec._lane_setup()
    out = codec.compress_lanes(rgb, depth)
    dec = codec.decompress_lanes(out["r_streams"], out["d_streams"],
                                 out["shape"])
    np.testing.assert_array_equal(
        np.asarray(dec["y_hat"]["r"]), np.asarray(out["y_hat"]["r"])
    )
    nbytes = sum(
        len(s) for streams in (out["r_streams"], out["d_streams"])
        for s in streams
    )
    bpp = nbytes * 8.0 / (batch * H * W)
    results[dense] = (nbytes, bpp)
    print(f"DENSE128={dense}: {nbytes} bytes total, {bpp:.5f} bpp "
          f"(closure ok)", flush=True)

d0, d1 = results["0"][0], results["1"][0]
print(f"dense cap rate delta: {100.0 * (d1 - d0) / d0:+.3f}% "
      f"({d1 - d0:+d} bytes on {d0})", flush=True)
