"""Trained-checkpoint quality check for the bf16 serving path.

Compares PSNR of the full lane roundtrip (compress_lanes -> streams ->
decompress_lanes) with RGBDC_BF16 on vs off, on the bench content with the
committed calibration checkpoint.  The bf16 path must cost < 0.1 dB.
"""
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ["RGBDC_DEVICE_ENCODE"] = os.environ.get("RGBDC_DEVICE_ENCODE", "1")

import jax
import jax.numpy as jnp
import numpy as np

from rgbdc_tpu.utils.cache import enable_compile_cache

enable_compile_cache()
import bench as B
from rgbdc_tpu.eval.metrics import psnr
from rgbdc_tpu.models import ELICUnited, UnitedCodec
from tools.export_calib import load_calib_params_device

batch = int(os.environ.get("PROF_BATCH", "8"))
model = ELICUnited()
rgb_np, depth_np = B._bench_images(batch)
rgb, depth = jnp.asarray(rgb_np), jnp.asarray(depth_np)
variables = model.init(
    {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
    jnp.zeros((1, 128, 128, 3)), jnp.zeros((1, 128, 128, 1)), training=True,
)
ck = os.path.join(os.path.dirname(__file__), "..", "calib", "elic_united_q2.f16.msgpack")
variables = {"params": load_calib_params_device(ck, variables["params"])}

res = {}
for mode in ("0", "1"):
    os.environ["RGBDC_BF16"] = mode
    codec = UnitedCodec(model, variables)
    out = codec.compress_lanes(rgb, depth)
    dec = codec.decompress_lanes(out["r_streams"], out["d_streams"], out["shape"])
    pr = float(psnr(dec["x_hat"]["r"], rgb))
    pd = float(psnr(dec["x_hat"]["d"], depth))
    nb = sum(len(s) for s in out["r_streams"] + out["d_streams"])
    bpp = nb * 8 / (batch * rgb.shape[1] * rgb.shape[2])
    res[mode] = (pr, pd, bpp)
    print(f"bf16={mode}: psnr_rgb {pr:.3f} dB  psnr_depth {pd:.3f} dB  bpp {bpp:.4f}",
          flush=True)

dr = res["0"][0] - res["1"][0]
dd = res["0"][1] - res["1"][1]
db = (res["1"][2] - res["0"][2]) / max(res["0"][2], 1e-9)
print(f"bf16 cost: rgb {dr:+.3f} dB, depth {dd:+.3f} dB, bpp {db:+.2%}", flush=True)
