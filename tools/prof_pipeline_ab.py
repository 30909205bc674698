"""Interleaved A/B of the bench pipeline depth (BENCH_DEPTH 2 vs 3) in ONE
process — sequential bench runs drift with the tunnel weather, so this is
the only honest comparison (docs/PERF.md measurement protocol).

Depth 2: compress(i+1) overlaps decompress(i) (classic two-stage).
Depth 3: a second compress stays in flight AND the compress worker also
runs prepare_decode_lanes (container parse + h2d dispatch), so the
compress host tail and decode upload leave the critical path.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/prof_pipeline_ab.py
Env: AB_BATCH (32), AB_ITERS (6), AB_WINDOWS (3 per depth).
"""
import os
import sys
import time
from collections import deque
from concurrent.futures import ThreadPoolExecutor

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
for k, v in {
    "RGBDC_DEVICE_ENCODE": "1", "RGBDC_BF16": "1", "RGBDC_LANES": "512",
    "RGBDC_DENSE128": "1", "RGBDC_DEC_ESCFIX": "1", "RGBDC_ENC_SCANOUT": "1",
    "RGBDC_FLAT_UPLOAD": "1", "RGBDC_WMAX": "128",
    "RGBDC_ENC_GCOMPACT": "onehot", "RGBDC_DEC_WFETCH": "onehot",
}.items():
    os.environ.setdefault(k, v)

import jax
import jax.numpy as jnp
import numpy as np

from rgbdc_tpu.utils.cache import enable_compile_cache

enable_compile_cache()
import bench as B
from rgbdc_tpu.models import ELICUnited, UnitedCodec
from tools.export_calib import load_calib_params_device

batch = int(os.environ.get("AB_BATCH", "32"))
iters = int(os.environ.get("AB_ITERS", "6"))
windows = int(os.environ.get("AB_WINDOWS", "3"))

model = ELICUnited()
rgb_np, depth_np = B._bench_images(batch)
rgb, depth = jnp.asarray(rgb_np), jnp.asarray(depth_np)
variables = model.init(
    {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
    jnp.zeros((1, 128, 128, 3)), jnp.zeros((1, 128, 128, 1)), training=True,
)
ck = os.path.join(
    os.path.dirname(__file__), "..", "calib", "elic_united_q2.f16.msgpack"
)
variables = {"params": load_calib_params_device(ck, variables["params"])}
codec = UnitedCodec(model, variables)


def compress(prep: bool):
    out = codec.compress_lanes(rgb, depth)
    handle = (
        codec.prepare_decode_lanes(out["r_streams"], out["d_streams"])
        if prep else None
    )
    return out, handle


def sync(arr):
    np.asarray(arr[:1, :1, :1, :1])


# warmup: compiles everything both paths use (shared programs)
out, handle = compress(True)
dec = codec.decompress_lanes(out["r_streams"], out["d_streams"], out["shape"],
                             prepared=handle)
sync(dec["x_hat"]["r"])
compress(True)
print("warmup done", file=sys.stderr, flush=True)

pool = ThreadPoolExecutor(2)


def window(depth: int, prep: bool) -> float:
    comp, handle = compress(prep)
    futs = deque(pool.submit(compress, prep) for _ in range(depth - 2))
    t0 = time.time()
    for _ in range(iters):
        futs.append(pool.submit(compress, prep))
        dec = codec.decompress_lanes(
            comp["r_streams"], comp["d_streams"], comp["shape"],
            prepared=handle,
        )
        sync(dec["x_hat"]["r"])
        comp, handle = futs.popleft().result()
    elapsed = time.time() - t0
    for f in futs:
        f.result()
    return batch * iters / elapsed


CFGS = {"d2": (2, False), "d2p": (2, True), "d3p": (3, True)}
res = {k: [] for k in CFGS}
order = (["d2", "d2p", "d3p"] + ["d3p", "d2p", "d2"]) * ((windows + 1) // 2)
for k in order[: 3 * windows]:
    r = window(*CFGS[k])
    res[k].append(r)
    print(f"{k}: {r:.2f} img/s", flush=True)

for k in CFGS:
    xs = res[k]
    print(
        f"{k}: best {max(xs):.2f} median {sorted(xs)[len(xs)//2]:.2f} "
        f"all {[round(x, 2) for x in xs]}",
        flush=True,
    )
