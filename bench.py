"""Benchmark: enc+dec throughput of the flagship ELIC_united codec on
640x480 RGB-D images (the reference's eval protocol: pad to x64 ->
compress -> bitstreams -> decompress; testing/tester_united.py).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: 200 img/s on v5e-8 => 25 img/s per chip; vs_baseline is
normalized per-chip (value * 8 / 200 when running on one chip).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from rgbdc_tpu.utils.cache import enable_compile_cache


def main():
    enable_compile_cache()
    from rgbdc_tpu.models import ELICUnited, UnitedCodec

    batch = int(os.environ.get("BENCH_BATCH", "8"))
    iters = int(os.environ.get("BENCH_ITERS", "3"))

    model = ELICUnited()
    rng = np.random.default_rng(0)
    # 640x480 -> pad to 640x512 (the codec's x64 stride)
    rgb = jnp.asarray(rng.uniform(size=(batch, 512, 640, 3)), dtype=jnp.float32)
    depth = jnp.asarray(rng.uniform(size=(batch, 512, 640, 1)), dtype=jnp.float32)

    t0 = time.time()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, 128, 128, 3)),
        jnp.zeros((1, 128, 128, 1)),
        training=True,
    )
    print(f"init: {time.time()-t0:.1f}s", file=sys.stderr)

    codec = UnitedCodec(model, variables)

    # warmup (compiles everything)
    t0 = time.time()
    out = codec.compress(rgb, depth)
    dec = codec.decompress(out["r_strings"], out["d_strings"], out["shape"])
    jax.block_until_ready(dec["x_hat"]["r"])
    print(f"warmup: {time.time()-t0:.1f}s", file=sys.stderr)

    from rgbdc_tpu.utils.profiling import trace_if_enabled

    times = []
    for _ in range(iters):
        with trace_if_enabled():
            t0 = time.time()
            out = codec.compress(rgb, depth)
            dec = codec.decompress(out["r_strings"], out["d_strings"], out["shape"])
            jax.block_until_ready(dec["x_hat"]["r"])
            times.append(time.time() - t0)
    best = min(times)
    imgs_per_sec = batch / best

    n_chips = jax.device_count()
    # target: 200 img/s on 8 chips
    vs_baseline = imgs_per_sec * (8 / max(n_chips, 1)) / 200.0
    print(
        json.dumps(
            {
                "metric": "elic_united_encdec_640x480_rgbd",
                "value": round(imgs_per_sec, 3),
                "unit": "img/s",
                "vs_baseline": round(vs_baseline, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
