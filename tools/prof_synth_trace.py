"""Capture xplane traces of the ISOLATED bf16 synthesis and analysis-front
stages at bench shapes and print the per-op breakdown (tools/xplane_ops.py).

front (146 ms) + synth (172 ms) are ~1/3 of the serving device budget but
sit well above a bandwidth-roofline estimate — this attributes whether the
time is conv MACs, relayouts/transposes (BiSPF windows, depth-to-space),
f32 leakage, or GDN elementwise chains.

Run on the real TPU:  PYTHONPATH=... python tools/prof_synth_trace.py
"""
import os, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp, numpy as np
from rgbdc_tpu.utils.cache import enable_compile_cache

enable_compile_cache()
import bench as B
from rgbdc_tpu.models import ELICUnited

batch = int(os.environ.get("PROF_BATCH", "16"))
model = ELICUnited()
rgb_np, depth_np = B._bench_images(batch)
rgb, depth = jnp.asarray(rgb_np), jnp.asarray(depth_np)
variables = model.init(
    {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
    jnp.zeros((1, 128, 128, 3)), jnp.zeros((1, 128, 128, 1)), training=True,
)
mt = type(model)


def cast_tree(tree, dt):
    return jax.tree.map(lambda x: x.astype(dt) if x.dtype == jnp.float32 else x, tree)


v16 = jax.device_put(cast_tree(variables, jnp.bfloat16))
y_r = jax.random.normal(jax.random.PRNGKey(2), (batch, 32, 40, model.M), jnp.float32)
y_d = jax.random.normal(jax.random.PRNGKey(3), (batch, 32, 40, model.M), jnp.float32)

synth16 = jax.jit(
    lambda v, a, b: tuple(
        x.astype(jnp.float32)
        for x in model.apply(
            v, a.astype(jnp.bfloat16), b.astype(jnp.bfloat16), method=mt.synthesize
        )
    )
)
front16 = jax.jit(
    lambda v, r, d: jax.tree.map(
        lambda x: x.astype(jnp.float32) if x.dtype == jnp.bfloat16 else x,
        model.apply(
            v, r.astype(jnp.bfloat16), d.astype(jnp.bfloat16), method=mt.encode_front
        ),
    )
)


def sync1(o):
    leaf = jax.tree.leaves(o)[0]
    _ = np.asarray(leaf.ravel()[0])


sync1(synth16(v16, y_r, y_d))
sync1(front16(v16, rgb, depth))

for name, fn, args in (
    ("synth", synth16, (v16, y_r, y_d)),
    ("front", front16, (v16, rgb, depth)),
):
    tdir = f"/tmp/trace_{name}"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        for _ in range(3):
            sync1(fn(*args))
    print(f"== {name}: trace at {tdir}", flush=True)
    os.system(
        f"PYTHONPATH=/root/repo python {os.path.dirname(__file__)}/xplane_ops.py {tdir} 25"
    )
