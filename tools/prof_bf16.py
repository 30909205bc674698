"""Measure bf16-weight/activation speedups for the conv-heavy stages.

front (g_a+h_a both modalities) and synth (g_s) are near the MXU roofline
in f32-in (XLA already runs the matmuls as bf16 passes); this measures
what end-to-end bf16 tensors buy (halved HBM activation traffic + single
bf16 MXU pass).  Entropy-parameter stages are NOT touched by design: they
feed quantization boundaries, and while the shared-program closure would
stay bit-exact either way, keeping them f32 keeps the imported-weights
golden parity intact.
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp, numpy as np
from rgbdc_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
from rgbdc_tpu.models import ELICUnited
import bench as B

batch = int(os.environ.get("PROF_BATCH", "16"))
model = ELICUnited()
rgb_np, depth_np = B._bench_images(batch)
rgb, depth = jnp.asarray(rgb_np), jnp.asarray(depth_np)
variables = model.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
                       jnp.zeros((1,128,128,3)), jnp.zeros((1,128,128,1)), training=True)
mt = type(model)


def sync1(x):
    _ = np.asarray(x.ravel()[0])


def t(label, fn, *args, n=4):
    out = fn(*args)
    sync1(jax.tree.leaves(out)[0])
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        sync1(jax.tree.leaves(out)[0])
        ts.append(time.time() - t0)
    print(f"{label}: min {min(ts)*1e3:.0f} ms all {[round(x*1e3) for x in ts]}", flush=True)
    return out


def cast_tree(tree, dt):
    return jax.tree.map(
        lambda x: x.astype(dt) if x.dtype == jnp.float32 else x, tree
    )


v16 = jax.device_put(cast_tree(variables, jnp.bfloat16))

# --- synth --------------------------------------------------------------------
zh, zw = 8, 10
y_r = jax.random.normal(jax.random.PRNGKey(2), (batch, 32, 40, model.M), jnp.float32)
y_d = jax.random.normal(jax.random.PRNGKey(3), (batch, 32, 40, model.M), jnp.float32)

synth32 = jax.jit(lambda v, a, b: model.apply(v, a, b, method=mt.synthesize))
synth16 = jax.jit(
    lambda v, a, b: tuple(
        x.astype(jnp.float32)
        for x in model.apply(
            v, a.astype(jnp.bfloat16), b.astype(jnp.bfloat16), method=mt.synthesize
        )
    )
)
o32 = t("synth f32", synth32, variables, y_r, y_d)
o16 = t("synth bf16", synth16, v16, y_r, y_d)
err = float(jnp.max(jnp.abs(o32[0] - o16[0])))
rng = float(jnp.max(jnp.abs(o32[0])))
print(f"synth bf16 max abs err {err:.4g} (range {rng:.3g})", flush=True)

# --- front (analysis + hyper-analysis, encode side) ---------------------------
fr32 = jax.jit(lambda v, r, d: model.apply(v, r, d, method=mt.encode_front))
fr16 = jax.jit(
    lambda v, r, d: jax.tree.map(
        lambda x: x.astype(jnp.float32) if x.dtype == jnp.bfloat16 else x,
        model.apply(
            v, r.astype(jnp.bfloat16), d.astype(jnp.bfloat16), method=mt.encode_front
        ),
    )
)
try:
    f32o = t("front f32", fr32, variables, rgb, depth)
    f16o = t("front bf16", fr16, v16, rgb, depth)
except Exception as e:
    print("front probe skipped:", type(e).__name__, str(e)[:200], flush=True)
