"""A/B the subpixel deconv lowering (RGBDC_SUBPIX) on the synthesis stage.

The k5/s2 transposed convs carry most of g_s's MACs; XLA lowers them as
convs over the 2x-zero-dilated input (3/4 wasted MACs).  RGBDC_SUBPIX=1
re-packs them as one dense 3x3 conv emitting all four output phases +
depth-to-space (nn/layers.py ConvTranspose).  Interleaved same-process
A/B: the env knob is read at trace time, so two jit wrappers built under
different env values carry both lowerings.

Run: python tools/prof_subpix.py   (PROF_BATCH=16 PROF_N=6)
"""
import os, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ["RGBDC_SUBPIX"] = "0"
import jax, jax.numpy as jnp, numpy as np
from rgbdc_tpu.utils.cache import enable_compile_cache

enable_compile_cache()
from rgbdc_tpu.models import ELICUnited
import bench as B

batch = int(os.environ.get("PROF_BATCH", "16"))
n = int(os.environ.get("PROF_N", "6"))
model = ELICUnited()
variables = model.init(
    {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
    jnp.zeros((1, 128, 128, 3)),
    jnp.zeros((1, 128, 128, 1)),
    training=True,
)
mt = type(model)

y_r = jax.random.normal(jax.random.PRNGKey(2), (batch, 32, 40, model.M), jnp.float32)
y_d = jax.random.normal(jax.random.PRNGKey(3), (batch, 32, 40, model.M), jnp.float32)


def cast_tree(tree, dt):
    return jax.tree.map(lambda x: x.astype(dt) if x.dtype == jnp.float32 else x, tree)


v16 = jax.device_put(cast_tree(variables, jnp.bfloat16))


def sync1(x):
    _ = np.asarray(x.ravel()[0])


def make_synth16():
    # trace-time env read: construct (and warm) under the CURRENT knob
    f = jax.jit(
        lambda v, a, b: tuple(
            x.astype(jnp.float32)
            for x in model.apply(
                v, a.astype(jnp.bfloat16), b.astype(jnp.bfloat16), method=mt.synthesize
            )
        )
    )
    out = f(v16, y_r, y_d)
    sync1(out[0])
    return f, out


os.environ["RGBDC_SUBPIX"] = "0"
f_off, o_off = make_synth16()
os.environ["RGBDC_SUBPIX"] = "1"
f_on, o_on = make_synth16()
err = float(jnp.max(jnp.abs(o_off[0] - o_on[0])))
rng = float(jnp.max(jnp.abs(o_off[0])))
print(f"subpix-vs-dilated max abs err {err:.4g} (range {rng:.3g})", flush=True)

ts = {"off": [], "on": []}
for i in range(n):
    for key, f in (("off", f_off), ("on", f_on)):
        t0 = time.time()
        out = f(v16, y_r, y_d)
        sync1(out[0])
        ts[key].append(time.time() - t0)
for key in ("off", "on"):
    ms = [round(x * 1e3) for x in ts[key]]
    print(f"synth bf16 SUBPIX={key}: min {min(ts[key])*1e3:.0f} ms all {ms}", flush=True)
