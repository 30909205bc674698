"""Phase split of the serving path (device encode + bf16, trained ckpt):
compress_lanes wall, decompress_lanes wall, and the fused sub-phases.

Run with the bench env (RGBDC_LANES etc.) to profile the bench config.
"""
import os, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("RGBDC_DEVICE_ENCODE", "1")
os.environ.setdefault("RGBDC_BF16", "1")
os.environ.setdefault("RGBDC_LANES", "512")

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
    # accept any pytree: fetch one element of the first array leaf
    leaf = next(a for a in jax.tree.leaves(x) if hasattr(a, "ravel"))
    _ = np.asarray(leaf.ravel()[0])


def t(label, fn, n=4):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.time()
        r = fn()
        ts.append(time.time() - t0)
    print(f"{label}: min {min(ts)*1e3:.0f} ms all {[round(x*1e3) for x in ts]}",
          flush=True)
    return r


out = codec.compress_lanes(rgb, depth)  # warm (compiles + sets tuners)
dec = codec.decompress_lanes(out["r_streams"], out["d_streams"], out["shape"])
sync1(dec["x_hat"]["r"])

t("compress_lanes (wall)", lambda: codec.compress_lanes(rgb, depth))
t("decompress_lanes (wall, synced)", lambda: (
    lambda d: (sync1(d["x_hat"]["r"]), d)[1]
)(codec.decompress_lanes(out["r_streams"], out["d_streams"], out["shape"])))

# sub-phases
v = codec.variables
rgb_d, depth_d = codec._put_batch((rgb, depth))
fr = t("  front (bf16, synced)", lambda: (
    lambda o: (sync1(o[0]), o)[1]
)(codec._encode_front_srv(v, rgb_d, depth_d)))
rgb_y, depth_y, rz, dz = fr
zst3, zw, zb = codec._dummy_lane_inputs(batch)
fl = t("  fused flow enc (synced)", lambda: (
    lambda r: (sync1(r[4][-1]), r)[1]
)(codec._fused_flow(v, rgb_y, depth_y, rz, dz, zst3, zw, zb, zst3, zw, zb,
                    jnp.asarray(False))))
rz2, dz2, r_groups, d_groups, _, _ = fl
y_lens = [int(np.prod(g[0].shape[1:])) for g in r_groups]
enc_fn, all_lens = codec._device_encode_setup(
    batch, (int(rz.shape[1]), int(rz.shape[2])), y_lens
)
t("  enc scans+sideband both mods (synced)", lambda: (
    lambda r: (sync1(r[0][0]), r)[1]
)(enc_fn(rz2, dz2, r_groups, d_groups)))

st = t("  stack+upload (synced)", lambda: (
    lambda a: (sync1(a[0][0]), a)[1]
)((codec._stack_streams(out["r_streams"]), codec._stack_streams(out["d_streams"]))))
(r_st3, r_words, r_byp), (d_st3, d_words, d_byp) = st
zh, zw_ = int(rz.shape[1]), int(rz.shape[2])
rz0 = jnp.zeros((batch, zh, zw_, model.N), jnp.int32)
y0 = jnp.zeros((batch, zh * 4, zw_ * 4, model.M), jnp.float32)
dfl = t("  fused flow dec (synced)", lambda: (
    lambda r: (sync1(r[4][-1]), r)[1]
)(codec._fused_flow(v, y0, y0, rz0, rz0,
                    r_st3, r_words, r_byp,
                    d_st3, d_words, d_byp, jnp.asarray(True))))
r_yh = jnp.concatenate(dfl[4], axis=-1)
d_yh = jnp.concatenate(dfl[5], axis=-1)
t("  synth (bf16, synced)", lambda: (
    lambda o: (sync1(o[0]), o)[1]
)(codec._synth_srv(v, r_yh, d_yh)))
