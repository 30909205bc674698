"""Capture an xplane trace of the ISOLATED decode scan at bench shapes and
print the per-op breakdown (tools/xplane_ops.py) — the decode scan is the
serving path's largest remaining device phase (~20 ns/sym across every
layout tried; docs/PERF.md).  Attribution inside the scan body tells us
whether the time sits in the one-hot matmul, the compare/select
reductions, the while_loops, or relayouts.

Run on the real TPU:  python tools/prof_scan_trace.py
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp, numpy as np
from rgbdc_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
from rgbdc_tpu.coder import rans_tpu as rt
from rgbdc_tpu.coder.rans import lanes_encode, lanes_split
from rgbdc_tpu.entropy.tables import build_gaussian_tables
from rgbdc_tpu.entropy import get_scale_table

B, NSYM, LANES = 16, 424960, 512
st = get_scale_table()
gc = build_gaussian_tables(st)
rng = np.random.default_rng(0)
idx = np.minimum(rng.geometric(0.25, size=(B, NSYM)) - 1, 21).astype(np.uint8)
sig = np.asarray(st)[idx]
sym = np.clip(np.round(rng.normal(0, sig)), -20, 20).astype(np.int16)
small = rt.build_small_tables(gc, k_cap=40)
lut = jax.device_put(jnp.asarray(rt.build_lut(gc)))
idx_d = jnp.asarray(idx.astype(np.int32))

streams = [lanes_encode(sym[i], idx[i], [NSYM], gc, lanes=LANES) for i in range(B)]
split = [lanes_split(s, LANES) for s in streams]
w = -(-max(s[1].shape[1] for s in split) // 64) * 64
bw = max(max(s[2].shape[1] for s in split), 1)
states = jnp.asarray(np.stack([s[0] for s in split]))
words = jnp.asarray(np.stack([np.pad(s[1], ((0, 0), (0, w - s[1].shape[1]))) for s in split]))
byps = jnp.asarray(np.stack([np.pad(s[2], ((0, 0), (0, bw - s[2].shape[1]))) for s in split]))


@jax.jit
def dec(state, words, byps, idx, lut):
    carry = rt.init_lane_state(state)
    _, flat = rt.decode_group(carry, words, byps, idx, lut, LANES, small=small)
    return flat


out = dec(states, words, byps, idx_d, lut)
_ = np.asarray(out[:1, :1])
assert np.array_equal(np.asarray(out, np.int16), sym)
t0 = time.time()
out = dec(states, words, byps, idx_d, lut)
_ = np.asarray(out[:1, :1])
print(f"decode scan: {(time.time()-t0)*1e3:.0f} ms wall", flush=True)

logdir = "/tmp/jaxtrace_scan"
os.system(f"rm -rf {logdir}")
jax.profiler.start_trace(logdir)
out = dec(states, words, byps, idx_d, lut)
_ = np.asarray(out[:1, :1])
jax.profiler.stop_trace()
print("parsing...", flush=True)
import subprocess, sys
subprocess.run([sys.executable, os.path.join(os.path.dirname(__file__), "xplane_ops.py"), logdir, "50"])
