"""Capture an xplane trace of the ISOLATED device encode scan at bench-like
shapes and print the per-op breakdown (tools/xplane_ops.py).

The phase table (tools/prof_device_path.py) shows enc scans+sideband at
~276 ms vs ~160 ms for the decode scans over the SAME symbol count.  The
encoder's per-row extras vs decode: the u32 state division
(q = state // freq — XLA expands unsigned division into a long
shift-subtract chain on the VPU; decode's advance is multiply-only) and
the _compact_words scatter epilogue.  This attributes which.

Run on the real TPU:  PYTHONPATH=/root/repo:$PYTHONPATH python tools/prof_enc_trace.py
"""
import os, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp, numpy as np
from rgbdc_tpu.utils.cache import enable_compile_cache

enable_compile_cache()
from rgbdc_tpu.coder import rans_tpu as rt
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
enc_lut = jax.device_put(jnp.asarray(rt.build_enc_lut(gc)))
idx_d = jnp.asarray(idx.astype(np.int32))
sym_d = jnp.asarray(sym.astype(np.int32))


WCAP = int(os.environ.get("PROF_WCAP", "256"))
GATHER = os.environ.get("PROF_GATHER", "0") == "1"


@jax.jit
def enc(sym, idx, lut):
    return rt.encode_groups(
        sym, idx, lut, LANES, group_lens=[NSYM], wcap=WCAP,
        small=small, unroll=4, scan_out=True, gather_compact=GATHER,
    )


out = enc(sym_d, idx_d, enc_lut)
_ = np.asarray(out[1][:1, :1])
times = []
for _ in range(4):
    t0 = time.time()
    out = enc(sym_d, idx_d, enc_lut)
    _ = np.asarray(out[1][:1, :1])
    times.append((time.time() - t0) * 1e3)
print(
    f"encode scan+compact (wcap={WCAP} gather={GATHER}): "
    f"min {min(times):.0f} ms all {[int(t) for t in times]}", flush=True,
)

if os.environ.get("PROF_TRACE", "1") == "1":
    logdir = "/tmp/jaxtrace_enc"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    out = enc(sym_d, idx_d, enc_lut)
    _ = np.asarray(out[1][:1, :1])
    jax.profiler.stop_trace()
    print("parsing...", flush=True)
    import subprocess, sys

    subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "xplane_ops.py"), logdir, "15"]
    )
