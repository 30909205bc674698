"""Interleaved A/B: classic in-scan-scatter encode vs scan-output encode
(encode_groups scan_out=True — tiny VMEM carry + one post-scan compaction
scatter).  The classic scan carries a [B, lanes, wcap] u16 word buffer
(~13 MB at bench shapes: HBM-resident, one masked scatter read-modify-
write per row); scan_out returns (word, emit) as scan ys instead.

Run on the real TPU:  python tools/prof_encscan.py
Interleave discipline per docs/PERF.md (tunnel drifts by the hour).
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp, numpy as np
from rgbdc_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
from rgbdc_tpu.coder import rans_tpu as rt
from rgbdc_tpu.entropy.tables import build_gaussian_tables
from rgbdc_tpu.entropy import get_scale_table

B, NSYM = int(os.environ.get("ENCB", "16")), int(os.environ.get("ENCN", "424960"))
LANES = int(os.environ.get("ENCLANES", "512"))
UNROLL = int(os.environ.get("ENCUNROLL", "4"))
st = get_scale_table()
gc = build_gaussian_tables(st)
rng = np.random.default_rng(0)
idx = np.minimum(rng.geometric(0.25, size=(B, NSYM)) - 1, 21).astype(np.uint8)
sig = np.asarray(st)[idx]
sym = np.clip(np.round(rng.normal(0, sig)), -20, 20).astype(np.int16)
small = rt.build_small_tables(gc, k_cap=40)
enc_lut = jax.device_put(jnp.asarray(rt.build_enc_lut(gc)))
idx_d = jnp.asarray(idx.astype(np.int32))
sym_d = jnp.asarray(sym.astype(np.int32)).astype(jnp.int16)
wcap = -(-NSYM // LANES) + 64


def timeit(name, fn, *args):
    out = fn(*args)
    _ = np.asarray(out[0][:1, :1])
    ts = []
    for _i in range(6):
        t0 = time.time()
        out = fn(*args)
        _ = np.asarray(out[0][:1, :1])
        ts.append(time.time() - t0)
    dt = min(ts)
    print(f"  {name:16s}: {dt*1e3:6.0f} ms ({B*NSYM/dt/1e6:6.1f} Msym/s)", flush=True)
    return out


def mk(scan_out):
    def enc(sym16, idx32, lut):
        return rt.encode_groups(sym16, idx32, lut, lanes=LANES,
                                group_lens=[NSYM], wcap=wcap, small=small,
                                unroll=UNROLL, scan_out=scan_out)
    return jax.jit(enc)

f_classic, f_out = mk(False), mk(True)
print(f"B={B} NSYM={NSYM} lanes={LANES} unroll={UNROLL} wcap={wcap}", flush=True)
for rep in range(3):
    a = timeit("classic scatter", f_classic, sym_d, idx_d, enc_lut)
    b = timeit("scan-out", f_out, sym_d, idx_d, enc_lut)
    if rep == 0:
        wc = np.asarray(a[1])
        same = (
            np.array_equal(np.asarray(a[0]), np.asarray(b[0]))
            and np.array_equal(wc, np.asarray(b[1]))
            and all(
                np.array_equal(
                    np.asarray(a[2])[i, l, : wc[i, l]],
                    np.asarray(b[2])[i, l, : wc[i, l]],
                )
                for i in range(B) for l in range(0, LANES, 37)
            )
        )
        print(f"  bit-identical: {same}", flush=True)
