"""Lane-count sweep for the gather-free small-row scan codec (round 3).

Round 2 measured "lane count irrelevant (128/256/512 all ~16.5 Msym/s)" in
the GATHER-BOUND regime (packed-LUT pair + renorm fetch per symbol).  The
small-row fast path removed the per-symbol gathers, so the scan is now
per-row latency-bound — re-measure whether wider lanes amortize it.
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

B, NSYM = 16, 424960
st = get_scale_table()
gc = build_gaussian_tables(st)
rng = np.random.default_rng(0)
idx = np.minimum(rng.geometric(0.25, size=(B, NSYM)) - 1, 21).astype(np.uint8)
sig = np.asarray(st)[idx]
sym = np.clip(np.round(rng.normal(0, sig)), -20, 20).astype(np.int16)
small = rt.build_small_tables(gc)
lut = jax.device_put(jnp.asarray(rt.build_lut(gc)))
enc_lut = jax.device_put(jnp.asarray(rt.build_enc_lut(gc)))
idx_d = jnp.asarray(idx.astype(np.int32))
sym_d = jnp.asarray(sym.astype(np.int32)).astype(jnp.int16)


def timeit(name, fn, *args, sync=lambda o: np.asarray(o[:1, :1])):
    out = fn(*args)
    _ = sync(out)
    ts = []
    for _i in range(5):
        t0 = time.time()
        out = fn(*args)
        _ = sync(out)
        ts.append(time.time() - t0)
    dt = min(ts)
    print(f"  {name:14s}: {dt*1e3:6.0f} ms ({B*NSYM/dt/1e6:6.1f} Msym/s)", flush=True)
    return out


for LANES in (128, 256, 512, 1024):
    streams = [lanes_encode(sym[i], idx[i], [NSYM], gc, lanes=LANES) for i in range(B)]
    split = [lanes_split(s, LANES) for s in streams]
    w = -(-max(s[1].shape[1] for s in split) // 64) * 64
    bw = max(max(s[2].shape[1] for s in split), 1)
    states = jnp.asarray(np.stack([s[0] for s in split]))
    words = jnp.asarray(np.stack([np.pad(s[1], ((0, 0), (0, w - s[1].shape[1]))) for s in split]))
    byps = jnp.asarray(np.stack([np.pad(s[2], ((0, 0), (0, bw - s[2].shape[1]))) for s in split]))
    print(f"lanes={LANES} (rows={-(-NSYM // LANES)}, w={w}):", flush=True)

    def dec(state, words, byps, idx, lut):
        carry = rt.init_lane_state(state)
        _, flat = rt.decode_group(carry, words, byps, idx, lut, LANES, small=small)
        return flat

    out = timeit("decode", jax.jit(dec), states, words, byps, idx_d, lut)
    print("    exact:", np.array_equal(np.asarray(out, np.int16), sym), flush=True)

    wcap = int(words.shape[2] + 64)

    def enc(sym16, idx32, enc_lut):
        return rt.encode_groups(sym16, idx32, enc_lut, lanes=LANES,
                                group_lens=[NSYM], wcap=wcap, small=small)

    timeit("device encode", jax.jit(enc), sym_d, idx_d, enc_lut,
           sync=lambda o: np.asarray(o[0][:1, :1]))

# k_cap sweep at the serving lane count: narrower dense rows cut the
# per-symbol compare/select width for EVERY symbol; mid rows fall back to
# the packed-LUT while_loop (gathers measured ~free in the nofetch probe)
LANES = 512
streams = [lanes_encode(sym[i], idx[i], [NSYM], gc, lanes=LANES) for i in range(B)]
split = [lanes_split(s, LANES) for s in streams]
w = -(-max(s[1].shape[1] for s in split) // 64) * 64
bw = max(max(s[2].shape[1] for s in split), 1)
states = jnp.asarray(np.stack([s[0] for s in split]))
words = jnp.asarray(np.stack([np.pad(s[1], ((0, 0), (0, w - s[1].shape[1]))) for s in split]))
byps = jnp.asarray(np.stack([np.pad(s[2], ((0, 0), (0, bw - s[2].shape[1]))) for s in split]))
for kcap in (66, 40, 28):
    sm = rt.build_small_tables(gc, k_cap=kcap)
    print(f"k_cap={kcap}: r_small={sm[3] if sm else None}", flush=True)

    def dec(state, words, byps, idx, lut, _sm=sm):
        carry = rt.init_lane_state(state)
        _, flat = rt.decode_group(carry, words, byps, idx, lut, LANES, small=_sm)
        return flat

    out = timeit(f"decode k{kcap}", jax.jit(dec), states, words, byps, idx_d, lut)
    print("    exact:", np.array_equal(np.asarray(out, np.int16), sym), flush=True)
