"""Decompose the per-row cost of the small-row fast-path scan decoder.

Variants (all batch 16 x 128 lanes, trained-like small-row indexes):
  full      — the real _decode_row (small tables + LUT fallback + escapes)
  nofetch   — renorm word comes from a constant (gather removed): isolates
              the per-row take_along_axis cost
  window    — renorm words from a consume-order flat stream: per-image
              lax.dynamic_slice window + prefix-sum one-hot distribute
              (the wire-v3 candidate; decodes garbage, measures shape cost)
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

B, NSYM, LANES = 16, 424960, 128
st = get_scale_table()
gc = build_gaussian_tables(st)
rng = np.random.default_rng(0)
# trained-like statistics: indexes concentrated on small rows 0..21
idx = np.minimum(rng.geometric(0.25, size=(B, NSYM)) - 1, 21).astype(np.uint8)
sig = np.asarray(st)[idx]
sym = np.clip(np.round(rng.normal(0, sig)), -20, 20).astype(np.int16)

streams = [lanes_encode(sym[i], idx[i], [NSYM], gc, lanes=LANES) for i in range(B)]
split = [lanes_split(s, LANES) for s in streams]
w = -(-max(s[1].shape[1] for s in split) // 512) * 512
bw = max(max(s[2].shape[1] for s in split), 1)
states = jnp.asarray(np.stack([s[0] for s in split]))
words = jnp.asarray(np.stack([np.pad(s[1], ((0, 0), (0, w - s[1].shape[1]))) for s in split]))
byps = jnp.asarray(np.stack([np.pad(s[2], ((0, 0), (0, bw - s[2].shape[1]))) for s in split]))
lut = jax.device_put(jnp.asarray(rt.build_lut(gc)))
small = rt.build_small_tables(gc)
idx_d = jnp.asarray(idx.astype(np.int32))
print(f"small rows: {small[3]}; words/lane max {w}", flush=True)


def timeit(name, fn, *args):
    out = fn(*args)
    _ = np.asarray(out[:1, :1])  # 1-element sync (block_until_ready is a no-op on axon)
    ts = []
    for _i in range(6):
        t0 = time.time()
        out = fn(*args)
        _ = np.asarray(out[:1, :1])
        ts.append(time.time() - t0)
    dt = min(ts)
    print(f"{name:10s}: {dt*1e3:6.0f} ms/batch16  ({B*NSYM/dt/1e6:6.1f} Msym/s)  all {[round(x*1e3) for x in ts]}", flush=True)
    return out


def dec_full(state, words, byps, idx, lut):
    carry = rt.init_lane_state(state)
    _, flat = rt.decode_group(carry, words, byps, idx, lut, LANES, small=small)
    return flat


out = timeit("full", jax.jit(dec_full), states, words, byps, idx_d, lut)
print("exact:", np.array_equal(np.asarray(out, np.int16), sym), flush=True)

# --- nofetch: monkeypatch the renorm fetch to a constant ---------------------
_orig_fetch = rt._fetch_word
rt._fetch_word = lambda words, pos: jnp.full(pos.shape, 0x8000, jnp.uint32)
out = timeit("nofetch", jax.jit(dec_full), states, words, byps, idx_d, lut)
rt._fetch_word = _orig_fetch

# --- window: consume-order flat stream shape test ----------------------------
# words_flat [B, L]; per row: need -> prefix -> per-image dynamic_slice of a
# LANES-wide window at cur_b -> one-hot distribute.  Decodes garbage (the
# stream isn't really in consume order here); measures the per-row cost of
# the wire-v3 renorm machinery.
L = w * LANES
words_flat = jnp.reshape(words, (B, L)).astype(jnp.uint16)
cdf_s, off_s, maxv_s, r_small = small


def dec_window(state, words_flat, byps, idx, lut):
    steps = -(-NSYM // LANES)
    pad = steps * LANES - NSYM
    idx_p = jnp.pad(idx, ((0, 0), (0, pad)))
    idx_rows = idx_p.reshape(B, steps, LANES).transpose(1, 0, 2)

    def step(c, idx_row):
        state, cur, nib = c
        cum = (state & rt.MASK16).astype(jnp.int32)
        oh = (idx_row[..., None] == jnp.arange(r_small, dtype=jnp.int32)).astype(jnp.float32)
        row = jax.lax.dot_general(
            oh, jnp.asarray(cdf_s), (((2,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)
        cumf = cum.astype(jnp.float32)[..., None]
        s_sm = jnp.sum((row[..., 1:] <= cumf).astype(jnp.int32), axis=-1)
        ks = jnp.arange(cdf_s.shape[1], dtype=jnp.int32)
        m_s = (ks == s_sm[..., None]).astype(jnp.float32)
        m_n = (ks == (s_sm + 1)[..., None]).astype(jnp.float32)
        start = jnp.sum(row * m_s, axis=-1).astype(jnp.uint32)
        freq = jnp.maximum((jnp.sum(row * m_n, axis=-1)).astype(jnp.uint32) - start, 1)
        adv = (state >> 16) * freq + cum.astype(jnp.uint32) - start
        need = adv < rt.RANS32_L
        # prefix-sum positions within the row window, in lane order
        prefix = jnp.cumsum(need.astype(jnp.int32), axis=-1) - need.astype(jnp.int32)
        # per-image contiguous window: LANES u16 from cur_b
        wins = []
        for b in range(B):
            wins.append(jax.lax.dynamic_slice(words_flat, (b, cur[b]), (1, LANES))[0])
        win = jnp.stack(wins).astype(jnp.float32)  # [B, LANES] (u16 exact in f32)
        sel = (prefix[..., None] == jnp.arange(LANES, dtype=jnp.int32)).astype(jnp.float32)
        wrd = jax.lax.dot_general(
            sel, win, (((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST)
        # batched diag: [B, LANES, B] -> take own image's column
        wsel = jnp.asarray(wrd, jnp.uint32) if wrd.ndim == 2 else None
        state = jnp.where(need, (adv << 16) | wsel, adv)
        cur = cur + jnp.sum(need, axis=-1, dtype=jnp.int32)
        val = jnp.where(s_sm.astype(jnp.float32) == jnp.sum(oh * jnp.asarray(maxv_s), -1),
                        0, s_sm).astype(jnp.int32)
        return (state, cur, nib), val

    c0 = (state.astype(jnp.uint32), jnp.zeros((B,), jnp.int32), jnp.zeros((B, LANES), jnp.int32))
    _, syms = jax.lax.scan(step, c0, idx_rows)
    return syms.transpose(1, 0, 2).reshape(B, steps * LANES)[:, :NSYM]


out = timeit("window", jax.jit(dec_window), states, words_flat, byps, idx_d, lut)
