"""Microbench of word-compaction formulations at bench shapes (encode
epilogue): the sort-free gather compaction (_compact_words_gather) won its
A/B at WMAX=128 but its broadcast compare-count is O(rows*wcap) per lane —
871M element-ops at bench shapes.  Candidates:

  count32   — current: (ct[:,:,None,:] <= j).astype(i32) sum over rows
  count8    — same compare but i8 summands (shrinks any materialized
              broadcast 4x), i32 accumulation via two-level chunk sums
  onehot_mm — slot value directly: out[j] = sum_r words_r * (ct_r == j+1)
              as a bf16 one-hot matmul on the MXU (exact: words < 2^16
              split into two 8-bit halves, each exact in bf16)

All must be bit-identical to _compact_words on random emit patterns.

Run on the real TPU:  PYTHONPATH=/root/repo:$PYTHONPATH python tools/prof_compact.py
"""
import os, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp, numpy as np
from rgbdc_tpu.utils.cache import enable_compile_cache

enable_compile_cache()
from rgbdc_tpu.coder import rans_tpu as rt

B, LANES, ROWS, WCAP = 16, 512, 832, 128
rng = np.random.default_rng(0)
# ~40 words/lane emitted (trained-stream regime)
emit = rng.random((ROWS, B, LANES)) < (40.0 / ROWS)
words = rng.integers(0, 1 << 16, size=(ROWS, B, LANES), dtype=np.uint16)
emit_d = jnp.asarray(emit)
words_d = jnp.asarray(words)

ref_wpos, ref_words = jax.jit(
    lambda w, e: rt._compact_words(w, e, B, LANES, WCAP)
)(words_d, emit_d)
ref_wpos, ref_words = np.asarray(ref_wpos), np.asarray(ref_words)


def count32(words_o, emit_o):
    return rt._compact_words_gather(words_o, emit_o, B, LANES, WCAP)


def count8(words_o, emit_o):
    et = emit_o.transpose(1, 2, 0)
    ct = jnp.cumsum(et.astype(jnp.int32), axis=-1)
    wpos = ct[..., -1]
    j = jnp.arange(WCAP, dtype=jnp.int32)
    # chunk the row axis so i8 partial sums cannot overflow (chunk <= 127)
    CH = 104
    nch = -(-ROWS // CH)
    pad = nch * CH - ROWS
    ctp = jnp.pad(ct.astype(jnp.uint16), ((0, 0), (0, 0), (0, pad)),
                  constant_values=jnp.uint16(0xFFFF))
    ctc = ctp.reshape(B, LANES, nch, CH)
    le = (ctc[:, :, None, :, :] <= j[:, None, None].astype(jnp.uint16)).astype(jnp.int8)
    r_j = jnp.sum(jnp.sum(le, axis=-1).astype(jnp.int32), axis=-1)
    wt = words_o.astype(jnp.uint16).transpose(1, 2, 0)
    out = jnp.take_along_axis(wt, jnp.minimum(r_j, ROWS - 1), axis=-1)
    out = jnp.where(j < wpos[..., None], out, jnp.uint16(0))
    return wpos, out


def onehot_mm(words_o, emit_o):
    et = emit_o.transpose(1, 2, 0)  # [B, LANES, ROWS]
    ct = jnp.cumsum(et.astype(jnp.int32), axis=-1)
    wpos = ct[..., -1]
    j1 = jnp.arange(1, WCAP + 1, dtype=jnp.int32)
    hit = (ct[:, :, :, None] == j1) & et[:, :, :, None]  # [B,L,ROWS,WCAP]
    oh = hit.astype(jnp.bfloat16)
    wt = words_o.transpose(1, 2, 0)  # [B, LANES, ROWS] u16
    lo = (wt & jnp.uint16(0xFF)).astype(jnp.bfloat16)
    hi = (wt >> 8).astype(jnp.bfloat16)
    mm = lambda vec: jax.lax.dot_general(
        vec[:, :, None, :], oh, (((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )[:, :, 0, :]
    out = (mm(lo).astype(jnp.int32)
           + (mm(hi).astype(jnp.int32) << 8)).astype(jnp.uint16)
    return wpos, out


for name, fn in (("count32", count32), ("count8", count8),
                 ("onehot_mm", onehot_mm)):
    f = jax.jit(fn)
    wpos, out = f(words_d, emit_d)
    np.testing.assert_array_equal(np.asarray(wpos), ref_wpos)
    np.testing.assert_array_equal(np.asarray(out), ref_words)
    ts = []
    for _ in range(6):
        t0 = time.time()
        wpos, out = f(words_d, emit_d)
        _ = np.asarray(out[:1, :1, :1])
        ts.append(time.time() - t0)
    print(f"{name}: min {min(ts)*1e3:.1f} ms  all {[round(x*1e3) for x in ts]}",
          flush=True)
