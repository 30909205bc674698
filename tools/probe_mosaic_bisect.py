"""Bisect which construct in the dense-decode Pallas kernel crashes the
remote Mosaic compiler (tpu_compile_helper HTTP 500).

Known from tools/probe_pallas.py + the knob_stack run on hardware
(2026-08-18):
  P3  carry-only kernel (u32 state advance, [RS,128] VMEM carry) — OK
  P1/P4 full dense decode/encode — Mosaic "infer-vector-layout:
      unsupported shape cast: tpu.reshape vector<1x64x128xi32> ->
      vector<8192x1xi32>", i.e. the idx.reshape(R, 1) lane->sublane
      relayout that builds the one-hot matmul operand.

This probe (a) walks a construct ladder to map what else is off-limits,
(b) tries reshape workarounds (3D iota one-hot with a lane-preserving
merge), and (c) validates + times the PRECOMPUTED-ROW redesign: hoist
the aug[idx] lookup out of the kernel as one big MXU matmul, stream
rowx blocks [1, K, RS, RL] per grid step, and keep the kernel purely
elementwise [RS,128] — no reshapes at all.  Shapes are the real serving
ones (R=8192, N_ROWS~64, K~130):

  B1  carry + reshape [RS,128] -> [R,1] -> [RS,128]
  B2  B1 + broadcasted_iota one-hot compare [R, N_ROWS]
  B3  B2 + f32 dot_general [R,N_ROWS]@[N_ROWS,K+2]
  B4  B3 + masked sum/max/min reductions over axis 1
  B5  B4 + esc/value/adv u32 state logic (no word fetch)
  B6  B5 + one-hot word fetch, W=8
  B7  B6 at W=64

plus workaround variants for whichever rung fails.  Compile failures are
RESULTS; each prints the first line of the compiler error.

Run: python tools/probe_mosaic_bisect.py          (TPU)
     STAGES=B3,B4 python tools/probe_mosaic_bisect.py
"""

import functools
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, LANES, STEPS = 16, 512, 8
R = B * LANES
RS, RL = R // 128, 128
N_ROWS, K = 64, 130
KK = K + 2
BIGF = jnp.float32(1 << 20)


def base_io(n_words=8):
    step = pl.BlockSpec((1, RS, RL), lambda t: (t, 0, 0),
                        memory_space=pltpu.VMEM)
    lane = pl.BlockSpec((RS, RL), lambda t: (0, 0), memory_space=pltpu.VMEM)
    words = pl.BlockSpec((n_words, RS, RL), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    aug = pl.BlockSpec((N_ROWS, KK), lambda t: (0, 0),
                       memory_space=pltpu.VMEM)
    return step, lane, words, aug


def build(kernel, n_words=8):
    step, lane, words, aug = base_io(n_words)

    @jax.jit
    def run(idx_rows, act_rows, words3, augt, st, pos):
        return pl.pallas_call(
            kernel,
            grid=(STEPS,),
            in_specs=[step, step, words, aug, lane, lane],
            out_specs=[step, step, lane, lane],
            out_shape=[
                jax.ShapeDtypeStruct((STEPS, RS, RL), jnp.int32),
                jax.ShapeDtypeStruct((STEPS, RS, RL), jnp.int32),
                jax.ShapeDtypeStruct((RS, RL), jnp.uint32),
                jax.ShapeDtypeStruct((RS, RL), jnp.int32),
            ],
            scratch_shapes=[pltpu.VMEM((RS, RL), jnp.uint32),
                            pltpu.VMEM((RS, RL), jnp.int32)],
        )(idx_rows, act_rows, words3, augt, st, pos)

    return run


def inputs(n_words=8):
    rng = np.random.default_rng(0)
    idx = rng.integers(0, N_ROWS, (STEPS, RS, RL)).astype(np.int32)
    act = np.ones((STEPS, RS, RL), np.int32)
    w3 = rng.integers(0, 1 << 16, (n_words, RS, RL)).astype(np.int32)
    augt = np.sort(
        rng.integers(0, 1 << 16, (N_ROWS, KK)).astype(np.float32), axis=1
    )
    st = np.full((RS, RL), 1 << 16, np.uint32)
    pos = np.zeros((RS, RL), np.int32)
    return tuple(jnp.asarray(a) for a in (idx, act, w3, augt, st, pos))


def shell(body):
    """Wrap a body(state, pos, idx, act, words_ref, aug_ref) ->
    (new_state, new_pos, sym, esc) into the standard kernel signature."""

    def kernel(idx_ref, act_ref, words_ref, aug_ref, st_in_ref, pos_in_ref,
               sym_ref, esc_ref, st_out_ref, pos_out_ref, state_scr,
               pos_scr):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            state_scr[:] = st_in_ref[:]
            pos_scr[:] = pos_in_ref[:]

        ns, npos, sym, esc = body(
            state_scr[:], pos_scr[:], idx_ref[0], act_ref[0] != 0,
            words_ref, aug_ref
        )
        state_scr[:] = ns
        pos_scr[:] = npos
        sym_ref[0] = sym
        esc_ref[0] = esc

        @pl.when(t == pl.num_programs(0) - 1)
        def _():
            st_out_ref[:] = state_scr[:]
            pos_out_ref[:] = pos_scr[:]

    return kernel


# ---- ladder bodies --------------------------------------------------------

def b0(state, pos, idx, act, words_ref, aug_ref):
    cum = (state & 0xFFFF).astype(jnp.uint32)
    adv = (state >> 16) * jnp.uint32(512) + cum
    return adv, pos, idx, jnp.zeros_like(idx)


def b1(state, pos, idx, act, words_ref, aug_ref):
    flat = idx.reshape(R, 1)
    back = (flat + 1).reshape(RS, RL)
    cum = (state & 0xFFFF).astype(jnp.uint32)
    adv = (state >> 16) * jnp.uint32(512) + cum
    return adv, pos, back, jnp.zeros_like(idx)


def b2(state, pos, idx, act, words_ref, aug_ref):
    idx_f = idx.reshape(R, 1)
    oh = (idx_f == jax.lax.broadcasted_iota(jnp.int32, (R, N_ROWS), 1))
    s = jnp.sum(oh.astype(jnp.int32), axis=1).reshape(RS, RL)
    cum = (state & 0xFFFF).astype(jnp.uint32)
    adv = (state >> 16) * jnp.uint32(512) + cum
    return adv, pos, s, jnp.zeros_like(idx)


def b3(state, pos, idx, act, words_ref, aug_ref):
    idx_f = idx.reshape(R, 1)
    oh = (idx_f == jax.lax.broadcasted_iota(jnp.int32, (R, N_ROWS), 1)
          ).astype(jnp.float32)
    rowx = jax.lax.dot_general(oh, aug_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    s = jnp.sum(rowx, axis=1).astype(jnp.int32).reshape(RS, RL)
    cum = (state & 0xFFFF).astype(jnp.uint32)
    adv = (state >> 16) * jnp.uint32(512) + cum
    return adv, pos, s, jnp.zeros_like(idx)


def _reductions(rowx, state):
    row = rowx[:, :K]
    off = rowx[:, K].astype(jnp.int32).reshape(RS, RL)
    maxv = rowx[:, K + 1].reshape(RS, RL)
    cum = (state & 0xFFFF).astype(jnp.int32)
    cumf = cum.astype(jnp.float32).reshape(R, 1)
    le = row <= cumf
    s = jnp.sum(le[:, 1:].astype(jnp.int32), axis=1).reshape(RS, RL)
    start = jnp.max(jnp.where(le, row, 0.0), axis=1).reshape(RS, RL)
    nxt = jnp.min(jnp.where(le, BIGF, row), axis=1).reshape(RS, RL)
    return s, start, nxt, off, maxv, cum


def _rowx(idx, aug_ref):
    idx_f = idx.reshape(R, 1)
    oh = (idx_f == jax.lax.broadcasted_iota(jnp.int32, (R, N_ROWS), 1)
          ).astype(jnp.float32)
    return jax.lax.dot_general(oh, aug_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def b4(state, pos, idx, act, words_ref, aug_ref):
    s, start, nxt, off, maxv, cum = _reductions(_rowx(idx, aug_ref), state)
    adv = (state >> 16) + s.astype(jnp.uint32)
    return adv, pos, s + off, jnp.zeros_like(idx)


def b5(state, pos, idx, act, words_ref, aug_ref):
    s, start, nxt, off, maxv, cum = _reductions(_rowx(idx, aug_ref), state)
    freq = (nxt - start).astype(jnp.int32).astype(jnp.uint32)
    start_i = start.astype(jnp.int32)
    esc = s.astype(jnp.float32) == maxv
    value = jnp.where(esc, maxv.astype(jnp.int32), s) + off
    adv = (state >> 16) * freq + cum.astype(jnp.uint32) - start_i.astype(
        jnp.uint32)
    need = act & (adv < jnp.uint32(1 << 16))
    adv = jnp.where(need, adv << 16, adv)
    npos = pos + need.astype(jnp.int32)
    return (jnp.where(act, adv, state), jnp.where(act, npos, pos),
            jnp.where(act, value, 0), (act & esc).astype(jnp.int32))


def fetch_onehot(words_ref, pos, n_words):
    out = jnp.zeros(pos.shape, jnp.int32)
    for w in range(n_words):
        out = out + jnp.where(pos == w, words_ref[w], 0)
    return out


def b6(state, pos, idx, act, words_ref, aug_ref):
    s, start, nxt, off, maxv, cum = _reductions(_rowx(idx, aug_ref), state)
    freq = (nxt - start).astype(jnp.int32).astype(jnp.uint32)
    start_i = start.astype(jnp.int32)
    esc = s.astype(jnp.float32) == maxv
    value = jnp.where(esc, maxv.astype(jnp.int32), s) + off
    adv = (state >> 16) * freq + cum.astype(jnp.uint32) - start_i.astype(
        jnp.uint32)
    need = act & (adv < jnp.uint32(1 << 16))
    w = fetch_onehot(words_ref, jnp.where(need, pos, -1),
                     words_ref.shape[0]).astype(jnp.uint32)
    adv = jnp.where(need, (adv << 16) | w, adv)
    npos = pos + need.astype(jnp.int32)
    return (jnp.where(act, adv, state), jnp.where(act, npos, pos),
            jnp.where(act, value, 0), (act & esc).astype(jnp.int32))


def b2v(state, pos, idx, act, words_ref, aug_ref):
    """Reshape workaround: 3D iota one-hot [RS, RL, N] then a
    lane-preserving merge [RS, RL, N] -> [RS*RL, N]."""
    oh3 = (idx[:, :, None]
           == jax.lax.broadcasted_iota(jnp.int32, (RS, RL, N_ROWS), 2))
    oh = oh3.astype(jnp.float32).reshape(R, N_ROWS)
    rowx = jax.lax.dot_general(oh, aug_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    s = jnp.sum(rowx, axis=1).reshape(RS, RL).astype(jnp.int32)
    cum = (state & 0xFFFF).astype(jnp.uint32)
    adv = (state >> 16) * jnp.uint32(512) + cum
    return adv, pos, s, jnp.zeros_like(idx)


LADDER = [
    ("B0 carry", b0, 8),
    ("B1 +reshape", b1, 8),
    ("B2 +iota-onehot", b2, 8),
    ("B2v 3d-onehot", b2v, 8),
    ("B3 +dot", b3, 8),
    ("B4 +reductions", b4, 8),
    ("B5 +state-logic", b5, 8),
    ("B6 +fetch w8", b6, 8),
    ("B7 +fetch w64", b6, 64),
]


# ---- C1: precomputed-row elementwise decode kernel -------------------------
# rowx is precomputed OUTSIDE the kernel (one MXU matmul over all steps)
# and streamed per grid step as a [1, KP, RS, RL] u16 block (KP = K+2 with
# the off/maxv columns folded in as rows KP-2/KP-1).  The kernel body is
# pure elementwise [RS,128]: unrolled k-loop of compare/select/min/max.

KP = K + 2


def c1_kernel(rowx_ref, act_ref, words_ref, st_in_ref, pos_in_ref,
              sym_ref, esc_ref, st_out_ref, pos_out_ref, state_scr,
              pos_scr, *, n_words, kk):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        state_scr[:] = st_in_ref[:]
        pos_scr[:] = pos_in_ref[:]

    state = state_scr[:]
    pos = pos_scr[:]
    act = act_ref[0] != 0
    cum = (state & 0xFFFF).astype(jnp.int32)

    off = rowx_ref[0, kk - 2].astype(jnp.int32)
    maxv = rowx_ref[0, kk - 1].astype(jnp.int32)
    s = jnp.zeros(cum.shape, jnp.int32)
    start = jnp.zeros(cum.shape, jnp.int32)
    nxt = jnp.full(cum.shape, 1 << 16, jnp.int32)
    for k in range(kk - 2):
        row_k = rowx_ref[0, k].astype(jnp.int32)
        le = row_k <= cum
        if k > 0:
            s = s + le.astype(jnp.int32)
        start = jnp.where(le, jnp.maximum(start, row_k), start)
        nxt = jnp.where(le, nxt, jnp.minimum(nxt, row_k))

    freq = (nxt - start).astype(jnp.uint32)
    esc = s == maxv
    value = jnp.where(esc, maxv, s) + off
    adv = ((state >> 16) * freq + cum.astype(jnp.uint32)
           - start.astype(jnp.uint32))
    need = act & (adv < jnp.uint32(1 << 16))
    w = jnp.zeros(pos.shape, jnp.int32)
    fpos = jnp.where(need, pos, -1)
    for i in range(n_words):
        w = w + jnp.where(fpos == i, words_ref[i], 0)
    adv = jnp.where(need, (adv << 16) | w.astype(jnp.uint32), adv)
    npos = pos + need.astype(jnp.int32)

    state_scr[:] = jnp.where(act, adv, state)
    pos_scr[:] = jnp.where(act, npos, pos)
    sym_ref[0] = jnp.where(act, value, 0)
    esc_ref[0] = (act & esc).astype(jnp.int32)

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        st_out_ref[:] = state_scr[:]
        pos_out_ref[:] = pos_scr[:]


def build_c1(n_words=8, steps=STEPS, kk=KP, dtype=jnp.uint16):
    rowx_spec = pl.BlockSpec((1, kk, RS, RL), lambda t: (t, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    step = pl.BlockSpec((1, RS, RL), lambda t: (t, 0, 0),
                        memory_space=pltpu.VMEM)
    lane = pl.BlockSpec((RS, RL), lambda t: (0, 0), memory_space=pltpu.VMEM)
    words = pl.BlockSpec((n_words, RS, RL), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    kern = functools.partial(c1_kernel, n_words=n_words, kk=kk)

    @jax.jit
    def run(rowx, act_rows, words3, st, pos):
        return pl.pallas_call(
            kern,
            grid=(steps,),
            in_specs=[rowx_spec, step, words, lane, lane],
            out_specs=[step, step, lane, lane],
            out_shape=[
                jax.ShapeDtypeStruct((steps, RS, RL), jnp.int32),
                jax.ShapeDtypeStruct((steps, RS, RL), jnp.int32),
                jax.ShapeDtypeStruct((RS, RL), jnp.uint32),
                jax.ShapeDtypeStruct((RS, RL), jnp.int32),
            ],
            scratch_shapes=[pltpu.VMEM((RS, RL), jnp.uint32),
                            pltpu.VMEM((RS, RL), jnp.int32)],
        )(rowx, act_rows, words3, st, pos)

    return run


def run_c1(n_words=8, kk=KP, steps=STEPS, dtype=np.uint16, reps=3):
    import time
    rng = np.random.default_rng(1)
    rowx = np.sort(
        rng.integers(0, 1 << 16, (steps, kk, RS, RL)), axis=1
    ).astype(dtype)
    act = np.ones((steps, RS, RL), np.int32)
    w3 = rng.integers(0, 1 << 16, (n_words, RS, RL)).astype(np.int32)
    st = np.full((RS, RL), 1 << 16, np.uint32)
    pos = np.zeros((RS, RL), np.int32)
    args = tuple(jnp.asarray(a) for a in (rowx, act, w3, st, pos))
    run = build_c1(n_words=n_words, steps=steps, kk=kk)
    out = run(*args)
    np.asarray(out[0]).ravel()[:1]
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = run(*args)
        np.asarray(out[0]).ravel()[:1]
        ts.append(time.time() - t0)
    t = min(ts)
    nsym = steps * RS * RL
    print(f"C1 precomp-rows kk={kk} w={n_words} steps={steps}: "
          f"{t*1e3:8.1f} ms  {t/nsym*1e9:6.2f} ns/sym", flush=True)


def main():
    want = os.environ.get("STAGES")
    want = set(want.split(",")) if want else None
    ins8 = inputs(8)
    ins64 = inputs(64)
    for name, body, nw in LADDER:
        if want and name.split()[0] not in want:
            continue
        try:
            run = build(shell(body), n_words=nw)
            ins = ins64 if nw == 64 else ins8
            out = run(*ins)
            np.asarray(out[0]).ravel()[:1]  # force execution
            print(f"{name}: OK", flush=True)
        except Exception as e:
            msg = str(e).replace("\n", " | ")[:300]
            print(f"{name}: FAILED — {type(e).__name__}: {msg}", flush=True)

    for kk, nw, steps in [(42, 8, 400), (42, 64, 400), (KP, 64, 400)]:
        name = f"C1 kk={kk} w={nw}"
        if want and "C1" not in want:
            continue
        try:
            run_c1(n_words=nw, kk=kk, steps=steps)
        except Exception as e:
            msg = str(e).replace("\n", " | ")[:300]
            print(f"{name}: FAILED — {type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
