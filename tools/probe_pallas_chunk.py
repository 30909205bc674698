"""Pallas sequential-grid overhead probe.

probe_mosaic_bisect.py measured ~0.8 ms PER GRID STEP even for a trivial
carry-only kernel body (P3: 308 ms / 400 steps; C1 precomp-rows: 1.13
ms/step) — the sequential grid itself, not the body, is the cost on this
toolchain.  This probe pins that and times the fix:

  D0  carry-only at grid sizes {50, 100, 400}: is total time linear in
      grid steps (per-step overhead) or flat (fixed dispatch)?
  D1  chunked carry: grid=(steps/CH,), fori_loop(CH) inside the kernel,
      step blocks [CH, RS, RL] — amortizes grid overhead CH x.
  D2  chunked precomp-row decode body (the C1 design, full lookup-free
      ladder: compare/select reductions over kk streamed rows + one-hot
      word fetch), chunk sizes {8, 32}.

Run: python tools/probe_pallas_chunk.py
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, LANES = 16, 512
R = B * LANES
RS, RL = R // 128, 128
BIG16 = 1 << 16


def timeit(run, args, reps=3):
    out = run(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = run(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        ts.append(time.time() - t0)
    return min(ts)


# ---- D0: carry-only, one row per grid step --------------------------------

def d0_kernel(idx_ref, st_in_ref, sym_ref, st_out_ref, state_scr):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        state_scr[:] = st_in_ref[:]

    state = state_scr[:]
    cum = state & jnp.uint32(0xFFFF)
    state_scr[:] = (state >> 16) * jnp.uint32(512) + cum
    sym_ref[0] = idx_ref[0]

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        st_out_ref[:] = state_scr[:]


def build_d0(steps):
    step = pl.BlockSpec((1, RS, RL), lambda t: (t, 0, 0),
                        memory_space=pltpu.VMEM)
    lane = pl.BlockSpec((RS, RL), lambda t: (0, 0), memory_space=pltpu.VMEM)

    @jax.jit
    def run(idx, st):
        return pl.pallas_call(
            d0_kernel,
            grid=(steps,),
            in_specs=[step, lane],
            out_specs=[step, lane],
            out_shape=[jax.ShapeDtypeStruct((steps, RS, RL), jnp.int32),
                       jax.ShapeDtypeStruct((RS, RL), jnp.uint32)],
            scratch_shapes=[pltpu.VMEM((RS, RL), jnp.uint32)],
        )(idx, st)

    return run


# ---- D1: chunked carry ------------------------------------------------------

def d1_kernel(idx_ref, st_in_ref, sym_ref, st_out_ref, state_scr, *, ch):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        state_scr[:] = st_in_ref[:]

    def body(i, state):
        cum = state & jnp.uint32(0xFFFF)
        ns = (state >> 16) * jnp.uint32(512) + cum
        sym_ref[i] = idx_ref[i]
        return ns

    state_scr[:] = jax.lax.fori_loop(0, ch, body, state_scr[:])

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        st_out_ref[:] = state_scr[:]


def build_d1(steps, ch):
    blk = pl.BlockSpec((ch, RS, RL), lambda t: (t, 0, 0),
                       memory_space=pltpu.VMEM)
    lane = pl.BlockSpec((RS, RL), lambda t: (0, 0), memory_space=pltpu.VMEM)

    @jax.jit
    def run(idx, st):
        return pl.pallas_call(
            functools.partial(d1_kernel, ch=ch),
            grid=(steps // ch,),
            in_specs=[blk, lane],
            out_specs=[blk, lane],
            out_shape=[jax.ShapeDtypeStruct((steps, RS, RL), jnp.int32),
                       jax.ShapeDtypeStruct((RS, RL), jnp.uint32)],
            scratch_shapes=[pltpu.VMEM((RS, RL), jnp.uint32)],
        )(idx, st)

    return run


# ---- D2: chunked precomp-row decode body -----------------------------------

def d2_kernel(rowx_ref, act_ref, words_ref, st_in_ref, pos_in_ref,
              sym_ref, esc_ref, st_out_ref, pos_out_ref,
              state_scr, pos_scr, *, ch, kk, n_words):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        state_scr[:] = st_in_ref[:]
        pos_scr[:] = pos_in_ref[:]

    def body(i, carry):
        state, pos = carry
        act = act_ref[i] != 0
        cum = (state & jnp.uint32(0xFFFF)).astype(jnp.int32)
        off = rowx_ref[i, kk - 2].astype(jnp.int32)
        maxv = rowx_ref[i, kk - 1].astype(jnp.int32)
        s = jnp.zeros(cum.shape, jnp.int32)
        start = jnp.zeros(cum.shape, jnp.int32)
        nxt = jnp.full(cum.shape, BIG16, jnp.int32)
        for k in range(kk - 2):
            row_k = rowx_ref[i, k].astype(jnp.int32)
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
        need = act & (adv < jnp.uint32(BIG16))
        w = jnp.zeros(pos.shape, jnp.int32)
        fpos = jnp.where(need, pos, -1)
        for wi in range(n_words):
            w = w + jnp.where(fpos == wi, words_ref[wi], 0)
        adv = jnp.where(need, (adv << 16) | w.astype(jnp.uint32), adv)
        sym_ref[i] = jnp.where(act, value, 0)
        esc_ref[i] = (act & esc).astype(jnp.int32)
        return (jnp.where(act, adv, state),
                jnp.where(act, pos + need.astype(jnp.int32), pos))

    state, pos = jax.lax.fori_loop(
        0, ch, body, (state_scr[:], pos_scr[:])
    )
    state_scr[:] = state
    pos_scr[:] = pos

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        st_out_ref[:] = state_scr[:]
        pos_out_ref[:] = pos_scr[:]


def build_d2(steps, ch, kk, n_words):
    rowx = pl.BlockSpec((ch, kk, RS, RL), lambda t: (t, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((ch, RS, RL), lambda t: (t, 0, 0),
                       memory_space=pltpu.VMEM)
    words = pl.BlockSpec((n_words, RS, RL), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    lane = pl.BlockSpec((RS, RL), lambda t: (0, 0), memory_space=pltpu.VMEM)

    @jax.jit
    def run(rowx_a, act, w3, st, pos):
        return pl.pallas_call(
            functools.partial(d2_kernel, ch=ch, kk=kk, n_words=n_words),
            grid=(steps // ch,),
            in_specs=[rowx, blk, words, lane, lane],
            out_specs=[blk, blk, lane, lane],
            out_shape=[jax.ShapeDtypeStruct((steps, RS, RL), jnp.int32),
                       jax.ShapeDtypeStruct((steps, RS, RL), jnp.int32),
                       jax.ShapeDtypeStruct((RS, RL), jnp.uint32),
                       jax.ShapeDtypeStruct((RS, RL), jnp.int32)],
            scratch_shapes=[pltpu.VMEM((RS, RL), jnp.uint32),
                            pltpu.VMEM((RS, RL), jnp.int32)],
        )(rowx_a, act, w3, st, pos)

    return run


def main():
    rng = np.random.default_rng(0)
    idx400 = jnp.asarray(
        rng.integers(0, 64, (400, RS, RL)).astype(np.int32))
    st0 = jnp.asarray(np.full((RS, RL), BIG16, np.uint32))

    for steps in (50, 100, 400):
        try:
            t = timeit(build_d0(steps), (idx400[:steps], st0))
            n = steps * R
            print(f"D0 grid={steps}: {t*1e3:8.1f} ms  "
                  f"{t/steps*1e6:7.1f} us/step  {t/n*1e9:6.2f} ns/sym",
                  flush=True)
        except Exception as e:
            print(f"D0 grid={steps}: FAILED — {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)

    for ch in (8, 32, 100):
        try:
            t = timeit(build_d1(400, ch), (idx400, st0))
            n = 400 * R
            print(f"D1 chunk={ch}: {t*1e3:8.1f} ms  "
                  f"{t/400*1e6:7.1f} us/row  {t/n*1e9:6.2f} ns/sym",
                  flush=True)
        except Exception as e:
            print(f"D1 chunk={ch}: FAILED — {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)

    kk, nw = 42, 64
    rowx = jnp.asarray(np.sort(
        rng.integers(0, BIG16, (400, kk, RS, RL)), axis=1).astype(np.uint16))
    act = jnp.asarray(np.ones((400, RS, RL), np.int32))
    w3 = jnp.asarray(
        rng.integers(0, BIG16, (nw, RS, RL)).astype(np.int32))
    pos0 = jnp.asarray(np.zeros((RS, RL), np.int32))
    for ch in (8, 32):
        try:
            t = timeit(build_d2(400, ch, kk, nw), (rowx, act, w3, st0, pos0))
            n = 400 * R
            print(f"D2 chunk={ch} kk={kk} w={nw}: {t*1e3:8.1f} ms  "
                  f"{t/400*1e6:7.1f} us/row  {t/n*1e9:6.2f} ns/sym",
                  flush=True)
        except Exception as e:
            print(f"D2 chunk={ch}: FAILED — {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
