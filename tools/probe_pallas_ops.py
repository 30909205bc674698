"""Which op makes a Pallas fori_loop row cost ~1 ms on this toolchain?

probe_pallas_chunk.py: a trivial carry body (u32 shift+mul+add on one
[64,128] tile + a block write) costs ~1.0-1.1 ms PER ROW regardless of
grid chunking — ~10^5 above the VPU op floor and 6x slower per row than
the XLA lax.scan.  This probe times one-op-at-a-time variants (grid=400,
chunk=32) to find the poison:

  E0  pure copy: sym_ref[i] = idx_ref[i]
  E1  E0 + u32 add carry
  E2  E0 + u32 shift carry
  E3  E0 + u32 multiply carry        (the full D1 body)
  E3s E0 + s32 multiply carry
  E4  no block write, carry only
  E5  E3 without the scratch (carry threaded through fori_loop only)

Run: python tools/probe_pallas_ops.py
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

R = 16 * 512
RS, RL = R // 128, 128
STEPS, CH = 400, 32


def body_copy(i, state, idx_ref, sym_ref):
    sym_ref[i] = idx_ref[i]
    return state


def body_add(i, state, idx_ref, sym_ref):
    sym_ref[i] = idx_ref[i]
    return state + jnp.uint32(7)


def body_shift(i, state, idx_ref, sym_ref):
    sym_ref[i] = idx_ref[i]
    return (state >> 16) + (state << 3)


def body_mul_u32(i, state, idx_ref, sym_ref):
    sym_ref[i] = idx_ref[i]
    cum = state & jnp.uint32(0xFFFF)
    return (state >> 16) * jnp.uint32(512) + cum


def body_mul_s32(i, state, idx_ref, sym_ref):
    sym_ref[i] = idx_ref[i]
    s = state.astype(jnp.int32)
    cum = s & 0xFFFF
    return ((((s >> 16) & 0xFFFF) * 512 + cum)).astype(jnp.uint32)


def body_mul_nowrite(i, state, idx_ref, sym_ref):
    cum = state & jnp.uint32(0xFFFF)
    return (state >> 16) * jnp.uint32(512) + cum + idx_ref[
        i
    ].astype(jnp.uint32)


def make_kernel(body, use_scratch=True):
    def kernel(idx_ref, st_in_ref, sym_ref, st_out_ref, state_scr):
        t = pl.program_id(0)
        if use_scratch:
            @pl.when(t == 0)
            def _():
                state_scr[:] = st_in_ref[:]
            init = state_scr[:]
        else:
            init = st_in_ref[:]
        fin = jax.lax.fori_loop(
            0, CH, lambda i, s: body(i, s, idx_ref, sym_ref), init
        )
        if use_scratch:
            state_scr[:] = fin

            @pl.when(t == pl.num_programs(0) - 1)
            def _():
                st_out_ref[:] = state_scr[:]
        else:
            st_out_ref[:] = fin

    return kernel


def build(body, use_scratch=True):
    blk = pl.BlockSpec((CH, RS, RL), lambda t: (t, 0, 0),
                       memory_space=pltpu.VMEM)
    lane = pl.BlockSpec((RS, RL), lambda t: (0, 0), memory_space=pltpu.VMEM)

    @jax.jit
    def run(idx, st):
        return pl.pallas_call(
            make_kernel(body, use_scratch),
            grid=(STEPS // CH,),
            in_specs=[blk, lane],
            out_specs=[blk, lane],
            out_shape=[jax.ShapeDtypeStruct((STEPS, RS, RL), jnp.int32),
                       jax.ShapeDtypeStruct((RS, RL), jnp.uint32)],
            scratch_shapes=[pltpu.VMEM((RS, RL), jnp.uint32)],
        )(idx, st)

    return run


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


def main():
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, 64, (STEPS, RS, RL)).astype(np.int32))
    st = jnp.asarray(np.full((RS, RL), 1 << 16, np.uint32))
    cases = [
        ("E0 copy-only   ", body_copy, True),
        ("E1 +u32 add    ", body_add, True),
        ("E2 +u32 shift  ", body_shift, True),
        ("E3 +u32 mul    ", body_mul_u32, True),
        ("E3s +s32 mul   ", body_mul_s32, True),
        ("E4 mul, no write", body_mul_nowrite, True),
        ("E5 mul, no scratch", body_mul_u32, False),
    ]
    for name, body, scr in cases:
        try:
            t = timeit(build(body, scr), (idx, st))
            print(f"{name}: {t*1e3:8.1f} ms  {t/STEPS*1e6:7.1f} us/row",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAILED — {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
