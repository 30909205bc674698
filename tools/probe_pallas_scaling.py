"""Is the ~1 ms/row Pallas cost fixed per row, or per element?

probe_pallas_ops.py: EVERY body variant costs ~1 ms per processed row
(grid step or fori iteration alike) at [64,128] tiles.  Two competing
theories:
  (a) fixed per-row overhead in the Mosaic sequential execution on this
      axon toolchain (launch/DMA latency per row) -> time flat in tile
      size, Pallas scans are dead here;
  (b) the kernel silently runs EMULATED (per-element interpretation)
      -> time scales with elements, ~122 ns/elem matching the XLA scan.

This probe: E0-style copy+carry kernels with correctness checks at tile
sizes [64,128] / [8,128] / [1,128], grid=400, plus a grid=1 fori=400
all-VMEM variant ([400,8,128] block resident, no per-row streaming).

Run: python tools/probe_pallas_scaling.py
"""

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

STEPS = 400


def kernel(idx_ref, st_in_ref, sym_ref, st_out_ref, state_scr):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        state_scr[:] = st_in_ref[:]

    state = state_scr[:]
    cum = state & jnp.uint32(0xFFFF)
    state_scr[:] = (state >> 16) * jnp.uint32(512) + cum
    sym_ref[0] = idx_ref[0] + 1

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        st_out_ref[:] = state_scr[:]


def build(rs, rl):
    blk = pl.BlockSpec((1, rs, rl), lambda t: (t, 0, 0),
                       memory_space=pltpu.VMEM)
    lane = pl.BlockSpec((rs, rl), lambda t: (0, 0), memory_space=pltpu.VMEM)

    @jax.jit
    def run(idx, st):
        return pl.pallas_call(
            kernel,
            grid=(STEPS,),
            in_specs=[blk, lane],
            out_specs=[blk, lane],
            out_shape=[jax.ShapeDtypeStruct((STEPS, rs, rl), jnp.int32),
                       jax.ShapeDtypeStruct((rs, rl), jnp.uint32)],
            scratch_shapes=[pltpu.VMEM((rs, rl), jnp.uint32)],
        )(idx, st)

    return run


def vmem_kernel(idx_ref, st_in_ref, sym_ref, st_out_ref):
    def body(i, state):
        cum = state & jnp.uint32(0xFFFF)
        sym_ref[i] = idx_ref[i] + 1
        return (state >> 16) * jnp.uint32(512) + cum

    st_out_ref[:] = jax.lax.fori_loop(0, STEPS, body, st_in_ref[:])


def build_vmem(rs, rl):
    blk = pl.BlockSpec((STEPS, rs, rl), lambda: (0, 0, 0),
                       memory_space=pltpu.VMEM)
    lane = pl.BlockSpec((rs, rl), lambda: (0, 0), memory_space=pltpu.VMEM)

    @jax.jit
    def run(idx, st):
        return pl.pallas_call(
            vmem_kernel,
            in_specs=[blk, lane],
            out_specs=[blk, lane],
            out_shape=[jax.ShapeDtypeStruct((STEPS, rs, rl), jnp.int32),
                       jax.ShapeDtypeStruct((rs, rl), jnp.uint32)],
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
    return min(ts), out


def ref_state(st, steps):
    s = st.astype(np.uint64)
    for _ in range(steps):
        cum = s & 0xFFFF
        s = ((s >> 16) * 512 + cum) & 0xFFFFFFFF
    return s.astype(np.uint32)


def main():
    rng = np.random.default_rng(0)
    for rs, rl, tag in [(64, 128, "64x128"), (8, 128, "8x128"),
                        (1, 128, "1x128")]:
        idx = jnp.asarray(
            rng.integers(0, 64, (STEPS, rs, rl)).astype(np.int32))
        st = jnp.asarray(
            rng.integers(1 << 16, 1 << 30, (rs, rl)).astype(np.uint32))
        try:
            t, (sym, stf) = timeit(build(rs, rl), (idx, st))
            ok_sym = np.array_equal(np.asarray(sym), np.asarray(idx) + 1)
            ok_st = np.array_equal(np.asarray(stf),
                                   ref_state(np.asarray(st), STEPS))
            print(f"G {tag}: {t*1e3:8.1f} ms  {t/STEPS*1e6:7.1f} us/row  "
                  f"sym_ok={ok_sym} st_ok={ok_st}", flush=True)
        except Exception as e:
            print(f"G {tag}: FAILED — {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    for rs, rl, tag in [(8, 128, "vmem 8x128"), (64, 128, "vmem 64x128")]:
        idx = jnp.asarray(
            rng.integers(0, 64, (STEPS, rs, rl)).astype(np.int32))
        st = jnp.asarray(
            rng.integers(1 << 16, 1 << 30, (rs, rl)).astype(np.uint32))
        try:
            t, (sym, stf) = timeit(build_vmem(rs, rl), (idx, st))
            ok_sym = np.array_equal(np.asarray(sym), np.asarray(idx) + 1)
            ok_st = np.array_equal(np.asarray(stf),
                                   ref_state(np.asarray(st), STEPS))
            print(f"G {tag}: {t*1e3:8.1f} ms  {t/STEPS*1e6:7.1f} us/row  "
                  f"sym_ok={ok_sym} st_ok={ok_st}", flush=True)
        except Exception as e:
            print(f"G {tag}: FAILED — {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
