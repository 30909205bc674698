"""Pallas (Mosaic) kernels for the dense-table lane codec scans.

The XLA `lax.scan` decode/encode bodies plateau at ~20 ns/sym — two orders
of magnitude above their VPU op-count floor (docs/PERF.md) — which points
at per-step overhead (HBM round-trips of the carry, fusion boundaries),
not vector throughput.  These kernels run the same math with the carry
VMEM-resident across a sequential grid, one grid step per lockstep row.

They require the RGBDC_DENSE128 regime (rans_tpu.cap_table — every CDF row
covered by the dense one-hot-matmul lookup, no packed-LUT gathers) and,
for decode, escfix mode (no escape machinery in the scan body; values are
patched post-scan by rans_tpu._escape_fixup).  Bit-exactness vs the XLA
scan is pinned by tests/test_rans_tpu.py::TestPallasBackend in interpret
mode on CPU and by tools/probe_pallas.py on hardware.

Everything is gather-free: the symbol lookup is a one-hot matmul over the
dense augmented table (MXU) and the renorm word fetch is a one-hot
compare-sum over the word-buffer columns — so the word capacity (W) is a
COMPUTE cost here; serve with RGBDC_WMAX sized to real streams (128 is
ample for trained 512-lane streams) rather than the 1280-word default.

Layout: per-lane tensors ride as [RS, 128] tiles with RS = B*lanes/128
(asserted); per-step inputs/outputs as [steps, RS, 128] blocks.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np



def _interpret() -> bool:
    return os.environ.get("RGBDC_PALLAS_INTERPRET", "0") == "1"


def _aug_np(small) -> np.ndarray:
    cdf_s, off_s, maxv_s, _ = small
    return np.concatenate(
        [np.asarray(cdf_s), np.asarray(off_s)[:, None],
         np.asarray(maxv_s)[:, None]], axis=1,
    ).astype(np.float32)


def _lookup(aug, idx, r, n_rows, k):
    """One-hot matmul row fetch + single-mask reductions (the dense path of
    rans_tpu._decode_row, reshaped to [R] rows)."""
    idx_f = idx.reshape(r, 1)
    oh = (idx_f == jax.lax.broadcasted_iota(jnp.int32, (r, n_rows), 1)).astype(
        jnp.float32
    )
    rowx = jax.lax.dot_general(
        oh, aug, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [R, K+2]
    return rowx[:, :k], rowx[:, k], rowx[:, k + 1]


def _decode_kernel(idx_ref, act_ref, words_ref, aug_ref, st_in_ref,
                   pos_in_ref, sym_ref, esc_ref, st_out_ref, pos_out_ref,
                   state_scr, pos_scr, *, n_rows, k):
    import jax.experimental.pallas as pl

    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        state_scr[:] = st_in_ref[:]
        pos_scr[:] = pos_in_ref[:]

    state = state_scr[:]
    pos = pos_scr[:]
    rs, rl = state.shape
    r = rs * rl
    idx = idx_ref[0]
    act = act_ref[0] != 0
    cum = (state & 0xFFFF).astype(jnp.int32)

    row, off_c, maxv_c = _lookup(aug_ref[:], idx, r, n_rows, k)
    off = off_c.astype(jnp.int32).reshape(rs, rl)
    maxv = maxv_c.reshape(rs, rl)
    cumf = cum.astype(jnp.float32).reshape(r, 1)
    le = row <= cumf
    s = jnp.sum(le[:, 1:].astype(jnp.int32), axis=1).reshape(rs, rl)
    start = jnp.max(jnp.where(le, row, 0.0), axis=1).reshape(rs, rl)
    nxt = jnp.min(jnp.where(le, jnp.float32(1 << 20), row), axis=1).reshape(
        rs, rl
    )
    # Mosaic can't lower f32->u32 directly; values are < 2^16 so the
    # s32 hop is exact.
    freq = (nxt - start).astype(jnp.int32).astype(jnp.uint32)
    start_i = start.astype(jnp.int32)
    esc = s.astype(jnp.float32) == maxv
    value = jnp.where(esc, maxv.astype(jnp.int32), s) + off

    adv = (state >> 16) * freq + cum.astype(jnp.uint32) - start_i.astype(
        jnp.uint32
    )
    need = act & (adv < jnp.uint32(65536))
    safe_pos = jnp.where(need, pos, -1)
    w = jnp.zeros(pos.shape, jnp.int32)
    for j in range(words_ref.shape[0]):
        w = w + jnp.where(safe_pos == j, words_ref[j], 0)
    adv = jnp.where(need, (adv << 16) | w.astype(jnp.uint32), adv)

    state_scr[:] = jnp.where(act, adv, state)
    pos_scr[:] = pos + need.astype(jnp.int32)
    sym_ref[0] = jnp.where(act, value, 0)
    esc_ref[0] = (act & esc).astype(jnp.int32)

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        st_out_ref[:] = state_scr[:]
        pos_out_ref[:] = pos_scr[:]


def _encode_kernel(idx_ref, sym_ref, act_ref, aug_ref, st_in_ref,
                   word_ref, emit_ref, st_out_ref, state_scr, *, n_rows, k):
    import jax.experimental.pallas as pl

    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        state_scr[:] = st_in_ref[:]

    state = state_scr[:]
    rs, rl = state.shape
    r = rs * rl
    idx = idx_ref[0]
    sym = sym_ref[0]
    act = act_ref[0] != 0

    row, off_c, maxv_c = _lookup(aug_ref[:], idx, r, n_rows, k)
    off = off_c.astype(jnp.int32).reshape(rs, rl)
    maxv = maxv_c.astype(jnp.int32).reshape(rs, rl)
    v = sym - off
    v = jnp.where((v >= 0) & (v < maxv), v, maxv)
    ks = jax.lax.broadcasted_iota(jnp.int32, (r, k), 1)
    le = ks <= v.reshape(r, 1)
    start = jnp.max(jnp.where(le, row, 0.0), axis=1).reshape(rs, rl)
    freq = (
        jnp.min(jnp.where(le, jnp.float32(1 << 20), row), axis=1).reshape(
            rs, rl
        )
        - start
    ).astype(jnp.int32).astype(jnp.uint32)  # f32->u32 won't lower on Mosaic
    freq = jnp.maximum(freq, 1)
    start_u = start.astype(jnp.int32).astype(jnp.uint32)

    emit = act & (state >= (freq << 16))
    word = (state & 0xFFFF).astype(jnp.int32)
    state = jnp.where(emit, state >> 16, state)
    q = state // freq
    rem = state - q * freq
    nstate = (q << 16) + rem + start_u
    state_scr[:] = jnp.where(act, nstate, state)
    word_ref[0] = word
    emit_ref[0] = emit.astype(jnp.int32)

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        st_out_ref[:] = state_scr[:]


def _specs(steps, rs, rl, n_rows, kk, n_words=None):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    step = pl.BlockSpec((1, rs, rl), lambda t: (t, 0, 0),
                        memory_space=pltpu.VMEM)
    lane = pl.BlockSpec((rs, rl), lambda t: (0, 0), memory_space=pltpu.VMEM)
    aug = pl.BlockSpec((n_rows, kk + 2), lambda t: (0, 0),
                       memory_space=pltpu.VMEM)
    words = None
    if n_words is not None:
        words = pl.BlockSpec((n_words, rs, rl), lambda t: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    return step, lane, aug, words


def decode_rows(state, pos, words, idx_rows, act_rows, small):
    """Run the dense decode scan as a Pallas kernel.

    state/pos: [B, lanes] u32/i32 carry; words: [B, lanes, W] uint16;
    idx_rows/act_rows: [steps, B, lanes].  Returns (state, pos,
    syms [steps, B, lanes] i32, esc_rows [steps, B, lanes] bool).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, lanes = state.shape
    steps = idx_rows.shape[0]
    r = b * lanes
    assert r % 128 == 0, (b, lanes)
    rs, rl = r // 128, 128
    aug = _aug_np(small)
    n_rows, kk = aug.shape[0], aug.shape[1] - 2
    n_words = int(words.shape[-1])

    words3 = jnp.transpose(
        words.astype(jnp.int32).reshape(rs, rl, n_words), (2, 0, 1)
    )
    idx3 = idx_rows.reshape(steps, rs, rl)
    act3 = act_rows.astype(jnp.int32).reshape(steps, rs, rl)

    step, lane, aug_s, words_s = _specs(steps, rs, rl, n_rows, kk, n_words)
    kern = functools.partial(_decode_kernel, n_rows=n_rows, k=kk)
    syms, esc, st_f, pos_f = pl.pallas_call(
        kern,
        grid=(steps,),
        in_specs=[step, step, words_s, aug_s, lane, lane],
        out_specs=[step, step, lane, lane],
        out_shape=[
            jax.ShapeDtypeStruct((steps, rs, rl), jnp.int32),
            jax.ShapeDtypeStruct((steps, rs, rl), jnp.int32),
            jax.ShapeDtypeStruct((rs, rl), jnp.uint32),
            jax.ShapeDtypeStruct((rs, rl), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rs, rl), jnp.uint32),
            pltpu.VMEM((rs, rl), jnp.int32),
        ],
        interpret=_interpret(),
    )(idx3, act3, words3, jnp.asarray(aug),
      state.reshape(rs, rl), pos.reshape(rs, rl))
    return (
        st_f.reshape(b, lanes),
        pos_f.reshape(b, lanes),
        syms.reshape(steps, b, lanes),
        (esc != 0).reshape(steps, b, lanes),
    )


def encode_rows(state, idx_rows, sym_rows, act_rows, small):
    """Run the dense reverse encode scan as a Pallas kernel.

    state: [B, lanes] u32 initial states; idx/sym/act_rows:
    [rows, B, lanes] in REVERSE (LIFO) order, exactly as
    rans_tpu.encode_groups prepares them.  Returns (state, words_o
    [rows, B, lanes] i32, emit_o [rows, B, lanes] bool) — the scan_out
    compaction in encode_groups turns these into per-lane streams.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, lanes = state.shape
    rows = idx_rows.shape[0]
    r = b * lanes
    assert r % 128 == 0, (b, lanes)
    rs, rl = r // 128, 128
    aug = _aug_np(small)
    n_rows, kk = aug.shape[0], aug.shape[1] - 2

    idx3 = idx_rows.reshape(rows, rs, rl)
    sym3 = sym_rows.reshape(rows, rs, rl)
    act3 = act_rows.astype(jnp.int32).reshape(rows, rs, rl)

    step, lane, aug_s, _ = _specs(rows, rs, rl, n_rows, kk)
    kern = functools.partial(_encode_kernel, n_rows=n_rows, k=kk)
    words_o, emit_o, st_f = pl.pallas_call(
        kern,
        grid=(rows,),
        in_specs=[step, step, step, aug_s, lane],
        out_specs=[step, step, lane],
        out_shape=[
            jax.ShapeDtypeStruct((rows, rs, rl), jnp.int32),
            jax.ShapeDtypeStruct((rows, rs, rl), jnp.int32),
            jax.ShapeDtypeStruct((rs, rl), jnp.uint32),
        ],
        scratch_shapes=[pltpu.VMEM((rs, rl), jnp.uint32)],
        interpret=_interpret(),
    )(idx3, sym3, act3, jnp.asarray(aug), state.reshape(rs, rl))
    return (
        st_f.reshape(b, lanes),
        words_o.reshape(rows, b, lanes),
        (emit_o != 0).reshape(rows, b, lanes),
    )
