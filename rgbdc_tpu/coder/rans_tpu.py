"""On-device (JAX/XLA) lockstep decoder for the lane-split rans32 format.

This is the TPU consumer of ``coder/csrc/rans.cpp:rans32_lanes_encode``:
every lane is an independent 32-bit rANS stream (16-bit renorm words,
16-bit quantized CDFs, 4-bit bypass escapes — the reference coder's
probability model, rans_interface.cpp:119-163/236-244), so a whole row of
``lanes`` symbols decodes as ONE vectorized step with no cross-lane word
ordering.  A coding group of n symbols is ceil(n/lanes) `lax.scan` steps;
per-lane state and word position carry across groups, which is exactly the
shape of the phase-serial checkerboard schedule (SURVEY §3.5).

Everything here is jit-compatible and gather-based (XLA lowers jnp.take /
take_along_axis fine on TPU; it is only Pallas/Mosaic that cannot — see
CLAUDE.md).  Symbol search is a fixed-trip lockstep binary search over the
CDF row (the dense-compare alternative would stream the full 3k-wide
Gaussian rows from HBM every step).

Wire-format invariants (must match the C encoder/decoder bit for bit):
  * state advance   x = freq*(x>>16) + (x&0xffff) - start, renorm one
    16-bit word when x < 2^16;
  * bypass get_bits val = x & 0xf; x >>= 4; same renorm;
  * escape value    raw coded least-significant-chunk first, count chain
    of 4-bit chunks terminated by a chunk < 15.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..entropy.tables import CdfTable

RANS32_L = jnp.uint32(1 << 16)
MASK16 = jnp.uint32(0xFFFF)

DEFAULT_LANES = 128


class DeviceCdfTable(NamedTuple):
    """CdfTable mirrored on device.

    Two symbol-lookup strategies:
      * binary search over cdf_flat (search_steps gathers) — memory-light,
        used by tests and as the non-LUT fallback;
      * a packed 16-bit-cum LUT (lut=...): lut[idx*65536 + cum] is a PAIR
        of uint32 fetched with ONE 2-wide sliced gather — TPU gathers are
        descriptor-bound (a 2-wide slice costs the same as 1 element, see
        docs/PERF.md), so the whole symbol lookup including escape flag
        and offset folding is a single descriptor per symbol:
          word0 = esc<<31 | (offset & 0x7fff)<<16 | value16
                  (value16 = s+offset, or maxv+offset on escape rows)
          word1 = freq<<16 | start
        The LUT costs 8 bytes x n_rows x 65536 of HBM (134 MB at 256 rows)
        and must be passed to jitted functions as an ARGUMENT — a closure
        capture would inline it into the HLO (and re-upload it through the
        axon tunnel on every compile).
    """

    cdf_flat: jnp.ndarray  # [n * stride] int32
    cdf_length: jnp.ndarray  # [n] int32
    offset: jnp.ndarray  # [n] int32
    stride: int
    search_steps: int  # ceil(log2(max cdf_length)) binary-search trips


def device_table(table: CdfTable) -> DeviceCdfTable:
    stride = int(table.cdf.shape[1])
    max_len = int(table.cdf_length.max())
    steps = max(1, int(np.ceil(np.log2(max(max_len, 2)))))
    return DeviceCdfTable(
        cdf_flat=jnp.asarray(table.cdf.reshape(-1), dtype=jnp.int32),
        cdf_length=jnp.asarray(table.cdf_length, dtype=jnp.int32),
        offset=jnp.asarray(table.offset, dtype=jnp.int32),
        stride=stride,
        search_steps=steps,
    )


def build_lut(table: CdfTable) -> np.ndarray:
    """[n * 65536, 2] uint32 packed decode LUT (see DeviceCdfTable)."""
    n = table.cdf.shape[0]
    lut = np.empty((n, 1 << 16, 2), np.uint32)
    cums = np.arange(1 << 16, dtype=np.int32)
    for r in range(n):
        ln = int(table.cdf_length[r])
        row = table.cdf[r, :ln].astype(np.int64)
        off = int(table.offset[r])
        maxv = ln - 2
        assert -(1 << 14) <= off < (1 << 14), "offset exceeds 15-bit packing"
        # largest s with row[s] <= cum (C find_symbol)
        s = np.clip(np.searchsorted(row, cums, side="right") - 1, 0, maxv)
        esc = s == maxv
        value16 = np.where(esc, maxv + off, s + off)
        assert np.abs(value16).max() < (1 << 15), "value exceeds int16 packing"
        off_u = np.uint32(off & 0x7FFF)
        lut[r, :, 0] = (
            (esc.astype(np.uint32) << 31)
            | (off_u << 16)
            | (value16.astype(np.int32).view(np.uint32) & 0xFFFF)
        )
        start = row[s].astype(np.uint32)
        freq = (row[s + 1] - row[s]).astype(np.uint32)
        lut[r, :, 1] = (freq << 16) | start
    return lut.reshape(n * (1 << 16), 2)


def combine_tables(*tables: CdfTable) -> CdfTable:
    """Concatenate CDF tables into one (rows of table k are offset by the
    total row count of tables <k).  Lets a single stream interleave groups
    coded with different models (e.g. the EB-coded z followed by the
    GC-coded y slices) — index = row_base[k] + model_index."""
    stride = max(t.cdf.shape[1] for t in tables)
    rows = []
    for t in tables:
        pad = stride - t.cdf.shape[1]
        rows.append(np.pad(t.cdf, ((0, 0), (0, pad))))
    return CdfTable(
        cdf=np.concatenate(rows, axis=0),
        cdf_length=np.concatenate([t.cdf_length for t in tables]),
        offset=np.concatenate([t.offset for t in tables]),
    )


class LaneState(NamedTuple):
    """Per-stream decode carry: [..., lanes] uint32 states, int32 word
    positions into a [..., lanes, W] uint16 word matrix, and int32 nibble
    cursors into a [..., lanes, B] packed bypass-nibble matrix (v2 wire
    format: 4 nibbles per u16, least-significant first)."""

    state: jnp.ndarray
    pos: jnp.ndarray
    nib: jnp.ndarray


def init_lane_state(states: jnp.ndarray) -> LaneState:
    return LaneState(
        state=states.astype(jnp.uint32),
        pos=jnp.zeros(states.shape, jnp.int32),
        nib=jnp.zeros(states.shape, jnp.int32),
    )


def _fetch_word(words, pos):
    w = jnp.take_along_axis(
        words, jnp.clip(pos, 0, words.shape[-1] - 1)[..., None], axis=-1
    )[..., 0]
    return w.astype(jnp.uint32)


def _renorm(state, pos, words, mask):
    need = mask & (state < RANS32_L)
    w = _fetch_word(words, pos)
    state = jnp.where(need, (state << 16) | w, state)
    pos = pos + need.astype(jnp.int32)
    return state, pos


def _get_nibble(byp, nib, mask):
    """Pop one 4-bit bypass chunk per masked lane from the packed nibble
    matrix (v2 format); returns (val i32, nib)."""
    w = jnp.take_along_axis(
        byp, jnp.clip(nib >> 2, 0, byp.shape[-1] - 1)[..., None], axis=-1
    )[..., 0].astype(jnp.int32)
    val = (w >> (4 * (nib & 3))) & 0xF
    val = jnp.where(mask, val, 0)
    nib = nib + mask.astype(jnp.int32)
    return val, nib


def _find_symbol(tbl: DeviceCdfTable, idx, cum, length):
    """Lockstep binary search: largest s with cdf[s] <= cum (C find_symbol)."""
    base = idx * tbl.stride
    lo = jnp.zeros_like(idx)
    hi = length - 1

    def body(_, lh):
        lo, hi = lh
        live = (hi - lo) > 1
        mid = (lo + hi) >> 1
        cmid = jnp.take(tbl.cdf_flat, base + mid)
        go_lo = live & (cmid <= cum)
        lo = jnp.where(go_lo, mid, lo)
        hi = jnp.where(live & ~go_lo, mid, hi)
        return lo, hi

    lo, _ = jax.lax.fori_loop(0, tbl.search_steps, body, (lo, hi))
    return lo


def _sext(x, bits):
    """Sign-extend the low `bits` of an int32."""
    m = jnp.int32(1 << (bits - 1))
    return (x ^ m) - m


def _decode_row(carry: LaneState, words, byp, idx_row, act, tbl):
    """Decode one lockstep row: every active lane pops one symbol.

    tbl is either a DeviceCdfTable (binary-search mode) or a packed
    [n*65536, 2] uint32 LUT array (one-descriptor mode, see build_lut)."""
    state, pos, nib = carry.state, carry.pos, carry.nib
    idx_row = jnp.where(act, idx_row, 0)  # keep gathers in-bounds
    cum = (state & MASK16).astype(jnp.int32)

    lut_mode = not isinstance(tbl, DeviceCdfTable)
    if lut_mode:
        pos16 = (idx_row << 16) | cum
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(idx_row.ndim,),
            collapsed_slice_dims=(0,),
            start_index_map=(0,),
        )
        pair = jax.lax.gather(tbl, pos16[..., None], dn, slice_sizes=(1, 2))
        w0 = pair[..., 0]
        w1 = pair[..., 1]
        esc_flag = (w0 >> 31).astype(bool)
        value16 = _sext((w0 & MASK16).astype(jnp.int32), 16)  # s+off | maxv+off
        offset = _sext(((w0 >> 16) & jnp.uint32(0x7FFF)).astype(jnp.int32), 15)
        start = (w1 & MASK16).astype(jnp.int32)
        freq = w1 >> 16
        s = value16  # already offset-folded (shape/dtype anchor for n_byp)
    else:
        length = jnp.take(tbl.cdf_length, idx_row)
        maxv = length - 2
        s = _find_symbol(tbl, idx_row, cum, length)
        row_base = idx_row * tbl.stride  # NOT `base`: that's the buffer param
        start = jnp.take(tbl.cdf_flat, row_base + s)
        freq = (jnp.take(tbl.cdf_flat, row_base + s + 1) - start).astype(jnp.uint32)
        esc_flag = s == maxv
        offset = jnp.take(tbl.offset, idx_row)

    adv = (state >> 16) * freq + cum.astype(jnp.uint32) - start.astype(jnp.uint32)
    adv, npos = _renorm(adv, pos, words, act)
    state = jnp.where(act, adv, state)
    pos = jnp.where(act, npos, pos)

    # --- escape path (rare): count nibble, then LSB-first 4-bit chunks ------
    # v2 wire format: bypass chunks come from the per-lane nibble stream,
    # NOT the main word stream (so main renorm stays <=1 word/symbol).
    # ONE while_loop runs a per-lane state machine (count nibble first,
    # then chunks): a single cross-lane any() per escape-free row.  int16
    # wire symbols bound raw_val < 2^18, so the count chain is always a
    # single nibble (a chain needs n_bypass >= 15) and iterations <= 7.
    # Do NOT replace the while_loop with lax.cond: XLA select-converts the
    # cond and runs the nibble gathers on EVERY row (measured 2x slower).
    esc = act & esc_flag
    neg1 = jnp.full(s.shape, -1, jnp.int32)

    def e_cond(c):
        return jnp.any(c[4])

    def e_body(c):
        nib, raw, n_byp, j, live = c
        val, nib = _get_nibble(byp, nib, live)
        first = n_byp < 0
        chunk = live & ~first
        raw = raw | jnp.where(
            chunk, val.astype(jnp.uint32) << (4 * jnp.maximum(j, 0)).astype(jnp.uint32), 0
        )
        j = jnp.where(chunk, j + 1, j)
        n_byp = jnp.where(live & first, val, n_byp)
        live = live & (j < n_byp)
        return nib, raw, n_byp, j, live

    nib, raw, _, _, _ = jax.lax.while_loop(
        e_cond, e_body,
        (nib, jnp.zeros(s.shape, jnp.uint32), neg1, jnp.zeros(s.shape, jnp.int32), esc),
    )

    v = (raw >> 1).astype(jnp.int32)
    if lut_mode:
        esc_value = jnp.where((raw & 1).astype(bool), -v - 1 + offset, v + value16)
        value = jnp.where(esc, esc_value, value16)
    else:
        esc_value = jnp.where((raw & 1).astype(bool), -v - 1, v + maxv)
        value = jnp.where(esc, esc_value, s) + offset
    sym = jnp.where(act, value, 0)
    return LaneState(state, pos, nib), sym


def decode_group(
    carry: LaneState,
    words: jnp.ndarray,
    byp: jnp.ndarray,
    indexes: jnp.ndarray,
    tbl: DeviceCdfTable,
    lanes: int = DEFAULT_LANES,
):
    """Decode one coding group of indexes [..., n] -> symbols [..., n] i32.

    Lane assignment restarts per group (symbol j -> lane j % lanes), exactly
    mirroring rans32_lanes_encode.  ``words`` is the [..., lanes, W] uint16
    word matrix from ``lanes_split``; the carry threads across consecutive
    decode_group calls on the same stream."""
    lead = indexes.shape[:-1]
    n = indexes.shape[-1]
    steps = -(-n // lanes)
    pad = steps * lanes - n
    idx_p = jnp.pad(indexes.astype(jnp.int32), [(0, 0)] * len(lead) + [(0, pad)])
    # [steps, ..., lanes]
    perm = (len(lead),) + tuple(range(len(lead))) + (len(lead) + 1,)
    idx_rows = idx_p.reshape(lead + (steps, lanes)).transpose(perm)
    valid = (
        jnp.arange(steps * lanes, dtype=jnp.int32).reshape(steps, lanes) < n
    )
    act_rows = jnp.broadcast_to(
        valid.reshape((steps,) + (1,) * len(lead) + (lanes,)),
        (steps,) + lead + (lanes,),
    )

    def step(c, xs):
        idx_row, act = xs
        return _decode_row(c, words, byp, idx_row, act, tbl)

    carry, syms = jax.lax.scan(step, carry, (idx_rows, act_rows))
    inv = tuple(range(1, len(lead) + 1)) + (0, len(lead) + 1)
    syms = syms.transpose(inv).reshape(lead + (steps * lanes,))[..., :n]
    return carry, syms
