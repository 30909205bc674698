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


def build_small_tables(table: CdfTable, k_cap: int = 66, r_max: int = 64):
    """Dense-CDF tables for the small-sigma decode fast path.

    TPU gathers from HBM cost ~14 ns/element regardless of table size
    (measured, docs/PERF.md round 3); the packed LUT therefore floors the
    scan at ~2 gather-elements/symbol.  But the NARROW rows — small-sigma
    Gaussian rows, where a trained codec's predictions concentrate (the
    bench checkpoint puts >99.9% of symbols in rows 0..21) — have few
    symbols, so the whole row fits a dense [r_small, k_cap] i32 matrix
    that rides into the program as a ~17 KB CONSTANT.  A one-hot matmul
    (MXU) materializes each lane's row and the symbol search becomes pure
    vector compares: ZERO gather elements for small rows.

    Returns (cdf [r, k_cap] f32 with +inf-like padding, offset [r] f32,
    maxv [r] f32, r) for the longest prefix of rows with cdf_length <=
    k_cap (capped at r_max), or None if fewer than 4 rows qualify."""
    lens = np.asarray(table.cdf_length)
    r = 0
    while r < min(r_max, lens.size) and lens[r] <= k_cap:
        r += 1
    if r < 4:
        return None
    pad = np.float32(1 << 20)  # > any 16-bit cdf value, exact in f32
    cdf = np.full((r, k_cap), pad, np.float32)
    for i in range(r):
        cdf[i, : lens[i]] = table.cdf[i, : lens[i]].astype(np.float32)
    off = np.asarray(table.offset[:r], np.float32)
    maxv = (lens[:r] - 2).astype(np.float32)
    return cdf, off, maxv, r


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


def cap_table(table: CdfTable, max_len: int = 130) -> CdfTable:
    """Cap every CDF row's alphabet at ``max_len`` entries (length incl. the
    escape interval and the 2^16 terminator).

    Rows longer than max_len keep a max_len-2-symbol window CENTERED on the
    row's zero value (symbol -offset — gaussian rows are symmetric around
    it, so the kept mass is maximal) and fold both clipped tails — plus the
    old escape mass — into a new escape interval (freq = 2^16 - kept > 0
    always; integer window subtraction keeps the CDF exact).  The row's
    offset shifts by the window start so downstream symbol<->value math is
    unchanged, and out-of-range values ride the EXISTING escape/bypass
    machinery on either side (raw = 2*(-v)-1 left / 2*(v-maxv) right, both
    < 2^18 for int16 wire symbols).

    Why: with every row at most max_len wide, the dense one-hot-matmul
    lookup (build_small_tables) covers ALL rows of the table — the packed
    64k-entry LUTs (134 MB HBM each) and the big-row gather while_loops
    drop out of both scan bodies entirely (RGBDC_DENSE128 serving mode,
    models/codec.py).  Rate cost is bounded by the clipped tail mass: a
    trained codec's residuals sit far inside +-(max_len/2) of their row
    mean (calib checkpoint: max |residual| = 9), so real-content streams
    are unchanged or within noise; pathological (untrained) content just
    escapes more, exactly as it already does on narrow rows."""
    lens = np.asarray(table.cdf_length)
    if int(lens.max()) <= max_len:
        return table
    new_lens = np.minimum(lens, max_len)
    stride = int(new_lens.max())
    cdf = np.zeros((table.cdf.shape[0], stride), np.int32)
    offset = np.array(table.offset, copy=True)
    keep = max_len - 2  # real symbols kept per capped row
    for r in range(len(lens)):
        ln = int(lens[r])
        if ln <= max_len:
            cdf[r, :ln] = table.cdf[r, :ln]
            continue
        old_maxv = ln - 2
        mid = int(np.clip(-int(offset[r]), 0, old_maxv - 1))
        c0 = int(np.clip(mid - keep // 2, 0, old_maxv - keep))
        win = table.cdf[r, c0 : c0 + keep + 1].astype(np.int64)
        cdf[r, : keep + 1] = (win - win[0]).astype(np.int32)
        cdf[r, keep + 1] = 1 << 16  # escape absorbs both tails
        offset[r] = int(offset[r]) + c0
    return CdfTable(cdf=cdf, cdf_length=new_lens, offset=offset)


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


def _fetch_word(words, pos, onehot: bool = False):
    if words.ndim == pos.ndim:
        # flat layout [..., Wtotal]: pos carries each lane's base offset
        # (init_lane_state was seeded with the per-lane word bases)
        w = jnp.take_along_axis(
            words, jnp.clip(pos, 0, words.shape[-1] - 1), axis=-1
        )
        return w.astype(jnp.uint32)
    posc = jnp.clip(pos, 0, words.shape[-1] - 1)
    if onehot:
        # Compare-select-reduce over the (static, small) W columns instead
        # of a gather: TPU gathers cost ~11 ns per ELEMENT (descriptor-
        # bound) and this fetch was ~90% of decode-scan device time at
        # bench shapes (~88 us/row for 8192 lanes; tools/
        # prof_decflow_trace.py).  The one-hot reduce runs at VPU vector
        # rate and streams the whole [.., lanes, W] words panel per row
        # (2 MB at WMAX=128 ~ 3 us of HBM traffic).  Only sensible with a
        # tight word cap — serve with RGBDC_WMAX=128.
        cols = jnp.arange(words.shape[-1], dtype=posc.dtype)
        hit = cols == posc[..., None]
        return jnp.max(jnp.where(hit, words, 0), axis=-1).astype(jnp.uint32)
    w = jnp.take_along_axis(words, posc[..., None], axis=-1)[..., 0]
    return w.astype(jnp.uint32)


def _renorm(state, pos, words, mask, onehot: bool = False):
    need = mask & (state < RANS32_L)
    w = _fetch_word(words, pos, onehot)
    state = jnp.where(need, (state << 16) | w, state)
    pos = pos + need.astype(jnp.int32)
    return state, pos


def _get_nibble(byp, nib, mask):
    """Pop one 4-bit bypass chunk per masked lane from the packed nibble
    matrix (v2 format); returns (val i32, nib).  With a flat byp layout
    (ndim == nib.ndim) the cursor carries the lane's nibble base (4x its
    u16-word base)."""
    if byp.ndim == nib.ndim:
        w = jnp.take_along_axis(
            byp, jnp.clip(nib >> 2, 0, byp.shape[-1] - 1), axis=-1
        ).astype(jnp.int32)
    else:
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


def _decode_row(carry: LaneState, words, byp, idx_row, act, tbl, small=None,
                has_big=None, escfix=False, wfetch1h=False):
    """Decode one lockstep row: every active lane pops one symbol.

    tbl is either a DeviceCdfTable (binary-search mode) or a packed
    [n*65536, 2] uint32 LUT array (one-descriptor mode, see build_lut).
    ``small`` (build_small_tables output) adds the gather-free fast path
    for narrow CDF rows: one-hot matmul over an in-program dense CDF +
    vector compares; the LUT gather then runs inside a while_loop only on
    rows where some lane's index falls outside the small prefix (all-z
    rows, or rare high-sigma y elements — a trained codec's y rows skip
    it almost always).  Do NOT turn that while_loop into lax.cond: XLA
    select-converts conds inside scans and the gather would run on every
    row (docs/PERF.md)."""
    state, pos, nib = carry.state, carry.pos, carry.nib
    idx_row = jnp.where(act, idx_row, 0)  # keep gathers in-bounds
    cum = (state & MASK16).astype(jnp.int32)

    lut_mode = not isinstance(tbl, DeviceCdfTable)
    if lut_mode and small is not None:
        cdf_s, off_s, maxv_s, r_small = small
        is_small = idx_row < r_small
        # one-hot row materialization: [*, r] @ [r, k+2] on the MXU; 16-bit
        # cdf values are exact in f32, one-hot products/sums are exact.
        # The per-row offset and maxv ride as two EXTRA COLUMNS of the same
        # matmul instead of two separate one-hot reductions.
        oh = (idx_row[..., None] == jnp.arange(r_small, dtype=jnp.int32)).astype(
            jnp.float32
        )
        aug = np.concatenate(
            [np.asarray(cdf_s), np.asarray(off_s)[:, None],
             np.asarray(maxv_s)[:, None]], axis=1,
        )
        rowx = jax.lax.dot_general(
            oh, jnp.asarray(aug),
            (((oh.ndim - 1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )  # [*, k_cap + 2]
        row = rowx[..., :-2]
        off_sm = rowx[..., -2]
        maxv_sm = rowx[..., -1]
        cumf = cum.astype(jnp.float32)[..., None]
        # ONE compare mask gives all three quantities (the row is strictly
        # increasing, 16-bit values exact in f32): the symbol is the count
        # of cdf entries <= cum, its start the masked max, the next cdf
        # value (-> freq) the min of the unmasked rest.  The pad value
        # (2^20) never wins the min: row[len-1] = 65536 > any 16-bit cum.
        le = row <= cumf  # [*, k_cap]
        s_sm = jnp.sum(le[..., 1:].astype(jnp.int32), axis=-1)
        start_sm = jnp.max(jnp.where(le, row, 0.0), axis=-1)
        nxt_sm = jnp.min(jnp.where(le, jnp.float32(1 << 20), row), axis=-1)
        freq_sm = nxt_sm - start_sm
        esc_sm = s_sm.astype(jnp.float32) == maxv_sm
        value_sm = jnp.where(esc_sm, maxv_sm, s_sm.astype(jnp.float32)) + off_sm

        # big-row LUT gather, skipped entirely when every active lane is
        # small (ONE while_loop iteration otherwise)
        big = act & ~is_small
        zeros_u = jnp.zeros(idx_row.shape, jnp.uint32)

        def g_cond(c):
            return c[0]

        def g_body(c):
            _, _, _ = c[0], c[1], c[2]
            pos16 = (jnp.where(big, idx_row, 0) << 16) | cum
            dn = jax.lax.GatherDimensionNumbers(
                offset_dims=(idx_row.ndim,),
                collapsed_slice_dims=(0,),
                start_index_map=(0,),
            )
            pair = jax.lax.gather(tbl, pos16[..., None], dn, slice_sizes=(1, 2))
            return (jnp.asarray(False), pair[..., 0], pair[..., 1])

        # the trigger is precomputable from the (input) index rows — when
        # the caller passes it, the per-row cross-lane any() reduction
        # drops out of the scan body entirely
        trig = jnp.any(big) if has_big is None else has_big
        _, w0, w1 = jax.lax.while_loop(
            g_cond, g_body, (trig, zeros_u, zeros_u)
        )
        esc_big = (w0 >> 31).astype(bool)
        value_big = _sext((w0 & MASK16).astype(jnp.int32), 16)
        off_big = _sext(((w0 >> 16) & jnp.uint32(0x7FFF)).astype(jnp.int32), 15)
        start_big = (w1 & MASK16).astype(jnp.int32)
        freq_big = w1 >> 16

        esc_flag = jnp.where(is_small, esc_sm, esc_big)
        value16 = jnp.where(is_small, value_sm.astype(jnp.int32), value_big)
        offset = jnp.where(is_small, off_sm.astype(jnp.int32), off_big)
        start = jnp.where(is_small, start_sm.astype(jnp.int32), start_big)
        freq = jnp.where(
            is_small, freq_sm.astype(jnp.uint32), freq_big
        )
        s = value16
    elif lut_mode:
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
    adv, npos = _renorm(adv, pos, words, act, wfetch1h)
    state = jnp.where(act, adv, state)
    pos = jnp.where(act, npos, pos)

    esc = act & esc_flag
    if escfix:
        # escape-fixup mode (decode_group escfix=...): bypass nibbles never
        # touch the rANS state — the state advance above already used the
        # escape row's start/freq — so the scan body carries NO escape
        # machinery at all (no nibble pops, no data-dependent cross-lane
        # any() + scalar sync per row).  Escaped lanes return a placeholder;
        # _escape_fixup patches their VALUES after the scan from the esc
        # bitmap, in escape-ordinal order (max escapes/lane iterations
        # instead of one while_loop in every row).
        value = value16 if lut_mode else s + offset
        sym = jnp.where(act, value, 0)
        return LaneState(state, pos, nib), (sym, esc)

    # --- escape path (rare): count nibble, then LSB-first 4-bit chunks ------
    # v2 wire format: bypass chunks come from the per-lane nibble stream,
    # NOT the main word stream (so main renorm stays <=1 word/symbol).
    # ONE while_loop runs a per-lane state machine (count nibble first,
    # then chunks): a single cross-lane any() per escape-free row.  int16
    # wire symbols bound raw_val < 2^18, so the count chain is always a
    # single nibble (a chain needs n_bypass >= 15) and iterations <= 7.
    # Do NOT replace the while_loop with lax.cond: XLA select-converts the
    # cond and runs the nibble gathers on EVERY row (measured 2x slower).
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


def _escape_fixup(nib, byp, syms_rows, esc_rows, idx_rows, off_arr, maxv_arr):
    """Reconstruct escape VALUES after an escfix-mode decode scan.

    syms_rows/esc_rows/idx_rows are the scan's [steps, ..., lanes] outputs
    (placeholder symbols, escape bitmap, input CDF indexes).  Per lane,
    escapes consume its bypass-nibble stream in row order, so iterating
    over the escape ORDINAL e (cross-lane max escapes per lane — 0-3 on
    trained streams, vs ~830 rows) replays exactly the consumption order
    the in-scan escape loop would have used: pop the count nibble, then up
    to 5 LSB-first 4-bit chunks (int16 wire symbols bound raw < 2^18), and
    patch the value at the escape's row.  Returns (nib, syms_rows)."""
    steps = esc_rows.shape[0]
    esc_i = esc_rows.astype(jnp.int32)
    ordinal = jnp.cumsum(esc_i, axis=0)  # 1-based at escape rows
    emax = jnp.max(ordinal[-1])
    rows_ix = jnp.arange(steps, dtype=jnp.int32).reshape(
        (steps,) + (1,) * (esc_rows.ndim - 1)
    )

    def f_cond(c):
        return c[0] < emax

    def f_body(c):
        e, nib, syms = c
        hit = esc_rows & (ordinal == (e + 1))  # [steps, ..., lanes]
        has = jnp.any(hit, axis=0)  # [..., lanes]
        r_e = jnp.sum(jnp.where(hit, rows_ix, 0), axis=0)
        idx_e = jnp.take_along_axis(idx_rows, r_e[None], axis=0)[0]
        off = jnp.take(off_arr, idx_e)
        maxv = jnp.take(maxv_arr, idx_e)
        cnt, nib = _get_nibble(byp, nib, has)
        raw = jnp.zeros(has.shape, jnp.uint32)
        for j in range(5):  # raw < 2^18 -> at most 5 chunks
            live = has & (j < cnt)
            val, nib = _get_nibble(byp, nib, live)
            raw = raw | jnp.where(live, val.astype(jnp.uint32) << (4 * j), 0)
        v = (raw >> 1).astype(jnp.int32)
        esc_value = jnp.where((raw & 1).astype(bool), -v - 1 + off, v + maxv + off)
        syms = jnp.where(hit, esc_value[None], syms)
        return e + 1, nib, syms

    _, nib, syms_rows = jax.lax.while_loop(
        f_cond, f_body, (jnp.int32(0), nib, syms_rows)
    )
    return nib, syms_rows


def escape_fixup_tables(table: CdfTable):
    """(offset, maxv) device arrays for decode_group's escfix mode."""
    return (
        jnp.asarray(table.offset, jnp.int32),
        jnp.asarray(table.cdf_length, jnp.int32) - 2,
    )


def decode_group(
    carry: LaneState,
    words: jnp.ndarray,
    byp: jnp.ndarray,
    indexes: jnp.ndarray,
    tbl: DeviceCdfTable,
    lanes: int = DEFAULT_LANES,
    small=None,
    escfix=None,
    pallas: bool = False,
    unroll: int = 1,
    wfetch1h: bool = False,
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

    if small is not None and not isinstance(tbl, DeviceCdfTable):
        # precompute the per-row big-row trigger from the (input) indexes
        # so the scan body carries no cross-lane any() for it
        r_small = small[3]
        hb_rows = jnp.any(
            (idx_rows >= r_small) & act_rows,
            axis=tuple(range(1, idx_rows.ndim)),
        )
    else:
        hb_rows = jnp.zeros((steps,), bool)  # unused

    if pallas:
        # Pallas backend (rans_pallas.decode_rows): dense-total tables +
        # escfix only — the kernel has no LUT gather and no escape
        # machinery.  The escape fixup below is shared with the XLA path.
        from . import rans_pallas

        assert small is not None and escfix is not None
        assert words.ndim == len(lead) + 2, "pallas needs [.., lanes, W]"
        flat = lambda a: a.reshape((-1,) + a.shape[len(lead):])
        st_f, pos_f, syms, esc_rows = rans_pallas.decode_rows(
            flat(carry.state), flat(carry.pos),
            flat(words),
            idx_rows.reshape((steps, -1, lanes)),
            act_rows.reshape((steps, -1, lanes)),
            small,
        )
        unflat = lambda a: a.reshape(lead + (lanes,))
        syms = syms.reshape((steps,) + lead + (lanes,))
        esc_rows = esc_rows.reshape((steps,) + lead + (lanes,))
        off_arr, maxv_arr = escfix
        nib, syms = _escape_fixup(
            carry.nib, byp, syms, esc_rows, idx_rows, off_arr, maxv_arr
        )
        carry = LaneState(unflat(st_f), unflat(pos_f), nib)
        inv = tuple(range(1, len(lead) + 1)) + (0, len(lead) + 1)
        syms = syms.transpose(inv).reshape(lead + (steps * lanes,))[..., :n]
        return carry, syms

    k = max(int(unroll), 1)
    if k > 1:
        # process k consecutive rows per scan step (mirrors the encoder's
        # unroll): same row order and carry math, so bit-exact by
        # construction; pad with inactive rows AT THE END (forward scan —
        # act=False rows are no-ops and their ys are stripped below)
        rpad = (-steps) % k
        if rpad:
            idx_rows = jnp.concatenate(
                [idx_rows, jnp.zeros((rpad,) + idx_rows.shape[1:], idx_rows.dtype)]
            )
            act_rows = jnp.concatenate(
                [act_rows, jnp.zeros((rpad,) + act_rows.shape[1:], bool)]
            )
            hb_rows = jnp.concatenate([hb_rows, jnp.zeros((rpad,), bool)])
        nsteps = (steps + rpad) // k
        idx_k = idx_rows.reshape((nsteps, k) + idx_rows.shape[1:])
        act_k = act_rows.reshape((nsteps, k) + act_rows.shape[1:])
        hb_k = hb_rows.reshape(nsteps, k)

        def stepk(c, xs):
            i_k, a_k, h_k = xs
            ys = []
            for j in range(k):
                c, y = _decode_row(
                    c, words, byp, i_k[j], a_k[j], tbl, small=small,
                    has_big=(h_k[j] if small is not None else None),
                    escfix=escfix is not None, wfetch1h=wfetch1h,
                )
                ys.append(y)
            if escfix is not None:
                return c, (jnp.stack([y[0] for y in ys]),
                           jnp.stack([y[1] for y in ys]))
            return c, jnp.stack(ys)

        carry, ys = jax.lax.scan(stepk, carry, (idx_k, act_k, hb_k))
        unflat = lambda a: a.reshape((nsteps * k,) + a.shape[2:])[:steps]
        ys = (
            (unflat(ys[0]), unflat(ys[1])) if escfix is not None else unflat(ys)
        )
        idx_rows = idx_rows[:steps]
    else:
        def step(c, xs):
            idx_row, act, hb = xs
            return _decode_row(
                c, words, byp, idx_row, act, tbl, small=small,
                has_big=(hb if small is not None else None),
                escfix=escfix is not None, wfetch1h=wfetch1h,
            )

        carry, ys = jax.lax.scan(step, carry, (idx_rows, act_rows, hb_rows))
    if escfix is not None:
        syms, esc_rows = ys
        off_arr, maxv_arr = escfix
        nib, syms = _escape_fixup(
            carry.nib, byp, syms, esc_rows, idx_rows, off_arr, maxv_arr
        )
        carry = LaneState(carry.state, carry.pos, nib)
    else:
        syms = ys
    inv = tuple(range(1, len(lead) + 1)) + (0, len(lead) + 1)
    syms = syms.transpose(inv).reshape(lead + (steps * lanes,))[..., :n]
    return carry, syms


# -- on-device lane ENCODER ---------------------------------------------------
#
# The v2 wire format's main stream is pure rANS (escape bypass nibbles live
# in separate per-lane FIFO streams), so encoding is a reverse lockstep
# scan: per row each lane (1) looks up (start, freq) for its symbol —
# escapes clamp into the table's escape row — (2) conditionally emits one
# 16-bit word (LIFO renorm), (3) advances x = (x/freq)<<16 + x%freq + start.
# Escape NIBBLE streams are assembled on the HOST from a compact sideband
# (escapes are data-independent of the rANS state, so their positions are
# known without running the scan).  Only ~stream-sized bytes cross the
# link; the C encoder remains the compat-container / fallback path.


def build_enc_lut(table: CdfTable) -> np.ndarray:
    """[n * 65536] uint32 encode LUT: (freq << 16) | start for symbol value
    s+32768 under row n; out-of-range values map to the escape row."""
    n = table.cdf.shape[0]
    lut = np.empty((n, 1 << 16), np.uint32)
    vals = np.arange(-32768, 32768, dtype=np.int64)
    for r in range(n):
        ln = int(table.cdf_length[r])
        row = table.cdf[r, :ln].astype(np.int64)
        off = int(table.offset[r])
        maxv = ln - 2
        value = vals - off
        # out-of-range on EITHER side codes the escape symbol (row maxv)
        v = np.where((value >= 0) & (value < maxv), value, maxv)
        start = row[v].astype(np.uint32)
        freq = (row[v + 1] - row[v]).astype(np.uint32)
        lut[r] = (freq << 16) | start
    return lut.reshape(-1)


def escape_chunks(sym: np.ndarray, idx: np.ndarray, table: CdfTable):
    """Host helper: per-symbol escape nibble sequences (count nibble chain +
    LSB-first 4-bit chunks), empty for in-range symbols.  numpy, vectorized
    detection + a python loop only over the (sparse) escapes."""
    off = table.offset[idx]
    maxv = table.cdf_length[idx] - 2
    value = sym.astype(np.int64) - off
    esc = (value < 0) | (value >= maxv)
    out = []
    for i in np.nonzero(esc)[0]:
        v = int(value[i])
        raw = 2 * (-v) - 1 if v < 0 else 2 * (v - int(maxv[i]))
        n_byp = 0
        while (raw >> (n_byp * 4)) != 0:
            n_byp += 1
        # The JAX decoder (_decode_row e_body) reads the FIRST nibble as the
        # full count — it does not follow the C coder's 15-continuation
        # chains.  int16 wire symbols bound raw < 2^18 so n_byp <= 5 always;
        # fail loudly rather than desync if a table/offset combination ever
        # violates that invariant.
        assert n_byp < 15, (
            f"escape raw value {raw:#x} needs {n_byp} bypass nibbles >= 15: "
            "count chain unsupported by the on-device decoder"
        )
        nibs = [n_byp]
        for j in range(n_byp):
            nibs.append((raw >> (4 * j)) & 0xF)
        out.append((int(i), nibs))
    return out


def escape_chunks_at(pos: np.ndarray, sym: np.ndarray, idx: np.ndarray,
                     table: CdfTable):
    """escape_chunks for a PRE-COMPACTED escape sideband: ``pos`` are the
    global coding positions of the escapes (ascending), ``sym``/``idx``
    their wire symbols and CDF rows (the device encoder's esc compaction,
    models/codec.py _device_encode_setup).  Every entry IS an escape."""
    out = []
    for k in range(pos.size):
        i = int(idx[k])
        off = int(table.offset[i])
        maxv = int(table.cdf_length[i]) - 2
        v = int(sym[k]) - off
        raw = 2 * (-v) - 1 if v < 0 else 2 * (v - maxv)
        n_byp = 0
        while (raw >> (n_byp * 4)) != 0:
            n_byp += 1
        assert n_byp < 15, (
            f"escape raw value {raw:#x} needs {n_byp} bypass nibbles >= 15: "
            "count chain unsupported by the on-device decoder"
        )
        nibs = [n_byp]
        for j in range(n_byp):
            nibs.append((raw >> (4 * j)) & 0xF)
        out.append((int(pos[k]), nibs))
    return out


def _encode_row(carry, lut, idx_row, sym_row, act, small=None, has_big=None):
    """One reverse lockstep row: each active lane pushes one symbol.

    With ``small`` (build_small_tables output) the (start, freq) lookup
    for narrow rows is gather-free: one-hot matmul over the dense CDF
    constant + position selects (symbol -> value is known on the encoder,
    so no cum search is needed); the enc-LUT gather runs in a while_loop
    only on rows where some lane's index is outside the small prefix.

    Two carry layouts (see encode_groups scan_out):
      (state, wpos, words) — classic: masked scatter into the HBM-resident
        word buffer every row; returns (carry, None).
      state only — scan-output mode: the emitted word + emit flag are
        RETURNED as this row's ys and compacted after the scan; the carry
        is one [B, lanes] u32 (VMEM-resident)."""
    scan_out = not isinstance(carry, tuple)
    if scan_out:
        state = carry
    else:
        state, wpos, words = carry
    safe_idx = jnp.where(act, idx_row, 0)
    if small is not None:
        cdf_s, off_s, maxv_s, r_small = small
        is_small = safe_idx < r_small
        oh = (safe_idx[..., None] == jnp.arange(r_small, dtype=jnp.int32)).astype(
            jnp.float32
        )
        aug = np.concatenate(
            [np.asarray(cdf_s), np.asarray(off_s)[:, None],
             np.asarray(maxv_s)[:, None]], axis=1,
        )
        rowx = jax.lax.dot_general(
            oh, jnp.asarray(aug),
            (((oh.ndim - 1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )  # offset/maxv ride as two extra columns of the one matmul
        row = rowx[..., :-2]
        off_sm = rowx[..., -2].astype(jnp.int32)
        maxv_sm = rowx[..., -1].astype(jnp.int32)
        v = sym_row.astype(jnp.int32) - off_sm
        # out-of-range on either side codes the escape symbol (row maxv)
        v = jnp.where((v >= 0) & (v < maxv_sm), v, maxv_sm)
        # start/freq from ONE position mask (see _decode_row): row[v] is
        # the masked max, row[v+1] the min of the rest — v+1 <= len-1
        # always (v <= maxv = len-2), so the 2^20 pad never wins the min
        ks = jnp.arange(cdf_s.shape[1], dtype=jnp.int32)
        le = ks <= v[..., None]
        start_sm = jnp.max(jnp.where(le, row, 0.0), axis=-1)
        freq_sm = jnp.min(jnp.where(le, jnp.float32(1 << 20), row), axis=-1) - start_sm

        big = act & ~is_small
        zeros_u = jnp.zeros(safe_idx.shape, jnp.uint32)

        def g_cond(c):
            return c[0]

        def g_body(c):
            key = (
                jnp.where(big, safe_idx, 0) * (1 << 16)
                + (sym_row.astype(jnp.int32) + 32768)
            )
            return (jnp.asarray(False), jnp.take(lut, key))

        trig = jnp.any(big) if has_big is None else has_big
        _, sf = jax.lax.while_loop(g_cond, g_body, (trig, zeros_u))
        start = jnp.where(
            is_small, start_sm.astype(jnp.uint32), (sf & MASK16).astype(jnp.uint32)
        )
        freq = jnp.where(is_small, freq_sm.astype(jnp.uint32), sf >> 16)
    else:
        key = safe_idx * (1 << 16) + (sym_row.astype(jnp.int32) + 32768)
        sf = jnp.take(lut, key)
        start = (sf & MASK16).astype(jnp.uint32)
        freq = sf >> 16
    freq = jnp.maximum(freq, 1)

    emit = act & (state >= (freq << 16))
    word = (state & MASK16).astype(jnp.uint16)
    if not scan_out:
        lead = state.shape[:-1]
        bidx = jnp.broadcast_to(
            jnp.arange(state.shape[0], dtype=jnp.int32)[:, None], state.shape
        ) if len(lead) == 1 else None
        lidx = jnp.broadcast_to(
            jnp.arange(state.shape[-1], dtype=jnp.int32), state.shape
        )
        # masked scatter: inactive lanes write (harmlessly) to their current
        # slot with their existing word? No — use mode=drop via an OOB index.
        tgt = jnp.where(emit, wpos, jnp.full_like(wpos, words.shape[-1]))
        words = words.at[bidx, lidx, tgt].set(word, mode="drop")
        wpos = wpos + emit.astype(jnp.int32)
    state = jnp.where(emit, state >> 16, state)

    q = state // freq
    r = state - q * freq
    nstate = (q << 16) + r + start
    state = jnp.where(act, nstate, state)
    if scan_out:
        return state, (word, emit)
    return (state, wpos, words), None


def _compact_words(words_o, emit_o, b, lanes, wcap):
    """Turn per-row (word, emit) scan outputs into per-lane streams: one
    flat scatter over an exclusive row-cumsum of the emit bitmap (the
    scan_out / pallas encode epilogue).  Returns (wpos, words)."""
    ecnt = emit_o.astype(jnp.int32)
    wpos = jnp.sum(ecnt, axis=0)
    tgt = jnp.cumsum(ecnt, axis=0) - ecnt
    stride = wcap + 1
    li = jnp.arange(lanes, dtype=jnp.int32)
    bi = jnp.arange(b, dtype=jnp.int32)[:, None]
    base = (bi * lanes + li) * stride  # [b, lanes]
    flat_idx = base[None] + jnp.where(emit_o, jnp.minimum(tgt, wcap), wcap)
    flat = jnp.zeros(b * lanes * stride, jnp.uint16)
    flat = flat.at[flat_idx.reshape(-1)].set(
        words_o.astype(jnp.uint16).reshape(-1), mode="drop"
    )
    words = flat.reshape(b, lanes, stride)[..., :wcap]
    return wpos, words


def _compact_words_gather(words_o, emit_o, b, lanes, wcap):
    """Sort-free _compact_words.  The scatter targets are MONOTONE per lane
    (an exclusive cumsum of the emit bitmap), so the compaction is a stream
    compaction and can run as a GATHER instead: output slot j of a lane
    reads the row holding its (j+1)-th emitted word,
    r_j = #{rows r : c_r <= j} with c the inclusive emit cumsum.  XLA
    lowers the arbitrary-index scatter via a full 6.8M-element sort
    (~45 ms at bench shapes, tools/prof_enc_trace.py); the broadcast
    compare-count reduce fuses on the VPU and the take_along_axis is one
    aligned per-element gather.  Bit-identical to _compact_words (zeros
    beyond each lane's count, overflow words dropped)."""
    et = emit_o.transpose(1, 2, 0)  # [b, lanes, rows]
    ct = jnp.cumsum(et.astype(jnp.int32), axis=-1)
    wpos = ct[..., -1]
    j = jnp.arange(wcap, dtype=jnp.int32)
    r_j = jnp.sum(
        (ct[:, :, None, :] <= j[:, None]).astype(jnp.int32), axis=-1
    )  # [b, lanes, wcap]
    wt = words_o.astype(jnp.uint16).transpose(1, 2, 0)  # [b, lanes, rows]
    rows = wt.shape[-1]
    out = jnp.take_along_axis(wt, jnp.minimum(r_j, rows - 1), axis=-1)
    out = jnp.where(j < wpos[..., None], out, jnp.uint16(0))
    return wpos, out


def _compact_words_onehot(words_o, emit_o, b, lanes, wcap):
    """Gather-free _compact_words: output slot j-1 of a lane takes a
    one-hot max-reduce over the rows where the inclusive emit cumsum
    first reaches j (with emit set) — out[.., j-1] = max_r where(c_r == j
    & emit_r, word_r, 0).  Kills BOTH arbitrary-index memory ops: the
    scatter sort-lowers (~45 ms/modality) and even the monotone gather is
    element-bound at ~11 ns/element (12.9 ms/modality for the 1M-element
    take at wcap=128, bench trace); the masked reduce fuses on the VPU
    (~3 ms).  Bit-identical to _compact_words on every emit pattern
    (each (lane, j) matches at most one row; zeros beyond the count,
    overflow words dropped by the j1 <= wcap cap)."""
    et = emit_o.transpose(1, 2, 0)  # [b, lanes, rows]
    ct = jnp.cumsum(et.astype(jnp.int32), axis=-1)
    wpos = ct[..., -1]
    j1 = jnp.arange(1, wcap + 1, dtype=jnp.int32)
    wt = words_o.astype(jnp.uint16).transpose(1, 2, 0)  # [b, lanes, rows]
    hit = (ct[..., None] == j1) & et[..., None]  # [b, lanes, rows, wcap]
    out = jnp.max(jnp.where(hit, wt[..., None], jnp.uint16(0)), axis=2)
    return wpos, out




def _pick_compact(mode):
    """Map the gather_compact arg (False / True|"gather" / "onehot") to a
    compaction implementation — all three bit-identical on every emit
    pattern (pinned by tests/test_rans_tpu.py)."""
    if mode == "onehot":
        return _compact_words_onehot
    return _compact_words_gather if mode else _compact_words

def encode_groups(
    sym: jnp.ndarray,
    indexes: jnp.ndarray,
    enc_lut: jnp.ndarray,
    lanes: int = DEFAULT_LANES,
    group_lens=None,
    wcap: int = 4096,
    small=None,
    unroll: int = 4,
    scan_out: bool = False,
    pallas: bool = False,
    small_z=None,
    gather_compact: bool = False,
):
    """Encode [B, T] int16 symbols / uint8 indexes into per-lane rans32
    word streams on device.

    Returns (states u32[B,lanes], wcounts i32[B,lanes],
    words u16[B,lanes,wcap]) where words[b,l,:wcounts] holds lane l's words
    in EMISSION order (reverse of decode-consume order — the host flips
    each lane when assembling the container).  group_lens must be the
    static per-group symbol counts used by the matching decode calls.

    Unlike the decode scan (element-bound), the reverse encode scan is
    ROW-latency-bound (measured: wider lanes sped it up 25% while decode
    stayed flat, tools/prof_lanes2.py) — so each scan step processes
    ``unroll`` consecutive rows back-to-back, cutting the serial step
    count 4x WITHOUT widening the wire format (more lanes would cost 12
    B/lane/stream of container header).

    scan_out=True moves word emission out of the scan: each row RETURNS
    (word, emit) as scan ys instead of scattering into a [B, lanes, wcap]
    carry (13 MB at bench shapes — HBM-resident, one read-modify-write
    per step).  The carry shrinks to the [B, lanes] u32 state alone and
    the per-lane streams are rebuilt afterwards with ONE big scatter over
    an exclusive row-cumsum of the emit bitmap.  Bit-identical output by
    construction (same emission order, same compaction targets)."""
    b, total = sym.shape
    assert group_lens is not None and int(np.sum(group_lens)) == total
    idx_rows, sym_rows, act_rows = [], [], []
    basep = 0
    for gl in group_lens:
        gl = int(gl)
        steps = max(-(-gl // lanes), 1)
        pad = steps * lanes - gl
        gs = jnp.pad(sym[:, basep : basep + gl].astype(jnp.int32), ((0, 0), (0, pad)))
        gi = jnp.pad(
            indexes[:, basep : basep + gl].astype(jnp.int32), ((0, 0), (0, pad))
        )
        sym_rows.append(gs.reshape(b, steps, lanes).transpose(1, 0, 2))
        idx_rows.append(gi.reshape(b, steps, lanes).transpose(1, 0, 2))
        valid = (
            jnp.arange(steps * lanes, dtype=jnp.int32).reshape(steps, lanes) < gl
        )
        act_rows.append(
            jnp.broadcast_to(valid[:, None, :], (steps, b, lanes))
        )
        basep += gl
    # reverse row order: LIFO encoding mirrors the forward decode rows.
    # With small_z (dense mode), the scan SPLITS at the z/y boundary:
    # group 0 (z) rows use the combined table, the y groups the narrow
    # gaussian prefix — every row belongs to exactly one group, so the
    # split changes nothing about processing order (y rows first in the
    # reversed scan, then z) and streams stay byte-identical.
    if small_z is not None and len(group_lens) > 1:
        segs = [
            (jnp.concatenate(idx_rows[1:], axis=0)[::-1],
             jnp.concatenate(sym_rows[1:], axis=0)[::-1],
             jnp.concatenate(act_rows[1:], axis=0)[::-1], small),
            (idx_rows[0][::-1], sym_rows[0][::-1], act_rows[0][::-1],
             small_z),
        ]
    else:
        segs = [
            (jnp.concatenate(idx_rows, axis=0)[::-1],
             jnp.concatenate(sym_rows, axis=0)[::-1],
             jnp.concatenate(act_rows, axis=0)[::-1], small),
        ]

    state0 = jnp.full((b, lanes), RANS32_L, jnp.uint32)

    if pallas:
        # Pallas backend (rans_pallas.encode_rows): dense-total tables
        # only (no enc-LUT gather in the kernel); emission compaction is
        # shared with the scan_out path — bit-identical streams.
        from . import rans_pallas

        state, wo_all, eo_all = state0, [], []
        for idx_r, sym_r, act_r, sm in segs:
            assert sm is not None
            state, words_o, emit_o = rans_pallas.encode_rows(
                state, idx_r, sym_r, act_r, sm
            )
            wo_all.append(words_o)
            eo_all.append(emit_o)
        compact = _pick_compact(gather_compact)
        wpos, words = compact(
            jnp.concatenate(wo_all, axis=0), jnp.concatenate(eo_all, axis=0),
            b, lanes, wcap,
        )
        return state, wpos, words

    k = max(int(unroll), 1)

    def prep(idx_r, sym_r, act_r, sm):
        # pad the row count to a multiple of ``unroll`` with inactive rows
        # AT THE FRONT (they run first in the reverse scan and are no-ops:
        # act=False emits nothing and leaves state untouched)
        rows = idx_r.shape[0]
        rpad = (-rows) % k
        if rpad:
            zrow = jnp.zeros((rpad, b, lanes), jnp.int32)
            frow = jnp.zeros((rpad, b, lanes), bool)
            idx_r = jnp.concatenate([zrow, idx_r], axis=0)
            sym_r = jnp.concatenate([zrow, sym_r], axis=0)
            act_r = jnp.concatenate([frow, act_r], axis=0)
        nsteps = (rows + rpad) // k
        shp = (nsteps, k, b, lanes)
        idx_r = idx_r.reshape(shp)
        sym_r = sym_r.reshape(shp)
        act_r = act_r.reshape(shp)
        if sm is not None:
            # per-row big-row trigger, precomputed from the input indexes
            # so the scan body carries no cross-lane any() (_decode_row)
            hb_r = jnp.any((idx_r >= sm[3]) & act_r, axis=(2, 3))
        else:
            hb_r = jnp.zeros((nsteps, k), bool)  # unused
        return idx_r, sym_r, act_r, hb_r, nsteps

    if scan_out:
        state, wo_all, eo_all = state0, [], []
        for idx_r, sym_r, act_r, sm in segs:
            idx_r, sym_r, act_r, hb_r, nsteps = prep(idx_r, sym_r, act_r, sm)

            def step_o(c, xs, _sm=sm):
                i_k, s_k, a_k, hb_k = xs
                ws, es = [], []
                for j in range(k):
                    c, (w, e) = _encode_row(
                        c, enc_lut, i_k[j], s_k[j], a_k[j], small=_sm,
                        has_big=(hb_k[j] if _sm is not None else None),
                    )
                    ws.append(w)
                    es.append(e)
                return c, (jnp.stack(ws), jnp.stack(es))

            state, (words_o, emit_o) = jax.lax.scan(
                step_o, state, (idx_r, sym_r, act_r, hb_r)
            )
            wo_all.append(words_o.reshape(nsteps * k, b, lanes))
            eo_all.append(emit_o.reshape(nsteps * k, b, lanes))
        compact = _pick_compact(gather_compact)
        wpos, words = compact(
            jnp.concatenate(wo_all, axis=0), jnp.concatenate(eo_all, axis=0),
            b, lanes, wcap,
        )
        return state, wpos, words

    carry = (state0, jnp.zeros((b, lanes), jnp.int32),
             jnp.zeros((b, lanes, wcap), jnp.uint16))
    for idx_r, sym_r, act_r, sm in segs:
        idx_r, sym_r, act_r, hb_r, _ = prep(idx_r, sym_r, act_r, sm)

        def step(c, xs, _sm=sm):
            i_k, s_k, a_k, hb_k = xs
            for j in range(k):
                c, _ = _encode_row(
                    c, enc_lut, i_k[j], s_k[j], a_k[j], small=_sm,
                    has_big=(hb_k[j] if _sm is not None else None),
                )
            return c, None

        carry, _ = jax.lax.scan(step, carry, (idx_r, sym_r, act_r, hb_r))
    return carry
