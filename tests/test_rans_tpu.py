"""Lane-split rans32: C encoder <-> C decoder <-> JAX lockstep decoder.

The JAX decoder (coder/rans_tpu.py) must be bit-exact with the C mirror on
adversarial streams — including out-of-range escape symbols (the reference
coder's bypass mode, rans_interface.cpp:119-163) and ragged group/lane
alignments — because it decodes real model bitstreams on the TPU.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rgbdc_tpu.coder import rans_tpu as rt
from rgbdc_tpu.coder.rans import lanes_decode, lanes_encode, lanes_split
from rgbdc_tpu.entropy import get_scale_table
from rgbdc_tpu.entropy.tables import build_gaussian_tables

TABLE = build_gaussian_tables(get_scale_table())


def _random_stream(rng, n, esc_rate=0.02):
    idx = rng.integers(0, len(TABLE.cdf_length), n).astype(np.uint8)
    sym = rng.integers(-30, 30, n).astype(np.int16)
    esc = rng.random(n) < esc_rate
    sym[esc] = rng.integers(-30000, 30000, max(esc.sum(), 0)).astype(np.int16)
    return sym, idx


def _jax_decode(data, idx, group_lens, lanes, batch=True):
    tbl = rt.device_table(TABLE)
    states, words, byp = lanes_split(data, lanes)
    s = jnp.asarray(states)[None] if batch else jnp.asarray(states)
    w = jnp.asarray(words)[None] if batch else jnp.asarray(words)
    bp = jnp.asarray(byp)[None] if batch else jnp.asarray(byp)
    carry = rt.init_lane_state(s)
    out, base = [], 0
    for gl in group_lens:
        gi = np.asarray(idx[base : base + gl])
        gi = jnp.asarray(gi)[None] if batch else jnp.asarray(gi)
        carry, sym = rt.decode_group(carry, w, bp, gi, tbl, lanes=lanes)
        out.append(np.asarray(sym).reshape(-1))
        base += gl
    return np.concatenate(out).astype(np.int16), carry


class TestCLanes:
    @pytest.mark.parametrize("lanes", [1, 7, 64, 128])
    def test_roundtrip(self, lanes):
        rng = np.random.default_rng(lanes)
        group_lens = rng.integers(0, 4000, 5)
        sym, idx = _random_stream(rng, int(group_lens.sum()))
        data = lanes_encode(sym, idx, group_lens, TABLE, lanes=lanes)
        out = lanes_decode(data, idx, group_lens, TABLE, lanes=lanes)
        assert np.array_equal(out, sym)

    def test_all_escapes(self):
        rng = np.random.default_rng(3)
        n = 500
        idx = np.zeros(n, np.uint8)  # narrowest CDF -> everything escapes
        sym = rng.integers(-32768, 32767, n).astype(np.int16)
        data = lanes_encode(sym, idx, [n], TABLE, lanes=16)
        assert np.array_equal(lanes_decode(data, idx, [n], TABLE, lanes=16), sym)

    def test_empty(self):
        data = lanes_encode(
            np.zeros(0, np.int16), np.zeros(0, np.uint8), [0], TABLE, lanes=8
        )
        states, words, byp = lanes_split(data, 8)
        assert np.all(states == 1 << 16) and words.shape[1] <= 1
        assert np.all(words == 0) and np.all(byp == 0)


class TestJaxLaneDecoder:
    @pytest.mark.parametrize("lanes", [4, 32, 128])
    def test_bit_exact_vs_c(self, lanes):
        rng = np.random.default_rng(lanes + 100)
        group_lens = rng.integers(1, 2500, 4)
        sym, idx = _random_stream(rng, int(group_lens.sum()), esc_rate=0.05)
        data = lanes_encode(sym, idx, group_lens, TABLE, lanes=lanes)
        got, carry = _jax_decode(data, idx, group_lens, lanes)
        assert np.array_equal(got, sym)
        # the final per-lane state must return to the encoder's init (L)
        assert np.all(np.asarray(carry.state) == (1 << 16))

    def test_ragged_tail_rows(self):
        """Group lengths not divisible by lanes exercise the tail masks."""
        rng = np.random.default_rng(7)
        group_lens = [129, 1, 127, 255, 3]
        sym, idx = _random_stream(rng, sum(group_lens), esc_rate=0.1)
        data = lanes_encode(sym, idx, group_lens, TABLE, lanes=128)
        got, _ = _jax_decode(data, idx, group_lens, 128)
        assert np.array_equal(got, sym)

    def test_all_escape_stream(self):
        rng = np.random.default_rng(11)
        n = 700
        idx = np.zeros(n, np.uint8)
        sym = rng.integers(-32768, 32767, n).astype(np.int16)
        data = lanes_encode(sym, idx, [n], TABLE, lanes=32)
        got, _ = _jax_decode(data, idx, [n], 32)
        assert np.array_equal(got, sym)

    def test_batched_streams(self):
        """Independent per-image streams decode in one vectorized call."""
        rng = np.random.default_rng(13)
        lanes, B = 16, 3
        group_lens = [1000, 500]
        syms, datas = [], []
        for _ in range(B):
            sym, idx0 = _random_stream(rng, sum(group_lens))
            syms.append((sym, idx0))
            datas.append(lanes_encode(sym, idx0, group_lens, TABLE, lanes=lanes))
        split = [lanes_split(d, lanes) for d in datas]
        W = max(s[1].shape[1] for s in split)
        BW = max(s[2].shape[1] for s in split)
        states = np.stack([s[0] for s in split])
        words = np.stack(
            [np.pad(s[1], ((0, 0), (0, W - s[1].shape[1]))) for s in split]
        )
        byps = np.stack(
            [np.pad(s[2], ((0, 0), (0, BW - s[2].shape[1]))) for s in split]
        )
        tbl = rt.device_table(TABLE)
        carry = rt.init_lane_state(jnp.asarray(states))
        wj = jnp.asarray(words)
        bj = jnp.asarray(byps)
        base = 0
        for gl in group_lens:
            gi = jnp.asarray(np.stack([s[1][base : base + gl] for s in syms]))
            carry, out = rt.decode_group(carry, wj, bj, gi, tbl, lanes=lanes)
            for b in range(B):
                assert np.array_equal(
                    np.asarray(out[b], np.int16), syms[b][0][base : base + gl]
                )
            base += gl

    def test_combined_table(self):
        """Groups coded against different sub-tables of a combined table."""
        from rgbdc_tpu.coder.rans_tpu import combine_tables

        rng = np.random.default_rng(17)
        sub = build_gaussian_tables(get_scale_table()[:8])
        comb = combine_tables(TABLE, sub)
        n1, n2 = 800, 600
        idx1 = rng.integers(0, 64, n1).astype(np.uint8)
        idx2 = (64 + rng.integers(0, 8, n2)).astype(np.uint8)
        sym = rng.integers(-20, 20, n1 + n2).astype(np.int16)
        idx = np.concatenate([idx1, idx2])
        data = lanes_encode(sym, idx, [n1, n2], comb, lanes=8)
        tbl = rt.device_table(comb)
        states, words, byp = lanes_split(data, 8)
        carry = rt.init_lane_state(jnp.asarray(states))
        wj = jnp.asarray(words)
        bj = jnp.asarray(byp)
        carry, o1 = rt.decode_group(carry, wj, bj, jnp.asarray(idx1), tbl, lanes=8)
        carry, o2 = rt.decode_group(carry, wj, bj, jnp.asarray(idx2), tbl, lanes=8)
        got = np.concatenate([np.asarray(o1), np.asarray(o2)]).astype(np.int16)
        assert np.array_equal(got, sym)


class TestLutDecoder:
    @pytest.mark.parametrize("lanes", [32, 128])
    def test_lut_matches_binary_search(self, lanes):
        """LUT symbol lookup must be bit-identical to the binary search."""
        rng = np.random.default_rng(lanes + 500)
        group_lens = [3000, 1700]
        sym, idx = _random_stream(rng, sum(group_lens), esc_rate=0.05)
        data = lanes_encode(sym, idx, group_lens, TABLE, lanes=lanes)
        states, words, byp = lanes_split(data, lanes)
        out = {}
        for lut in (False, True):
            tbl = jnp.asarray(rt.build_lut(TABLE)) if lut else rt.device_table(TABLE)
            carry = rt.init_lane_state(jnp.asarray(states))
            wj = jnp.asarray(words)
            bj = jnp.asarray(byp)
            got, base = [], 0
            for gl in group_lens:
                carry, s = rt.decode_group(
                    carry, wj, bj, jnp.asarray(idx[base : base + gl]), tbl, lanes=lanes
                )
                got.append(np.asarray(s))
                base += gl
            out[lut] = np.concatenate(got).astype(np.int16)
        assert np.array_equal(out[True], sym)
        assert np.array_equal(out[True], out[False])


class TestDenseCappedTables:
    """cap_table + dense-total small tables (the RGBDC_DENSE128 machinery):
    with every row capped, the dense one-hot path covers the WHOLE table —
    the packed LUTs are never consulted (tiny dummies stand in) and the
    folded tails ride the existing escape/bypass machinery.  Both coding
    directions must stay bit-exact with the C mirror, including symbols
    that were in-range on the uncapped table and now escape."""

    CAP = 48  # small enough that many gaussian mid rows actually fold

    def test_cap_table_validity(self):
        t = rt.cap_table(TABLE, self.CAP)
        assert int(t.cdf_length.max()) <= self.CAP
        folded = 0
        for r in range(t.cdf.shape[0]):
            ln = int(t.cdf_length[r])
            row = t.cdf[r, :ln]
            assert row[0] == 0 and row[-1] == (1 << 16)
            assert np.all(np.diff(row) >= 1)
            if int(TABLE.cdf_length[r]) > self.CAP:
                folded += 1
                # kept window: same symbol FREQUENCIES as the original at
                # the shifted positions, and the window contains value 0
                c0 = int(t.offset[r]) - int(TABLE.offset[r])
                assert c0 >= 0
                np.testing.assert_array_equal(
                    np.diff(row[:-1]),
                    np.diff(TABLE.cdf[r, c0 : c0 + ln - 1]),
                )
                maxv = ln - 2
                assert t.offset[r] <= 0 < t.offset[r] + maxv
            else:
                assert ln == int(TABLE.cdf_length[r])
                assert t.offset[r] == TABLE.offset[r]
        assert folded > 0  # the cap actually bit some rows

    def test_cap_noop_when_under(self):
        t = rt.cap_table(TABLE, int(TABLE.cdf_length.max()))
        assert t is TABLE

    def _stream(self, rng, n):
        # mix: in-range-small, in-range-wide (folds under the cap), escapes
        sym, idx = _random_stream(rng, n, esc_rate=0.05)
        wide = rng.random(n) < 0.15
        sym[wide] = rng.integers(-200, 200, int(wide.sum())).astype(np.int16)
        return sym, idx

    def test_c_roundtrip_capped(self):
        rng = np.random.default_rng(41)
        capped = rt.cap_table(TABLE, self.CAP)
        group_lens = [900, 3, 411]
        sym, idx = self._stream(rng, sum(group_lens))
        data = lanes_encode(sym, idx, group_lens, capped, lanes=32)
        out = lanes_decode(data, idx, group_lens, capped, lanes=32)
        assert np.array_equal(out, sym)

    @pytest.mark.parametrize("escfix", [False, True])
    def test_dense_decode_bit_exact(self, escfix):
        """JAX decode with dense-total small tables + dummy LUT."""
        rng = np.random.default_rng(43)
        capped = rt.cap_table(TABLE, self.CAP)
        group_lens = [800, 1, 777]
        lanes = 32
        sym, idx = self._stream(rng, sum(group_lens))
        data = lanes_encode(sym, idx, group_lens, capped, lanes=lanes)
        states, words, byp = lanes_split(data, lanes)
        small = rt.build_small_tables(capped, k_cap=self.CAP, r_max=1 << 30)
        assert small is not None and small[3] == capped.cdf.shape[0]
        dummy = jnp.zeros((1, 2), jnp.uint32)
        fix = rt.escape_fixup_tables(capped) if escfix else None
        carry = rt.init_lane_state(jnp.asarray(states))
        got, base = [], 0
        for gl in group_lens:
            carry, s = rt.decode_group(
                carry, jnp.asarray(words), jnp.asarray(byp),
                jnp.asarray(idx[base : base + gl]), dummy, lanes=lanes,
                small=small, escfix=fix,
            )
            got.append(np.asarray(s))
            base += gl
        got = np.concatenate(got).astype(np.int16)
        assert np.array_equal(got, sym)

    @pytest.mark.parametrize("escfix", [False, True])
    @pytest.mark.parametrize("unroll", [3, 4])
    def test_decode_unroll_bit_exact(self, unroll, escfix):
        """decode_group with row unroll (k rows per scan step) must match
        unroll=1 exactly — ragged group lengths force end-padding rows,
        escapes exercise both the in-scan loop and the fixup post-pass."""
        rng = np.random.default_rng(47)
        capped = rt.cap_table(TABLE, self.CAP)
        group_lens = [800, 1, 777]
        lanes = 32
        sym, idx = self._stream(rng, sum(group_lens))
        data = lanes_encode(sym, idx, group_lens, capped, lanes=lanes)
        states, words, byp = lanes_split(data, lanes)
        small = rt.build_small_tables(capped, k_cap=self.CAP, r_max=1 << 30)
        dummy = jnp.zeros((1, 2), jnp.uint32)
        fix = rt.escape_fixup_tables(capped) if escfix else None
        for u in (1, unroll):
            carry = rt.init_lane_state(jnp.asarray(states))
            got, base = [], 0
            for gl in group_lens:
                carry, s = rt.decode_group(
                    carry, jnp.asarray(words), jnp.asarray(byp),
                    jnp.asarray(idx[base : base + gl]), dummy, lanes=lanes,
                    small=small, escfix=fix, unroll=u,
                )
                got.append(np.asarray(s))
                base += gl
            got = np.concatenate(got).astype(np.int16)
            assert np.array_equal(got, sym), f"unroll={u} diverged"

    def test_dense_device_encode_byte_identical(self):
        """Device dense encode (dummy enc LUT) must emit the same container
        bytes as the C encoder over the capped table."""
        from rgbdc_tpu.coder.rans import (
            assemble_lanes_container,
            build_nibble_streams,
        )

        rng = np.random.default_rng(47)
        capped = rt.cap_table(TABLE, self.CAP)
        group_lens = [500, 277]
        lanes = 16
        sym, idx = self._stream(rng, sum(group_lens))
        small = rt.build_small_tables(capped, k_cap=self.CAP, r_max=1 << 30)
        states, wcounts, words = rt.encode_groups(
            jnp.asarray(sym.reshape(1, -1)),
            jnp.asarray(idx.reshape(1, -1)),
            jnp.zeros((1,), jnp.uint32),
            lanes=lanes,
            group_lens=group_lens,
            wcap=512,
            small=small,
        )
        esc = rt.escape_chunks(sym, idx, capped)
        nibs = build_nibble_streams(esc, group_lens, lanes)
        data = assemble_lanes_container(
            np.asarray(states[0]), np.asarray(wcounts[0]),
            np.asarray(words[0]), nibs,
        )
        ref = lanes_encode(sym, idx, group_lens, capped, lanes=lanes)
        assert data == ref


class TestPallasBackend:
    """Pallas (Mosaic) scan kernels (coder/rans_pallas.py) vs the XLA scan
    bodies, in interpret mode on CPU: symbols, streams, and the threaded
    carry must be IDENTICAL — the kernels are drop-in backends for the
    dense-table regime (decode additionally requires escfix)."""

    CAP = 48
    LANES = 32
    B = 4  # B*LANES = 128: the kernels' lane-tile requirement

    def _dense_setup(self):
        capped = rt.cap_table(TABLE, self.CAP)
        small = rt.build_small_tables(capped, k_cap=self.CAP, r_max=1 << 30)
        assert small is not None and small[3] == capped.cdf.shape[0]
        return capped, small

    def test_decode_matches_xla(self, monkeypatch):
        monkeypatch.setenv("RGBDC_PALLAS_INTERPRET", "1")
        rng = np.random.default_rng(61)
        capped, small = self._dense_setup()
        group_lens = [700, 1, 581]
        sym, idx = _random_stream(rng, sum(group_lens), esc_rate=0.06)
        data = lanes_encode(sym, idx, group_lens, capped, lanes=self.LANES)
        states, words, byp = lanes_split(data, self.LANES)
        rep = lambda x: jnp.asarray(np.stack([x] * self.B))
        dummy = jnp.zeros((1, 2), jnp.uint32)
        fix = rt.escape_fixup_tables(capped)
        out = {}
        for pallas in (False, True):
            carry = rt.init_lane_state(rep(states))
            got, base = [], 0
            for gl in group_lens:
                carry, s = rt.decode_group(
                    carry, rep(words), rep(byp),
                    rep(np.asarray(idx[base : base + gl], np.int32)),
                    dummy, lanes=self.LANES, small=small, escfix=fix,
                    pallas=pallas,
                )
                got.append(np.asarray(s))
                base += gl
            out[pallas] = (np.concatenate(got, axis=-1), carry)
        (sym_p, c_p), (sym_x, c_x) = out[True], out[False]
        np.testing.assert_array_equal(sym_p, sym_x)
        np.testing.assert_array_equal(sym_p[0].astype(np.int16), sym)
        for a, b in zip(c_p, c_x):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_encode_zy_split_byte_identical(self):
        """small_z (dense mode's z/y scan split) must not change anything:
        same rows in the same order, just narrower tables per segment."""
        comb = rt.cap_table(
            rt.combine_tables(TABLE, TABLE), self.CAP
        )  # rows [0,64) "y", [64,128) "z"-like
        y_rows = TABLE.cdf.shape[0]
        small_all = rt.build_small_tables(comb, k_cap=self.CAP, r_max=1 << 30)
        small_y = tuple(
            s[:y_rows] if i < 3 else y_rows for i, s in enumerate(small_all)
        )
        rng = np.random.default_rng(71)
        z_len, y1, y2 = 300, 500, 257
        zi = rng.integers(y_rows, 2 * y_rows, (self.B, z_len))
        yi = rng.integers(0, y_rows, (self.B, y1 + y2))
        idx = np.concatenate([zi, yi], axis=1).astype(np.uint8)
        sym = rng.integers(-40, 40, idx.shape).astype(np.int16)
        dummy = jnp.zeros((1,), jnp.uint32)
        out = {}
        for split in (False, True):
            out[split] = [
                np.asarray(a) for a in rt.encode_groups(
                    jnp.asarray(sym), jnp.asarray(idx), dummy,
                    lanes=self.LANES, group_lens=[z_len, y1, y2], wcap=512,
                    small=(small_y if split else small_all),
                    small_z=(small_all if split else None),
                    unroll=2, scan_out=True,
                )
            ]
        for a, b in zip(out[True], out[False]):
            np.testing.assert_array_equal(a, b)

    def test_encode_matches_scan_out(self, monkeypatch):
        monkeypatch.setenv("RGBDC_PALLAS_INTERPRET", "1")
        rng = np.random.default_rng(67)
        capped, small = self._dense_setup()
        group_lens = [500, 277]
        n = sum(group_lens)
        sym = np.stack(
            [TestDenseCappedTables._stream(TestDenseCappedTables(), rng, n)[0]
             for _ in range(self.B)]
        )
        idx = np.stack(
            [rng.integers(0, len(capped.cdf_length), n).astype(np.uint8)
             for _ in range(self.B)]
        )
        dummy = jnp.zeros((1,), jnp.uint32)
        out = {}
        for pallas in (False, True):
            st, wc, wd = rt.encode_groups(
                jnp.asarray(sym.astype(np.int16)), jnp.asarray(idx), dummy,
                lanes=self.LANES, group_lens=group_lens, wcap=512,
                small=small, unroll=1, scan_out=not pallas, pallas=pallas,
            )
            out[pallas] = (np.asarray(st), np.asarray(wc), np.asarray(wd))
        for a, b in zip(out[True], out[False]):
            np.testing.assert_array_equal(a, b)


class TestDeviceEncoder:
    """On-device reverse-scan encoder: its containers must decode exactly
    with BOTH the C mirror and the JAX lockstep decoder."""

    @pytest.mark.parametrize("lanes", [4, 32, 128])
    def test_roundtrip_vs_both_decoders(self, lanes):
        rng = np.random.default_rng(lanes)
        group_lens = [700, 1, 353, 64]
        sym, idx = _random_stream(rng, sum(group_lens), esc_rate=0.04)
        got = self._device_encode_decode(sym, idx, group_lens, lanes)
        assert np.array_equal(got, sym)

    def test_all_escapes(self):
        rng = np.random.default_rng(7)
        n = 300
        idx = np.zeros(n, np.uint8)
        sym = rng.integers(-30000, 30000, n).astype(np.int16)
        got = self._device_encode_decode(sym, idx, [n], 8)
        assert np.array_equal(got, sym)

    def test_no_escape_fast_path(self):
        rng = np.random.default_rng(9)
        n = 4096
        idx = rng.integers(40, 64, n).astype(np.uint8)
        sym = rng.integers(-3, 4, n).astype(np.int16)
        got = self._device_encode_decode(sym, idx, [n // 2, n // 2], 64)
        assert np.array_equal(got, sym)

    @staticmethod
    def _device_encode_decode(sym, idx, group_lens, lanes):
        from rgbdc_tpu.coder.rans import (
            assemble_lanes_container,
            build_nibble_streams,
            lanes_decode,
        )

        enc_lut = jnp.asarray(rt.build_enc_lut(TABLE))
        states, wcounts, words = rt.encode_groups(
            jnp.asarray(sym.reshape(1, -1)),
            jnp.asarray(idx.reshape(1, -1)),
            enc_lut,
            lanes=lanes,
            group_lens=group_lens,
            wcap=4096,
        )
        esc = rt.escape_chunks(sym, idx, TABLE)
        nibs = build_nibble_streams(esc, group_lens, lanes)
        data = assemble_lanes_container(
            np.asarray(states[0]), np.asarray(wcounts[0]), np.asarray(words[0]), nibs
        )
        # C mirror decode
        got_c = lanes_decode(data, idx, group_lens, TABLE, lanes=lanes)
        # JAX decoder too
        got_j, _ = _jax_decode(data, idx, group_lens, lanes)
        assert np.array_equal(got_c, got_j)
        return got_c


class TestEscapeFixupDecode:
    """escfix decode mode (decode_group escfix=(off, maxv)): the scan body
    carries no escape machinery; escape values are reconstructed in a
    post-scan per-ordinal pass.  Must be bit-exact with the classic
    in-scan escape loop — symbols AND the full threaded carry (state, pos,
    nib) — across group boundaries, in every lookup mode."""

    ESCFIX = (
        jnp.asarray(np.asarray(TABLE.offset, np.int32)),
        jnp.asarray(np.asarray(TABLE.cdf_length, np.int32) - 2),
    )

    def _decode_both(self, sym, idx, group_lens, lanes, mode, batch=2):
        data = lanes_encode(sym, idx, group_lens, TABLE, lanes=lanes)
        states, words, byp = lanes_split(data, lanes)
        if mode == "search":
            tbl, small = rt.device_table(TABLE), None
        elif mode == "lut":
            tbl, small = jnp.asarray(rt.build_lut(TABLE)), None
        else:
            tbl = jnp.asarray(rt.build_lut(TABLE))
            small = rt.build_small_tables(TABLE)
            assert small is not None
        rep = lambda x: jnp.asarray(np.stack([x] * batch))
        out = {}
        for escfix in (None, self.ESCFIX):
            carry = rt.init_lane_state(rep(states))
            got, base = [], 0
            for gl in group_lens:
                carry, s = rt.decode_group(
                    carry, rep(words), rep(byp),
                    rep(np.asarray(idx[base : base + gl], np.int32)),
                    tbl, lanes=lanes, small=small, escfix=escfix,
                )
                got.append(np.asarray(s))
                base += gl
            out[escfix is None] = (np.concatenate(got, axis=-1), carry)
        (sym_fix, c_fix), (sym_cls, c_cls) = out[False], out[True]
        np.testing.assert_array_equal(sym_fix, sym_cls)
        for a, b in zip(c_fix, c_cls):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(sym_fix[0], sym.astype(sym_fix.dtype))
        return sym_fix

    @pytest.mark.parametrize("mode", ["search", "lut", "small"])
    def test_mixed_escapes_bit_exact(self, mode):
        rng = np.random.default_rng(17)
        group_lens = [900, 1, 411, 600]
        sym, idx = _random_stream(rng, sum(group_lens), esc_rate=0.08)
        self._decode_both(sym, idx, group_lens, 32, mode)

    def test_no_escapes_skips_fixup(self):
        rng = np.random.default_rng(19)
        n = 2000
        idx = rng.integers(40, 64, n).astype(np.uint8)
        sym = rng.integers(-3, 4, n).astype(np.int16)
        self._decode_both(sym, idx, [n // 2, n // 2], 64, "small")

    def test_all_escapes(self):
        rng = np.random.default_rng(23)
        n = 700
        idx = np.zeros(n, np.uint8)  # narrowest row: everything escapes
        sym = rng.integers(-30000, 30000, n).astype(np.int16)
        self._decode_both(sym, idx, [n], 16, "lut")

    def test_ragged_tail_and_multi_escape_lanes(self):
        # single lane -> every escape in one lane, deep per-lane ordinals;
        # ragged final row exercises the act masking in the fixup
        rng = np.random.default_rng(29)
        n = 257
        sym, idx = _random_stream(rng, n, esc_rate=0.3)
        self._decode_both(sym, idx, [n], 4, "small")


class TestSmallRowFastPath:
    """Hybrid decode: dense one-hot-matmul path for narrow CDF rows +
    while_loop LUT gather for wide rows (rans_tpu.build_small_tables) must
    be bit-exact with the C coder on adversarial mixed streams."""

    def test_build_small_tables_prefix(self):
        small = rt.build_small_tables(TABLE)
        assert small is not None
        cdf_s, off_s, maxv_s, r = small
        assert 4 <= r <= 64
        for i in range(r):
            ln = int(TABLE.cdf_length[i])
            np.testing.assert_array_equal(
                cdf_s[i, :ln].astype(np.int64), TABLE.cdf[i, :ln]
            )
            assert maxv_s[i] == ln - 2

    @pytest.mark.parametrize("esc_rate", [0.0, 0.05])
    def test_bit_exact_vs_c_mixed_rows(self, esc_rate):
        rng = np.random.default_rng(11)
        lanes = 64
        n = 6000
        small = rt.build_small_tables(TABLE)
        r_small = small[3]
        # bias indexes toward the small prefix (the trained regime) with a
        # sprinkle of big rows, so rows mix small/big lanes arbitrarily
        idx = np.where(
            rng.random(n) < 0.9,
            rng.integers(0, min(8, r_small), n),
            rng.integers(0, len(TABLE.cdf_length), n),
        ).astype(np.uint8)
        off = TABLE.offset[idx.astype(np.int64)]
        maxv = TABLE.cdf_length[idx.astype(np.int64)] - 2
        sym = (off + rng.integers(0, 1, n) * 0).astype(np.int16)
        width = np.maximum(maxv, 1)
        sym = (off + rng.integers(0, 10000, n) % width).astype(np.int16)
        esc = rng.random(n) < esc_rate
        sym[esc] = rng.integers(-3000, 3000, max(int(esc.sum()), 0)).astype(np.int16)
        group_lens = [2500, 1000, 2500]
        data = lanes_encode(sym, idx, group_lens, TABLE, lanes=lanes)
        # C mirror sanity
        np.testing.assert_array_equal(
            lanes_decode(data, idx, group_lens, TABLE, lanes=lanes), sym
        )
        # JAX LUT + small fast path
        lut = jnp.asarray(rt.build_lut(TABLE))
        states, words, byp = lanes_split(data, lanes)
        carry = rt.init_lane_state(jnp.asarray(states)[None])
        out, base = [], 0
        for gl in group_lens:
            gi = jnp.asarray(idx[base : base + gl])[None]
            carry, s = rt.decode_group(
                carry, jnp.asarray(words)[None], jnp.asarray(byp)[None],
                gi, lut, lanes=lanes, small=small,
            )
            out.append(np.asarray(s).reshape(-1))
            base += gl
        np.testing.assert_array_equal(
            np.concatenate(out).astype(np.int16), sym
        )

    def test_device_encoder_small_path_bit_exact(self):
        """encode_groups with the small fast path must emit the same lane
        words as the C encoder (mixed small/big rows, no escapes — the
        device encoder diverts escapes to the host sideband)."""
        rng = np.random.default_rng(23)
        lanes = 32
        n = 4000
        small = rt.build_small_tables(TABLE)
        idx = np.where(
            rng.random(n) < 0.9,
            rng.integers(0, 8, n),
            rng.integers(0, len(TABLE.cdf_length), n),
        ).astype(np.uint8)
        off = TABLE.offset[idx.astype(np.int64)]
        maxv = TABLE.cdf_length[idx.astype(np.int64)] - 2
        sym = (off + rng.integers(0, 10000, n) % np.maximum(maxv, 1)).astype(np.int16)
        group_lens = [1500, 2500]
        data = lanes_encode(sym, idx, group_lens, TABLE, lanes=lanes)

        enc_lut = jnp.asarray(rt.build_enc_lut(TABLE))
        states, wcounts, words = rt.encode_groups(
            jnp.asarray(sym)[None], jnp.asarray(idx)[None], enc_lut,
            lanes=lanes, group_lens=group_lens, wcap=512, small=small,
        )
        from rgbdc_tpu.coder.rans import assemble_lanes_container

        container = assemble_lanes_container(
            np.asarray(states)[0], np.asarray(wcounts)[0].astype(np.uint32),
            np.asarray(words)[0], [[] for _ in range(lanes)],
        )
        assert container == data

    @pytest.mark.parametrize("unroll", [1, 4])
    def test_encode_scan_out_bit_identical(self, unroll):
        """scan_out=True (tiny carry + one post-scan compaction scatter)
        must reproduce the classic in-scan-scatter outputs EXACTLY —
        states, word counts, and every word slot below each lane's count
        — on mixed small/big rows with escapes, batch 2."""
        rng = np.random.default_rng(31)
        lanes = 32
        n = 3000
        small = rt.build_small_tables(TABLE)
        idx = np.where(
            rng.random((2, n)) < 0.85,
            rng.integers(0, 8, (2, n)),
            rng.integers(0, len(TABLE.cdf_length), (2, n)),
        ).astype(np.uint8)
        off = TABLE.offset[idx.astype(np.int64)]
        maxv = TABLE.cdf_length[idx.astype(np.int64)] - 2
        sym = (off + rng.integers(0, 10000, (2, n)) % np.maximum(maxv, 1)).astype(
            np.int16
        )
        esc = rng.random((2, n)) < 0.03
        sym[esc] = rng.integers(-3000, 3000, int(esc.sum())).astype(np.int16)
        group_lens = [1000, 500, 1500]

        enc_lut = jnp.asarray(rt.build_enc_lut(TABLE))
        outs = []
        for scan_out in (False, True):
            outs.append(
                rt.encode_groups(
                    jnp.asarray(sym), jnp.asarray(idx), enc_lut,
                    lanes=lanes, group_lens=group_lens, wcap=512,
                    small=small, unroll=unroll, scan_out=scan_out,
                )
            )
        (st0, wc0, w0), (st1, wc1, w1) = outs
        np.testing.assert_array_equal(np.asarray(st0), np.asarray(st1))
        np.testing.assert_array_equal(np.asarray(wc0), np.asarray(wc1))
        wc = np.asarray(wc0)
        w0, w1 = np.asarray(w0), np.asarray(w1)
        for b in range(2):
            for l in range(lanes):
                np.testing.assert_array_equal(
                    w0[b, l, : wc[b, l]], w1[b, l, : wc[b, l]]
                )

    @pytest.mark.parametrize("wcap", [512, 7])
    def test_gather_compact_bit_identical(self, wcap):
        """_compact_words_gather (sort-free: compare-count + one gather)
        must reproduce the scatter compaction EXACTLY — full arrays, incl.
        the zero fill beyond each lane's count and dropped overflow words
        (wcap=7 forces overflow on busy lanes)."""
        rng = np.random.default_rng(37)
        lanes = 32
        n = 3000
        small = rt.build_small_tables(TABLE)
        idx = np.where(
            rng.random((2, n)) < 0.85,
            rng.integers(0, 8, (2, n)),
            rng.integers(0, len(TABLE.cdf_length), (2, n)),
        ).astype(np.uint8)
        off = TABLE.offset[idx.astype(np.int64)]
        maxv = TABLE.cdf_length[idx.astype(np.int64)] - 2
        sym = (off + rng.integers(0, 10000, (2, n)) % np.maximum(maxv, 1)).astype(
            np.int16
        )
        esc = rng.random((2, n)) < 0.03
        sym[esc] = rng.integers(-3000, 3000, int(esc.sum())).astype(np.int16)
        group_lens = [1000, 500, 1500]

        enc_lut = jnp.asarray(rt.build_enc_lut(TABLE))
        outs = []
        for gather in (False, True, "onehot"):
            outs.append(
                rt.encode_groups(
                    jnp.asarray(sym), jnp.asarray(idx), enc_lut,
                    lanes=lanes, group_lens=group_lens, wcap=wcap,
                    small=small, unroll=4, scan_out=True,
                    gather_compact=gather,
                )
            )
        (st0, wc0, w0) = outs[0]
        for st1, wc1, w1 in outs[1:]:
            np.testing.assert_array_equal(np.asarray(st0), np.asarray(st1))
            np.testing.assert_array_equal(np.asarray(wc0), np.asarray(wc1))
            np.testing.assert_array_equal(np.asarray(w0), np.asarray(w1))
