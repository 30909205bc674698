"""Lane-interleaved rans32 container (the wire format for a future
vectorized / on-TPU decoder): encode walks symbols in reverse with per-lane
32-bit states; the decoder walks forward consuming ONE shared word stream."""

import numpy as np
import pytest

from rgbdc_tpu.coder.rans import interleaved_decode, interleaved_encode
from rgbdc_tpu.entropy import build_gaussian_tables, get_scale_table


@pytest.fixture(scope="module")
def table():
    return build_gaussian_tables(get_scale_table())


def _symbols(rng, table, n, esc=0.0):
    idx = rng.integers(0, 64, size=n).astype(np.uint8)
    maxv = table.cdf_length[idx] - 2
    sym = (rng.integers(0, 1_000_000, size=n) % maxv + table.offset[idx]).astype(
        np.int16
    )
    if esc:
        mask = rng.random(n) < esc
        sym = np.where(
            mask, rng.integers(-20000, 20000, size=n).astype(np.int16), sym
        )
    return sym, idx


class TestInterleavedRans:
    @pytest.mark.parametrize("lanes", [4, 16, 128, 256])
    def test_roundtrip_lanes(self, table, rng, lanes):
        sym, idx = _symbols(rng, table, 20000)
        data = interleaved_encode(sym, idx, table, lanes=lanes)
        out = interleaved_decode(data, idx, table, lanes=lanes)
        np.testing.assert_array_equal(out, sym)

    def test_roundtrip_with_escapes(self, table, rng):
        sym, idx = _symbols(rng, table, 10000, esc=0.05)
        data = interleaved_encode(sym, idx, table, lanes=128)
        out = interleaved_decode(data, idx, table, lanes=128)
        np.testing.assert_array_equal(out, sym)

    def test_n_not_multiple_of_lanes(self, table, rng):
        sym, idx = _symbols(rng, table, 1001)
        data = interleaved_encode(sym, idx, table, lanes=128)
        out = interleaved_decode(data, idx, table, lanes=128)
        np.testing.assert_array_equal(out, sym)

    def test_size_overhead_vs_lifo(self, table, rng):
        """Interleaving costs only the per-lane state header vs the LIFO
        coder (compression efficiency is preserved)."""
        from rgbdc_tpu.coder import encode_with_tables

        sym, idx = _symbols(rng, table, 50000)
        lifo = encode_with_tables(sym, idx, table)
        inter = interleaved_encode(sym, idx, table, lanes=128)
        overhead = len(inter) - len(lifo)
        assert overhead < 4 * 128 + 256  # header + renorm slack
