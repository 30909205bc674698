import numpy as np
import pytest

from rgbdc_tpu.coder import (
    RansDecoder,
    RansEncoder,
    encode_with_tables,
    read_body,
    write_body,
)
from rgbdc_tpu.entropy import CdfTable, build_gaussian_tables, get_scale_table


@pytest.fixture(scope="module")
def gauss_table():
    return build_gaussian_tables(get_scale_table())


def _random_symbols(rng, table, n, escape_frac=0.0):
    idx = rng.integers(0, table.cdf.shape[0], size=n).astype(np.int32)
    max_vals = table.cdf_length[idx] - 2
    offs = table.offset[idx]
    sym = (rng.integers(0, 1_000_000, size=n) % max_vals + offs).astype(np.int32)
    if escape_frac > 0:
        esc = rng.random(n) < escape_frac
        sym = np.where(
            esc, rng.integers(-(1 << 20), 1 << 20, size=n).astype(np.int32), sym
        )
    return sym, idx


class TestRansRoundtrip:
    def test_identity_in_range(self, gauss_table, rng):
        sym, idx = _random_symbols(rng, gauss_table, 10000)
        data = encode_with_tables(sym, idx, gauss_table)
        dec = RansDecoder(data)
        out = dec.decode(idx, gauss_table)
        np.testing.assert_array_equal(out, sym)

    def test_identity_with_escapes(self, gauss_table, rng):
        sym, idx = _random_symbols(rng, gauss_table, 5000, escape_frac=0.05)
        data = encode_with_tables(sym, idx, gauss_table)
        out = RansDecoder(data).decode(idx, gauss_table)
        np.testing.assert_array_equal(out, sym)

    def test_extreme_escape_values(self, gauss_table):
        # adversarial: huge positive/negative out-of-range symbols
        idx = np.zeros(6, dtype=np.int32)  # narrowest cdf
        sym = np.array([0, 1 << 28, -(1 << 28), -1, 2, -100000], dtype=np.int32)
        data = encode_with_tables(sym, idx, gauss_table)
        out = RansDecoder(data).decode(idx, gauss_table)
        np.testing.assert_array_equal(out, sym)

    def test_streaming_multiphase(self, gauss_table, rng):
        # decode in the same chunked order as the checkerboard phases
        sym, idx = _random_symbols(rng, gauss_table, 9000, escape_frac=0.01)
        enc = RansEncoder()
        chunks = [(0, 3000), (3000, 7000), (7000, 9000)]
        for a, b in chunks:
            enc.buffer(sym[a:b], idx[a:b], gauss_table)
        data = enc.flush()
        dec = RansDecoder(data)
        for a, b in chunks:
            out = dec.decode(idx[a:b], gauss_table)
            np.testing.assert_array_equal(out, sym[a:b])

    def test_compression_ratio_sane(self, gauss_table, rng):
        # low-entropy stream (all symbols at distribution mode) compresses hard
        n = 8192
        idx = np.full(n, 8, dtype=np.int32)
        sym = np.full(n, gauss_table.offset[8] + (gauss_table.cdf_length[8] - 2) // 2,
                      dtype=np.int32)
        data = encode_with_tables(sym, idx, gauss_table)
        assert len(data) < n // 4

    def test_empty_stream(self, gauss_table):
        sym = np.zeros(0, dtype=np.int32)
        data = encode_with_tables(sym, sym, gauss_table)
        assert len(data) == 8  # just the flushed state


class TestBitstreamContainer:
    def test_roundtrip(self, tmp_path):
        strings = [[b"hello world"], [b"\x00\x01\x02", b"zz"]]
        p = tmp_path / "stream.bin"
        with open(p, "wb") as f:
            n = write_body(f, (30, 40), strings)
        assert n == p.stat().st_size
        with open(p, "rb") as f:
            out, shape = read_body(f)
        assert shape == (30, 40)
        assert out == strings


class TestCoderRegistry:
    """Backend-selection surface (reference compressai/__init__.py:22-62)."""

    def test_rans_always_available_and_default(self):
        from rgbdc_tpu.coder import (
            available_entropy_coders,
            entropy_coder_classes,
            get_entropy_coder,
        )
        from rgbdc_tpu.coder.rans import RansDecoder, RansEncoder

        assert "rans" in available_entropy_coders()
        assert get_entropy_coder() == "rans"
        enc_cls, dec_cls = entropy_coder_classes()
        assert enc_cls is RansEncoder and dec_cls is RansDecoder

    def test_set_unknown_coder_raises(self):
        from rgbdc_tpu.coder import set_entropy_coder

        with pytest.raises(ValueError, match="Invalid entropy coder"):
            set_entropy_coder("nope")

    def test_register_and_select_custom_backend(self):
        from rgbdc_tpu.coder import (
            available_entropy_coders,
            entropy_coder_classes,
            register_entropy_coder,
            set_entropy_coder,
        )

        class FakeEnc:
            pass

        class FakeDec:
            pass

        register_entropy_coder("fake", lambda: (FakeEnc, FakeDec))
        assert "fake" in available_entropy_coders()
        set_entropy_coder("fake")
        try:
            assert entropy_coder_classes() == (FakeEnc, FakeDec)
        finally:
            set_entropy_coder("rans")

    def test_codec_drivers_resolve_from_registry(self):
        # the driver constructors snapshot the registry default
        from rgbdc_tpu.coder.rans import RansDecoder, RansEncoder
        from rgbdc_tpu.models.codec import ElicCodec

        assert "RansEncoder" not in ElicCodec.__dict__  # instance attr, not class
        # smoke: attribute wiring is exercised by every roundtrip test; here
        # just confirm the names resolve via the registry import path
        from rgbdc_tpu.models.codec import entropy_coder_classes

        assert entropy_coder_classes() == (RansEncoder, RansDecoder)
