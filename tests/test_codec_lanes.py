"""On-device (lane-format) codec path: fused encode program -> lane-split
bitstreams -> ONE jitted decode program.  The decoder's y_hat must equal the
encoder's y_hat EXACTLY (fused-program analog of the shared-stage-program
bit-exact closure), and the lane path must reconstruct the same images as
the compat (host-serial) path."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from rgbdc_tpu.models import ELICUnited, UnitedCodec


def _tiny_codec():
    model = ELICUnited(N=16, M=24, slice_ch=(8, 16))
    rgb = jnp.zeros((1, 128, 128, 3), jnp.float32)
    depth = jnp.zeros((1, 128, 128, 1), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        rgb,
        depth,
        training=True,
    )
    return UnitedCodec(model, variables)


class TestLaneCodec:
    def setup_method(self, _):
        self.codec = _tiny_codec()
        rng = np.random.default_rng(0)
        self.rgb = jnp.asarray(rng.uniform(size=(2, 128, 128, 3)), jnp.float32)
        self.depth = jnp.asarray(rng.uniform(size=(2, 128, 128, 1)), jnp.float32)

    def test_roundtrip_bit_exact(self):
        out = self.codec.compress_lanes(self.rgb, self.depth)
        assert len(out["r_streams"]) == 2 and len(out["d_streams"]) == 2
        # live-index regime (default 0.11 sigma floor, untrained model):
        # sigma predictions vary per element, so the compact idx-skip pull
        # must DIVERT to the exact per-slice fallback — the path a trained
        # codec takes in serving (VERDICT r2 weak #2) — and the auto pull
        # tuner must then switch the NEXT compress to the sym5+idx format
        assert self.codec.last_fallback_slices > 0
        assert self.codec._pull_mode == "sym5idx"
        out2 = self.codec.compress_lanes(self.rgb, self.depth)
        # every slice took one of the two sym5idx-mode paths
        assert (
            self.codec.last_fast_slices + self.codec.last_fallback_slices == 4
        )
        np.testing.assert_array_equal(
            np.asarray(out2["y_hat"]["r"]), np.asarray(out["y_hat"]["r"])
        )
        for s_a, s_b in zip(out2["r_streams"], out["r_streams"]):
            assert s_a == s_b  # identical streams from either pull format
        dec = self.codec.decompress_lanes(
            out["r_streams"], out["d_streams"], out["shape"]
        )
        # the hard invariant: decoded latents identical to the encoder's
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]["r"]), np.asarray(out["y_hat"]["r"])
        )
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]["d"]), np.asarray(out["y_hat"]["d"])
        )
        assert dec["x_hat"]["r"].shape == self.rgb.shape
        assert dec["x_hat"]["d"].shape == self.depth.shape
        # prepared-decode path (prepare_decode_lanes hoists the container
        # parse + upload; opt-in for multi-link serving hosts) must drive
        # the SAME executables to the same bits
        prep = self.codec.prepare_decode_lanes(out["r_streams"], out["d_streams"])
        dec_p = self.codec.decompress_lanes(
            out["r_streams"], out["d_streams"], out["shape"], prepared=prep
        )
        np.testing.assert_array_equal(
            np.asarray(dec_p["y_hat"]["r"]), np.asarray(dec["y_hat"]["r"])
        )
        np.testing.assert_array_equal(
            np.asarray(dec_p["x_hat"]["d"]), np.asarray(dec["x_hat"]["d"])
        )

    def test_matches_compat_path(self):
        """Same model, same inputs: lane path and compat path must decode
        identical latents (they share every stage computation)."""
        lane = self.codec.compress_lanes(self.rgb, self.depth)
        compat = self.codec.compress(self.rgb, self.depth)
        np.testing.assert_array_equal(
            np.asarray(lane["y_hat"]["r"]), np.asarray(compat["y_hat"]["r"])
        )
        dec_lane = self.codec.decompress_lanes(
            lane["r_streams"], lane["d_streams"], lane["shape"]
        )
        dec_compat = self.codec.decompress(
            compat["r_strings"], compat["d_strings"], compat["shape"]
        )
        np.testing.assert_array_equal(
            np.asarray(dec_lane["x_hat"]["r"]), np.asarray(dec_compat["x_hat"]["r"])
        )
        np.testing.assert_array_equal(
            np.asarray(dec_lane["x_hat"]["d"]), np.asarray(dec_compat["x_hat"]["d"])
        )

    @pytest.mark.full
    def test_bf16_serving_path(self, monkeypatch):
        """RGBDC_BF16=1 runs analysis-front and synthesis in bfloat16 (the
        serving fast path, ~20-25% off the conv stages).  The enc/dec
        closure must STILL be bit-exact — the front only picks which
        symbols get coded, and synthesis runs after y_hat is fixed — and
        the reconstruction must stay close to the f32 compat path."""
        monkeypatch.setenv("RGBDC_BF16", "1")
        codec16 = _tiny_codec()
        assert codec16._bf16_serving
        out = codec16.compress_lanes(self.rgb, self.depth)
        dec = codec16.decompress_lanes(
            out["r_streams"], out["d_streams"], out["shape"]
        )
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]["r"]), np.asarray(out["y_hat"]["r"])
        )
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]["d"]), np.asarray(out["y_hat"]["d"])
        )
        # f32 compat reference on the same images
        compat = self.codec.compress(self.rgb, self.depth)
        dec32 = self.codec.decompress(
            compat["r_strings"], compat["d_strings"], compat["shape"]
        )
        diff = np.asarray(dec["x_hat"]["r"]) - np.asarray(dec32["x_hat"]["r"])
        rms = float(np.sqrt(np.mean(diff**2)))
        # bf16 analysis legitimately flips a few quantization decisions
        # (different-but-valid encode); on an UNTRAINED random model those
        # flips cost more than they would trained (tools/check_bf16_quality
        # pins the trained-checkpoint delta) — this is a loose sanity bound
        assert rms < 0.05, rms

    @pytest.mark.full
    def test_bf16_flow_path(self, monkeypatch):
        """RGBDC_BF16_FLOW=1 runs the fused entropy-parameter stage
        programs (context/aggregation convs + hyper decode) in bfloat16.
        Unlike RGBDC_BF16 this CHANGES mu/sigma — but encoder and decoder
        call the same compiled executables, so the closure must still be
        bit-exact, and the reconstruction must stay close to f32."""
        monkeypatch.setenv("RGBDC_BF16_FLOW", "1")
        codec16 = _tiny_codec()
        out = codec16.compress_lanes(self.rgb, self.depth)
        dec = codec16.decompress_lanes(
            out["r_streams"], out["d_streams"], out["shape"]
        )
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]["r"]), np.asarray(out["y_hat"]["r"])
        )
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]["d"]), np.asarray(out["y_hat"]["d"])
        )
        compat = self.codec.compress(self.rgb, self.depth)
        dec32 = self.codec.decompress(
            compat["r_strings"], compat["d_strings"], compat["shape"]
        )
        diff = np.asarray(dec["x_hat"]["r"]) - np.asarray(dec32["x_hat"]["r"])
        rms = float(np.sqrt(np.mean(diff**2)))
        assert rms < 0.05, rms

    @pytest.mark.full
    def test_escfix_decode_roundtrip(self, monkeypatch):
        """RGBDC_DEC_ESCFIX=1 strips the escape while_loop out of the
        decode scan (values reconstructed in the per-ordinal post-pass).
        The untrained tiny model escapes freely, so this exercises deep
        per-lane ordinals end-to-end; decode must stay bit-exact and the
        encode side (unaffected by a decode knob) must emit identical
        streams."""
        monkeypatch.setenv("RGBDC_DEC_ESCFIX", "1")
        codec_e = _tiny_codec()
        out = codec_e.compress_lanes(self.rgb, self.depth)
        ref = self.codec.compress_lanes(self.rgb, self.depth)
        assert out["r_streams"] == ref["r_streams"]
        assert out["d_streams"] == ref["d_streams"]
        dec = codec_e.decompress_lanes(
            out["r_streams"], out["d_streams"], out["shape"]
        )
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]["r"]), np.asarray(out["y_hat"]["r"])
        )
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]["d"]), np.asarray(out["y_hat"]["d"])
        )

    @pytest.mark.full
    def test_flat_upload_roundtrip(self, monkeypatch):
        """RGBDC_FLAT_UPLOAD=1 uploads each stream's words/nibbles as one
        lane-major flat array (the container's native payload order) and
        seeds each lane's cursor at its base offset.  Wire format is
        unchanged and the decode must stay bit-exact — including the
        escape/bypass nibble path (the untrained tiny model escapes
        freely)."""
        monkeypatch.setenv("RGBDC_FLAT_UPLOAD", "1")
        codec_f = _tiny_codec()
        out = codec_f.compress_lanes(self.rgb, self.depth)
        # streams must be identical to the classic codec's (encode side
        # does not depend on the upload layout)
        ref = self.codec.compress_lanes(self.rgb, self.depth)
        assert out["r_streams"] == ref["r_streams"]
        assert out["d_streams"] == ref["d_streams"]
        dec = codec_f.decompress_lanes(
            out["r_streams"], out["d_streams"], out["shape"]
        )
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]["r"]), np.asarray(out["y_hat"]["r"])
        )
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]["d"]), np.asarray(out["y_hat"]["d"])
        )

    @pytest.mark.full
    def test_onehot_wfetch_roundtrip(self, monkeypatch):
        """RGBDC_DEC_WFETCH=onehot replaces the in-scan renorm word gather
        with a compare-select-reduce over the word columns (the gather is
        ~90% of decode-scan device time on TPU, docs/PERF.md); under
        FLAT_UPLOAD one device gather unflattens the words to the fixed
        [b, lanes, WMAX] stride first.  Pure decode-side change: streams
        identical, decoded latents bit-exact, in both upload layouts and
        with the escape machinery exercised (untrained model escapes
        freely)."""
        ref = self.codec.compress_lanes(self.rgb, self.depth)
        monkeypatch.setenv("RGBDC_DEC_WFETCH", "onehot")
        for flat in ("0", "1"):
            monkeypatch.setenv("RGBDC_FLAT_UPLOAD", flat)
            c = _tiny_codec()
            out = c.compress_lanes(self.rgb, self.depth)
            assert out["r_streams"] == ref["r_streams"]
            assert out["d_streams"] == ref["d_streams"]
            dec = c.decompress_lanes(
                out["r_streams"], out["d_streams"], out["shape"]
            )
            np.testing.assert_array_equal(
                np.asarray(dec["y_hat"]["r"]), np.asarray(out["y_hat"]["r"])
            )
            np.testing.assert_array_equal(
                np.asarray(dec["y_hat"]["d"]), np.asarray(out["y_hat"]["d"])
            )

    def test_stream_sizes_reasonable(self):
        """Lane container overhead (compact v3 header) is 6 bytes/lane for
        escape-free streams (u32 state + u16 word count), 8 with the u16
        nibble counts, plus 4 header bytes and up to one padding u16 per
        lane of nibble stream; streams must not balloon vs the compat
        format."""
        lane = self.codec.compress_lanes(self.rgb, self.depth)
        compat = self.codec.compress(self.rgb, self.depth)
        lane_bytes = sum(len(s) for s in lane["r_streams"])
        compat_bytes = sum(len(s) for ss in compat["r_strings"] for s in ss)
        overhead = ((8 + 2) * UnitedCodec.LANES + 4) * len(lane["r_streams"])
        assert lane_bytes <= compat_bytes * 1.02 + overhead


class TestPackGroupsCompact:
    def test_overflow_detection(self):
        import jax.numpy as jnp

        from rgbdc_tpu.models.codec import _pack_groups, _pack_groups_i8

        sym = jnp.asarray([[5, -200, 15, -15, 300, 0]], jnp.int16)
        idx = jnp.asarray([[1, 2, 3, 4, 5, 6]], jnp.int32)
        packed, ovf, diff = _pack_groups_i8([(sym, idx)], 3)
        assert int(ovf[0]) == 2  # -200 and 300 exceed the 5-bit range
        assert int(diff[0]) == 5  # only one index equals the mode row 3
        s16, i16 = _pack_groups([(sym, idx)])
        np.testing.assert_array_equal(np.asarray(s16), np.asarray(sym))

    def test_sym5idx_variant_carries_real_indexes(self):
        import jax.numpy as jnp

        from rgbdc_tpu.models.codec import _pack_groups_i8_idx, _unpack_sym5

        sym = jnp.asarray([[5, -9, 15, -15, 3, 0]], jnp.int16)
        idx = jnp.asarray([[1, 2, 3, 4, 5, 6]], jnp.int32)
        packed, ovf, idx_u8 = _pack_groups_i8_idx([(sym, idx)])
        assert int(np.asarray(ovf).max()) == 0
        np.testing.assert_array_equal(
            _unpack_sym5(np.asarray(packed), 6), np.asarray(sym)
        )
        np.testing.assert_array_equal(
            np.asarray(idx_u8), np.asarray(idx).astype(np.uint8)
        )

    def test_no_overflow_roundtrips_through_5bit(self):
        import jax.numpy as jnp

        from rgbdc_tpu.models.codec import _pack_groups_i8, _unpack_sym5

        rng = np.random.default_rng(0)
        for n in (63, 64, 65):  # pad remainders 0/2/1
            sym = jnp.asarray(rng.integers(-15, 16, (2, n)), jnp.int16)
            idx = jnp.asarray(np.full((2, n), 41), jnp.int32)
            packed, ovf, diff = _pack_groups_i8([(sym, idx)], 41)
            assert int(np.asarray(ovf).max()) == 0
            assert int(np.asarray(diff).max()) == 0
            got = _unpack_sym5(np.asarray(packed), n)
            np.testing.assert_array_equal(got, np.asarray(sym))


class TestDeviceEncodePath:
    def test_roundtrip_bit_exact(self, monkeypatch):
        """compress_lanes with the ON-DEVICE encoder must produce streams
        the fused decoder reproduces bit-exactly (incl. the escape slow
        path — the un-floored tiny model escapes freely)."""
        monkeypatch.setenv("RGBDC_DEVICE_ENCODE", "1")
        import jax
        import jax.numpy as jnp

        from rgbdc_tpu.models import ELICUnited, UnitedCodec

        model = ELICUnited(N=16, M=24, slice_ch=(8, 16))
        v = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            jnp.zeros((1, 128, 128, 3)), jnp.zeros((1, 128, 128, 1)),
            training=True,
        )
        codec = UnitedCodec(model, v)
        rng = np.random.default_rng(5)
        rgb = jnp.asarray(rng.uniform(size=(2, 128, 128, 3)), jnp.float32)
        depth = jnp.asarray(rng.uniform(size=(2, 128, 128, 1)), jnp.float32)
        out = codec.compress_lanes(rgb, depth)
        dec = codec.decompress_lanes(out["r_streams"], out["d_streams"], out["shape"])
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]["r"]), np.asarray(out["y_hat"]["r"])
        )
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]["d"]), np.asarray(out["y_hat"]["d"])
        )

    @pytest.mark.full
    def test_fuse_slices_streams_byte_identical(self, monkeypatch):
        """RGBDC_FUSE_SLICES=1 on the united path (z + all slices as ONE
        executable per direction — the cold-compile lever, docs/PERF.md
        round 4) must produce byte-identical streams to the per-slice
        dispatch flow and decode bit-exactly."""
        monkeypatch.setenv("RGBDC_DEVICE_ENCODE", "1")
        import jax
        import jax.numpy as jnp

        from rgbdc_tpu.models import ELICUnited, UnitedCodec

        model = ELICUnited(N=16, M=24, slice_ch=(8, 16))
        v = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            jnp.zeros((1, 128, 128, 3)), jnp.zeros((1, 128, 128, 1)),
            training=True,
        )
        rng = np.random.default_rng(7)
        rgb = jnp.asarray(rng.uniform(size=(2, 128, 128, 3)), jnp.float32)
        depth = jnp.asarray(rng.uniform(size=(2, 128, 128, 1)), jnp.float32)
        ref = UnitedCodec(model, v).compress_lanes(rgb, depth)
        monkeypatch.setenv("RGBDC_FUSE_SLICES", "1")
        codec = UnitedCodec(model, v)
        out = codec.compress_lanes(rgb, depth)
        assert out["r_streams"] == ref["r_streams"]
        assert out["d_streams"] == ref["d_streams"]
        dec = codec.decompress_lanes(
            out["r_streams"], out["d_streams"], out["shape"]
        )
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]["r"]), np.asarray(out["y_hat"]["r"])
        )
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]["d"]), np.asarray(out["y_hat"]["d"])
        )

    def test_fuse_slices_host_encode_shared_program(self, monkeypatch):
        """FUSE_SLICES=1 with HOST encode (RGBDC_DEVICE_ENCODE=0, the
        library default): the pack path must run the same single fused
        executable the decoder runs (advisor r4 — per-slice encode
        programs against a fused decode program would break the
        shared-stage-program invariant).  Streams must stay byte-identical
        to the per-slice host-encode flow and decode bit-exactly."""
        monkeypatch.delenv("RGBDC_DEVICE_ENCODE", raising=False)
        import jax
        import jax.numpy as jnp

        from rgbdc_tpu.models import ELICUnited, UnitedCodec

        model = ELICUnited(N=16, M=24, slice_ch=(8, 16))
        v = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            jnp.zeros((1, 128, 128, 3)), jnp.zeros((1, 128, 128, 1)),
            training=True,
        )
        rng = np.random.default_rng(13)
        rgb = jnp.asarray(rng.uniform(size=(2, 128, 128, 3)), jnp.float32)
        depth = jnp.asarray(rng.uniform(size=(2, 128, 128, 1)), jnp.float32)
        ref = UnitedCodec(model, v).compress_lanes(rgb, depth)
        monkeypatch.setenv("RGBDC_FUSE_SLICES", "1")
        codec = UnitedCodec(model, v)
        out = codec.compress_lanes(rgb, depth)
        assert out["r_streams"] == ref["r_streams"]
        assert out["d_streams"] == ref["d_streams"]
        dec = codec.decompress_lanes(
            out["r_streams"], out["d_streams"], out["shape"]
        )
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]["r"]), np.asarray(out["y_hat"]["r"])
        )
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]["d"]), np.asarray(out["y_hat"]["d"])
        )

    @pytest.mark.full
    def test_scan_out_streams_byte_identical(self, monkeypatch):
        """RGBDC_ENC_SCANOUT=1 (scan-output encoder: tiny carry + one
        post-scan compaction scatter) must produce byte-identical streams
        to the classic in-scan-scatter encoder."""
        monkeypatch.setenv("RGBDC_DEVICE_ENCODE", "1")
        import jax
        import jax.numpy as jnp

        from rgbdc_tpu.models import ELICUnited, UnitedCodec

        model = ELICUnited(N=16, M=24, slice_ch=(8, 16))
        v = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            jnp.zeros((1, 128, 128, 3)), jnp.zeros((1, 128, 128, 1)),
            training=True,
        )
        rng = np.random.default_rng(11)
        rgb = jnp.asarray(rng.uniform(size=(2, 128, 128, 3)), jnp.float32)
        depth = jnp.asarray(rng.uniform(size=(2, 128, 128, 1)), jnp.float32)

        classic = UnitedCodec(model, v)
        out_c = classic.compress_lanes(rgb, depth)
        monkeypatch.setenv("RGBDC_ENC_SCANOUT", "1")
        scano = UnitedCodec(model, v)
        out_o = scano.compress_lanes(rgb, depth)
        assert out_o["r_streams"] == out_c["r_streams"]
        assert out_o["d_streams"] == out_c["d_streams"]
        dec = scano.decompress_lanes(
            out_o["r_streams"], out_o["d_streams"], out_o["shape"]
        )
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]["r"]), np.asarray(out_o["y_hat"]["r"])
        )

    @pytest.mark.full
    def test_gcompact_streams_byte_identical(self, monkeypatch):
        """RGBDC_ENC_GCOMPACT=1 (sort-free gather compaction of the word
        streams AND the escape sideband) must produce byte-identical
        streams to the scatter versions, and roundtrip."""
        monkeypatch.setenv("RGBDC_DEVICE_ENCODE", "1")
        monkeypatch.setenv("RGBDC_ENC_SCANOUT", "1")
        import jax
        import jax.numpy as jnp

        from rgbdc_tpu.models import ELICUnited, UnitedCodec

        model = ELICUnited(N=16, M=24, slice_ch=(8, 16))
        v = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            jnp.zeros((1, 128, 128, 3)), jnp.zeros((1, 128, 128, 1)),
            training=True,
        )
        rng = np.random.default_rng(23)
        rgb = jnp.asarray(rng.uniform(size=(2, 128, 128, 3)), jnp.float32)
        depth = jnp.asarray(rng.uniform(size=(2, 128, 128, 1)), jnp.float32)

        scatter = UnitedCodec(model, v)
        scatter.ESC_CAP = 1 << 16  # keep the compacted-sideband path
        out_s = scatter.compress_lanes(rgb, depth)
        assert scatter.last_esc_path == "sideband"
        monkeypatch.setenv("RGBDC_ENC_GCOMPACT", "1")
        gc = UnitedCodec(model, v)
        gc.ESC_CAP = 1 << 16
        out_g = gc.compress_lanes(rgb, depth)
        assert gc.last_esc_path == "sideband"
        assert out_g["r_streams"] == out_s["r_streams"]
        assert out_g["d_streams"] == out_s["d_streams"]
        dec = gc.decompress_lanes(
            out_g["r_streams"], out_g["d_streams"], out_g["shape"]
        )
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]["r"]), np.asarray(out_g["y_hat"]["r"])
        )

    def test_escape_sideband_and_full_fallback(self, monkeypatch):
        """The two escape host-assembly paths (compacted sideband vs full
        wire-tensor pull) must produce byte-identical streams: the sideband
        is a pure pull-size optimization (~100 KB vs ~40 MB)."""
        monkeypatch.setenv("RGBDC_DEVICE_ENCODE", "1")
        import jax
        import jax.numpy as jnp

        from rgbdc_tpu.models import ELICUnited, UnitedCodec

        model = ELICUnited(N=16, M=24, slice_ch=(8, 16))
        v = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            jnp.zeros((1, 128, 128, 3)), jnp.zeros((1, 128, 128, 1)),
            training=True,
        )
        rng = np.random.default_rng(7)
        rgb = jnp.asarray(rng.uniform(size=(2, 128, 128, 3)), jnp.float32)
        depth = jnp.asarray(rng.uniform(size=(2, 128, 128, 1)), jnp.float32)

        side = UnitedCodec(model, v)
        side.ESC_CAP = 1 << 16  # force the compacted-sideband path
        out_s = side.compress_lanes(rgb, depth)
        assert side.last_esc_path == "sideband"
        # second compress takes the SPECULATIVE words pull (previous
        # batch's bucket width) — streams must be identical
        out_s2 = side.compress_lanes(rgb, depth)
        assert out_s2["r_streams"] == out_s["r_streams"]
        assert out_s2["d_streams"] == out_s["d_streams"]

        full = UnitedCodec(model, v)
        full.ESC_CAP = 0  # force the full-pull fallback
        out_f = full.compress_lanes(rgb, depth)
        assert full.last_esc_path == "full"

        assert out_s["r_streams"] == out_f["r_streams"]
        assert out_s["d_streams"] == out_f["d_streams"]
        dec = side.decompress_lanes(
            out_s["r_streams"], out_s["d_streams"], out_s["shape"]
        )
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]["r"]), np.asarray(out_s["y_hat"]["r"])
        )

    @pytest.mark.full
    def test_dense_capped_tables(self, monkeypatch):
        """RGBDC_DENSE128=1: every CDF row capped so the dense one-hot path
        covers the whole table (LUTs replaced by dummies).  Streams CHANGE
        vs the uncapped baseline (folded tails escape), but host and device
        encoders must stay byte-identical to each other under the knob and
        the decoder bit-exact — including with escfix stacked on top."""
        monkeypatch.setenv("RGBDC_DENSE128", "1")
        import jax
        import jax.numpy as jnp

        from rgbdc_tpu.models import ELICUnited, UnitedCodec

        model = ELICUnited(N=16, M=24, slice_ch=(8, 16))
        v = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            jnp.zeros((1, 128, 128, 3)), jnp.zeros((1, 128, 128, 1)),
            training=True,
        )
        rng = np.random.default_rng(31)
        rgb = jnp.asarray(rng.uniform(size=(2, 128, 128, 3)), jnp.float32)
        depth = jnp.asarray(rng.uniform(size=(2, 128, 128, 1)), jnp.float32)

        host = UnitedCodec(model, v)
        out_h = host.compress_lanes(rgb, depth)
        dec_h = host.decompress_lanes(
            out_h["r_streams"], out_h["d_streams"], out_h["shape"]
        )
        np.testing.assert_array_equal(
            np.asarray(dec_h["y_hat"]["r"]), np.asarray(out_h["y_hat"]["r"])
        )
        np.testing.assert_array_equal(
            np.asarray(dec_h["y_hat"]["d"]), np.asarray(out_h["y_hat"]["d"])
        )

        monkeypatch.setenv("RGBDC_DEVICE_ENCODE", "1")
        monkeypatch.setenv("RGBDC_DEC_ESCFIX", "1")
        dev = UnitedCodec(model, v)
        out_d = dev.compress_lanes(rgb, depth)
        assert out_d["r_streams"] == out_h["r_streams"]
        assert out_d["d_streams"] == out_h["d_streams"]
        dec_d = dev.decompress_lanes(
            out_d["r_streams"], out_d["d_streams"], out_d["shape"]
        )
        np.testing.assert_array_equal(
            np.asarray(dec_d["y_hat"]["r"]), np.asarray(out_d["y_hat"]["r"])
        )
        np.testing.assert_array_equal(
            np.asarray(dec_d["y_hat"]["d"]), np.asarray(out_d["y_hat"]["d"])
        )

    @pytest.mark.full
    def test_pallas_stack_streams_and_closure(self, monkeypatch):
        """The full Pallas serving stack (DENSE128 + ESCFIX + DEC_PALLAS +
        ENC_PALLAS, interpret mode on CPU): streams must be byte-identical
        to the dense XLA stack (the kernels are drop-in scan backends) and
        the decode bit-exact."""
        monkeypatch.setenv("RGBDC_DEVICE_ENCODE", "1")
        monkeypatch.setenv("RGBDC_DENSE128", "1")
        monkeypatch.setenv("RGBDC_DEC_ESCFIX", "1")
        import jax
        import jax.numpy as jnp

        from rgbdc_tpu.models import ELICUnited, UnitedCodec

        model = ELICUnited(N=16, M=24, slice_ch=(8, 16))
        v = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            jnp.zeros((1, 128, 128, 3)), jnp.zeros((1, 128, 128, 1)),
            training=True,
        )
        rng = np.random.default_rng(37)
        rgb = jnp.asarray(rng.uniform(size=(2, 128, 128, 3)), jnp.float32)
        depth = jnp.asarray(rng.uniform(size=(2, 128, 128, 1)), jnp.float32)

        xla = UnitedCodec(model, v)
        out_x = xla.compress_lanes(rgb, depth)

        monkeypatch.setenv("RGBDC_PALLAS_INTERPRET", "1")
        monkeypatch.setenv("RGBDC_DEC_PALLAS", "1")
        monkeypatch.setenv("RGBDC_ENC_PALLAS", "1")
        pal = UnitedCodec(model, v)
        out_p = pal.compress_lanes(rgb, depth)
        assert out_p["r_streams"] == out_x["r_streams"]
        assert out_p["d_streams"] == out_x["d_streams"]
        dec_p = pal.decompress_lanes(
            out_p["r_streams"], out_p["d_streams"], out_p["shape"]
        )
        np.testing.assert_array_equal(
            np.asarray(dec_p["y_hat"]["r"]), np.asarray(out_p["y_hat"]["r"])
        )
        np.testing.assert_array_equal(
            np.asarray(dec_p["y_hat"]["d"]), np.asarray(out_p["y_hat"]["d"])
        )

    @pytest.mark.full
    def test_full_serving_config_combined(self, monkeypatch):
        """All serving knobs ON together (DEVICE_ENCODE + ENC_SCANOUT +
        FLAT_UPLOAD + BF16_FLOW): the combination must hold the bit-exact
        closure, and the two layout-only knobs (scan-out encoder, flat
        upload) must leave the streams byte-identical to the plain
        device-encode f32 baseline when BF16_FLOW is off."""
        monkeypatch.setenv("RGBDC_DEVICE_ENCODE", "1")
        import jax
        import jax.numpy as jnp

        from rgbdc_tpu.models import ELICUnited, UnitedCodec

        model = ELICUnited(N=16, M=24, slice_ch=(8, 16))
        v = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            jnp.zeros((1, 128, 128, 3)), jnp.zeros((1, 128, 128, 1)),
            training=True,
        )
        rng = np.random.default_rng(13)
        rgb = jnp.asarray(rng.uniform(size=(2, 128, 128, 3)), jnp.float32)
        depth = jnp.asarray(rng.uniform(size=(2, 128, 128, 1)), jnp.float32)

        base = UnitedCodec(model, v)
        out_b = base.compress_lanes(rgb, depth)

        monkeypatch.setenv("RGBDC_ENC_SCANOUT", "1")
        monkeypatch.setenv("RGBDC_FLAT_UPLOAD", "1")
        layout = UnitedCodec(model, v)
        out_l = layout.compress_lanes(rgb, depth)
        assert out_l["r_streams"] == out_b["r_streams"]
        assert out_l["d_streams"] == out_b["d_streams"]
        dec_l = layout.decompress_lanes(
            out_l["r_streams"], out_l["d_streams"], out_l["shape"]
        )
        np.testing.assert_array_equal(
            np.asarray(dec_l["y_hat"]["r"]), np.asarray(out_l["y_hat"]["r"])
        )
        np.testing.assert_array_equal(
            np.asarray(dec_l["y_hat"]["d"]), np.asarray(out_l["y_hat"]["d"])
        )

        monkeypatch.setenv("RGBDC_BF16_FLOW", "1")
        allon = UnitedCodec(model, v)
        out_a = allon.compress_lanes(rgb, depth)
        dec_a = allon.decompress_lanes(
            out_a["r_streams"], out_a["d_streams"], out_a["shape"]
        )
        np.testing.assert_array_equal(
            np.asarray(dec_a["y_hat"]["r"]), np.asarray(out_a["y_hat"]["r"])
        )
        np.testing.assert_array_equal(
            np.asarray(dec_a["y_hat"]["d"]), np.asarray(out_a["y_hat"]["d"])
        )

        # The bench.py default serving set (DEVICE_ENCODE + ENC_SCANOUT +
        # FLAT_UPLOAD + DENSE128 + DEC_ESCFIX, BF16_FLOW off): closure must
        # hold.  Streams are NOT compared to the uncapped baseline here —
        # cap_table folds wide-row tails into the escape interval, which is
        # a different (valid) wire for synthetic random-weight content.
        monkeypatch.setenv("RGBDC_BF16_FLOW", "0")
        monkeypatch.setenv("RGBDC_DENSE128", "1")
        monkeypatch.setenv("RGBDC_DEC_ESCFIX", "1")
        benchset = UnitedCodec(model, v)
        out_s = benchset.compress_lanes(rgb, depth)
        dec_s = benchset.decompress_lanes(
            out_s["r_streams"], out_s["d_streams"], out_s["shape"]
        )
        np.testing.assert_array_equal(
            np.asarray(dec_s["y_hat"]["r"]), np.asarray(out_s["y_hat"]["r"])
        )
        np.testing.assert_array_equal(
            np.asarray(dec_s["y_hat"]["d"]), np.asarray(out_s["y_hat"]["d"])
        )

        # + the one-hot renorm word fetch on top of the bench set: a pure
        # decode-side lowering change — streams byte-identical, closure
        # holds
        monkeypatch.setenv("RGBDC_DEC_WFETCH", "onehot")
        onehot = UnitedCodec(model, v)
        out_o = onehot.compress_lanes(rgb, depth)
        assert out_o["r_streams"] == out_s["r_streams"]
        assert out_o["d_streams"] == out_s["d_streams"]
        dec_o = onehot.decompress_lanes(
            out_o["r_streams"], out_o["d_streams"], out_o["shape"]
        )
        np.testing.assert_array_equal(
            np.asarray(dec_o["y_hat"]["r"]), np.asarray(out_o["y_hat"]["r"])
        )
        np.testing.assert_array_equal(
            np.asarray(dec_o["y_hat"]["d"]), np.asarray(out_o["y_hat"]["d"])
        )
