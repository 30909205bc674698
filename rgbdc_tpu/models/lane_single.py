"""Lane-format (fully on-device) serving path for single-latent codecs.

``SingleLaneCodec`` gives the ``ElicCodec`` family (ELIC, Cheng2020-ckbd —
reference models/elic.py:172-329, any model exposing the
decode_anchor/decode_nonanchor/merge_slice stage surface) the same serving
path the flagship ``UnitedCodec`` uses: ONE lane-split rans32 stream per
image, fused per-slice stage programs shared bit-exactly by encoder and
decoder (runtime ``is_decode`` branch), the on-device reverse-scan encoder
with the compacted escape sideband, and every serving knob of the united
path (RGBDC_DENSE128 / DEC_ESCFIX / DEC_WFETCH / ENC_SCANOUT /
ENC_GCOMPACT / FLAT_UPLOAD / BF16 / WMAX...).

Wire format: one lane container per image carrying the z symbols followed
by the per-slice (anchor, nonanchor) y groups in coding order — the
single-modality half of the united lane format, byte-compatible with the
same container/assembly helpers (coder/rans.py).

Unlike the united path there is no host C-encoder variant: encoding is
always on-device (the compat host path is ``ElicCodec.compress``, which
stays the reference-parity format).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from .lane_base import LaneServingBase


class SingleLaneCodec(LaneServingBase):
    """Mixin adding compress_lanes/decompress_lanes to single-latent codec
    drivers (self.model / self.variables / self.tables provided by the
    driver's __init__, e.g. ElicCodec)."""

    EB_NAME = "entropy_bottleneck"
    # subclasses whose models do not expose the required stage surface may
    # opt out; calling the lane path there raises instead of desyncing
    LANE_SERVING = True
    _LUT_ATTRS = ("_lut", "_enc_lut")

    def _lane_setup(self):
        if getattr(self, "_lane_ready", False):
            return
        if not self.LANE_SERVING:
            raise NotImplementedError(
                f"{type(self).__name__} does not support the lane serving "
                "path (model lacks the plain ELIC stage surface)"
            )
        self._bind_coder()
        self._lane_knobs()
        _rt = self._rt

        # combined table: rows [0,64) = gaussian conditional, rows [64,..)
        # = the entropy bottleneck (z indexes = 64 + channel)
        self._comb = _rt.combine_tables(
            self.tables.gc, self.tables.eb[self.EB_NAME]
        )
        if self._dense:
            self._comb = _rt.cap_table(self._comb, self._dense_cap)

        put = (
            (lambda x: jax.device_put(x, self._replicated))
            if self._batch_sharding is not None
            else jax.device_put
        )
        if self._dense:
            # all rows ride the dense path: the packed LUTs are never
            # gathered (the big-row while_loops run zero iterations)
            self._lut = put(jnp.zeros((1, 2), jnp.uint32))
            cap_len = int(self._comb.cdf_length.max())
            self._small = _rt.build_small_tables(
                self._comb, k_cap=cap_len, r_max=1 << 30
            )
            assert self._small[3] == self._comb.cdf.shape[0]
            # y-group decode tables: y indexes are always gaussian rows
            # (< 64), so the y scans' one-hot needs only that prefix
            y_rows = self.tables.gc.cdf.shape[0]
            s = self._small
            self._small_yp = (s[0][:y_rows], s[1][:y_rows], s[2][:y_rows], y_rows)
            self._enc_lut = put(jnp.zeros((1,), jnp.uint32))
        else:
            kcap = int(os.environ.get("RGBDC_SMALL_KCAP", "40"))
            self._small = _rt.build_small_tables(self._comb, k_cap=kcap)
            self._small_yp = self._small
            self._lut = put(jnp.asarray(_rt.build_lut(self._comb)))
            self._enc_lut = put(jnp.asarray(_rt.build_enc_lut(self._comb)))
        self._row_off = np.asarray(self._comb.offset, np.int32)
        self._row_maxv = np.asarray(self._comb.cdf_length - 2, np.int32)

        if self._escfix_on:
            escfix = (jnp.asarray(self._row_off), jnp.asarray(self._row_maxv))
        else:
            escfix = None
        self._escfix = escfix

        lanes = self.LANES
        model = self.model
        mt = type(model)
        n = model.N
        # numpy (STATIC) so build_indexes can unroll its compare-sum
        st = np.asarray(self.tables.scale_table, dtype=np.float32)
        dec_pallas = self._dec_pallas
        flow16 = self._flow16

        def _to16(t):
            return jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32
                else x,
                t,
            )

        def _to32(t):
            return jax.tree.map(
                lambda x: x.astype(jnp.float32)
                if hasattr(x, "dtype") and x.dtype == jnp.bfloat16
                else x,
                t,
            )

        def sapply(v, *args, method):
            if not flow16:
                return model.apply(v, *args, method=method)
            return _to32(model.apply(_to16(v), *_to16(args), method=method))

        def dec_group(st3, words, byp, idx, lut, small=None):
            b = idx.shape[0]
            carry = _rt.LaneState(*st3)
            carry, flat = _rt.decode_group(
                carry, words, byp, idx.astype(jnp.int32).reshape(b, -1),
                lut, lanes, small=small, escfix=escfix,
                pallas=dec_pallas, unroll=self._dec_unroll,
                wfetch1h=self._wfetch1h,
            )
            return tuple(carry), flat.reshape(idx.shape).astype(jnp.int16)

        small_y = self._small_yp if self._dense else self._small
        z_small = self._small if self._dense else None

        def fused_z(v, st3, words, byp, z_enc, is_decode, lut):
            """z scan (decode mode) + the hyper-decode program."""
            b, zh, zw, _ = z_enc.shape
            c = jnp.arange(n, dtype=jnp.int32) + 64
            zidx = jnp.broadcast_to(c, (b, zh, zw, n)).reshape(b, -1)

            def dec():
                carry = _rt.LaneState(*st3)
                # z stays on the XLA scan even under RGBDC_DEC_PALLAS
                # (see the united codec's rationale: 2-4% of symbols)
                carry, flat = _rt.decode_group(
                    carry, words, byp, zidx, lut, lanes, escfix=escfix,
                    small=z_small, unroll=self._dec_unroll,
                    wfetch1h=self._wfetch1h,
                )
                return tuple(carry), flat.reshape(b, zh, zw, n)

            st3_out, z = jax.lax.cond(
                is_decode, dec, lambda: (st3, z_enc)
            )
            hyper = sapply(v, z, method=mt.hyper_decode)
            return st3_out, z, hyper

        jfz = jax.jit(fused_z)
        self._fused_z_body = fused_z
        self._fused_z1 = lambda v, *a: jfz(v, *a, self._lut)
        self._build_slice_programs(sapply, dec_group, small_y, st)
        self._make_pad_to()

        # bf16 serving variants of the conv-heavy stages (RGBDC_BF16=1).
        # Encoder-side analysis just picks which symbols get coded and
        # synthesis runs after y_hat is already bit-exact, so the enc/dec
        # closure is untouched (same rationale as the united codec).
        self._bf16_serving = os.environ.get("RGBDC_BF16", "0") == "1"
        self._build_serving_front_synth(_to16)
        self._lane_ready = True

    # -- front/synth hooks (subclass: conditioned codecs) ----------------------

    def _build_serving_front_synth(self, _to16):
        model = self.model
        mt = type(model)

        def _front16(v, x):
            y, z_sym = model.apply(
                _to16(v), x.astype(jnp.bfloat16), method=mt.encode_front
            )
            return y.astype(jnp.float32), z_sym

        def _synth16(v, y):
            out = model.apply(
                _to16(v), y.astype(jnp.bfloat16), method=mt.synthesize
            )
            if isinstance(out, tuple):
                return tuple(x.astype(jnp.float32) for x in out)
            return out.astype(jnp.float32)

        self._encode_front_srv = (
            jax.jit(_front16) if self._bf16_serving else self._encode_front
        )
        self._synth_lane_srv = (
            jax.jit(_synth16) if self._bf16_serving else self._synth
        )

    def _lane_front(self, v, x, cond):
        """(y, z_sym, side-info-or-None) for the encode direction; ``cond``
        is the extra conditioning the public signature threads through
        (empty for plain single-latent codecs)."""
        if cond:
            raise TypeError(
                f"{type(self).__name__} takes no conditioning inputs "
                f"(got {len(cond)}); only cascade codecs "
                "(MasterLaneCodec) accept cond"
            )
        y, z_sym = self._encode_front_srv(v, x)
        return y, z_sym, None

    def _side_to_host(self, side):
        raise NotImplementedError  # only conditioned codecs emit side info

    def _lane_synth(self, v, y_hat, cond, side_info):
        return self._synth_lane_srv(v, y_hat)

    def _build_slice_programs(self, sapply, dec_group, small_y, st):
        """Build the jitted fused per-slice programs (subclass hook: the
        group schedule is model-specific).  ELIC schedule: two groups per
        slice (anchor, nonanchor) with the checkerboard context between."""
        model = self.model
        mt = type(model)

        def fused_slice(v, i, prev, hyper, y, st3, words, byp, is_decode,
                        lut):
            """One slice of the 2-group schedule: stage params + symbol
            source (scan decode OR quantize-from-y) for both groups."""
            idx_a, mn_a, ch_ctx = sapply(
                v, i, prev, hyper, st, method=mt.decode_anchor
            )
            st3, sym_a = jax.lax.cond(
                is_decode,
                lambda: dec_group(st3, words, byp, idx_a, lut, small_y),
                lambda: (st3,
                         model.apply(v, i, y, mn_a, method=mt.anchor_symbols)),
            )
            idx_na, mn_na, anchor_hat = sapply(
                v, i, sym_a, mn_a, ch_ctx, hyper, st,
                method=mt.decode_nonanchor,
            )
            st3, sym_na = jax.lax.cond(
                is_decode,
                lambda: dec_group(st3, words, byp, idx_na, lut, small_y),
                lambda: (st3,
                         model.apply(v, i, y, mn_na, method=mt.nonanchor_symbols)),
            )
            y_hat_slice = model.apply(
                v, anchor_hat, sym_na, mn_na, method=mt.merge_slice
            )
            return (y_hat_slice, st3, (sym_a, idx_a), (sym_na, idx_na))

        self._slice_body = fused_slice

        def make_fs(i):
            f = jax.jit(lambda v, *a: fused_slice(v, i, *a))
            return lambda v, *a: f(v, *a, self._lut)

        self._fused_slice1 = {
            i: make_fs(i) for i in range(len(model.slice_ch))
        }

    def _fused_flow_single(self, v, y, z_sym, st3, words, byp, is_decode):
        """Drive the fused programs over all slices (one modality).  Each
        slice program returns (y_hat_slice, st3, *groups) — two groups for
        the ELIC checkerboard schedule, one for the channel-AR schedule.
        RGBDC_FUSE_SLICES=1 runs the identical flow as ONE executable."""
        if self._fuse_all:
            return self._fused_flow_all(v, y, z_sym, st3, words, byp,
                                        is_decode)
        st3, z, hyper = self._fused_z1(v, st3, words, byp, z_sym, is_decode)
        prev, groups = [], []
        for i in range(len(self.model.slice_ch)):
            out = self._fused_slice1[i](
                v, tuple(prev), hyper, y, st3, words, byp, is_decode
            )
            y_hat_slice, st3 = out[0], out[1]
            prev.append(y_hat_slice)
            groups += list(out[2:])
        return z, groups, prev

    def _fused_flow_all(self, v, y, z_sym, st3, words, byp, is_decode):
        """Single-program slice flow (RGBDC_FUSE_SLICES=1): the z program
        and every fused slice body traced into ONE executable — the exact
        op sequence of the per-slice dispatch loop, so the enc/dec closure
        is preserved by construction (both directions run this same
        executable, is_decode branch inside)."""
        prog = getattr(self, "_fuse_all_prog", None)
        if prog is None:
            z_body = self._fused_z_body
            s_body = self._slice_body
            nsl = len(self.model.slice_ch)

            @jax.jit
            def whole(v, y, z_sym, st3, words, byp, is_decode, lut):
                st3, z, hyper = z_body(
                    v, st3, words, byp, z_sym, is_decode, lut
                )
                prev, groups = [], []
                for i in range(nsl):
                    out = s_body(
                        v, i, tuple(prev), hyper, y, st3, words, byp,
                        is_decode, lut,
                    )
                    prev.append(out[0])
                    st3 = out[1]
                    groups.append(list(out[2:]))
                return z, groups, prev

            prog = self._fuse_all_prog = whole
        z, groups, prev = prog(
            v, y, z_sym, st3, words, byp, is_decode, self._lut
        )
        return z, [g for gs in groups for g in gs], prev

    def _dev_enc_single(self, b, zshape, group_lens):
        """Jitted single-stream device encoder (z + y groups in coding
        order -> reverse-scan rans32 words + compacted escape sideband)."""
        key = (b, zshape, tuple(group_lens))
        cache = getattr(self, "_dev_enc_cache1", {})
        if key in cache:
            return cache[key]
        n = self.model.N
        zh, zw = zshape
        all_lens = [zh * zw * n] + [int(g) for g in group_lens]
        one = self._mk_stream_encoder(b, zh, zw, n, all_lens)
        if self._dense:
            small, small_z = self._small_yp, self._small
        else:
            small, small_z = self._small, None
        off, mv = self._row_off, self._row_maxv

        jone = jax.jit(
            lambda z, groups, lut: one(z, groups, lut, off, mv, small, small_z)
        )
        fn = lambda z, groups: jone(z, tuple(groups), self._enc_lut)
        cache[key] = (fn, all_lens)
        self._dev_enc_cache1 = cache
        return fn, all_lens

    def compress_lanes(self, x, *cond) -> dict:
        """Encode into the lane-split wire format: ONE stream per image,
        fully on-device (fused stage programs + reverse-scan encoder);
        only ~stream-sized bytes cross the host link.  ``cond`` is extra
        conditioning for cascade codecs (MasterLaneCodec: the decoded aux
        image); plain codecs take none."""
        from .codec import _pack_groups, _start_host_copy, eb_channel_indexes

        self._lane_setup()
        v = self.variables
        x = self._put_batch(x)
        cond = self._put_batch(cond)
        y, z_sym, side = self._lane_front(v, x, cond)
        if side is not None:
            _start_host_copy(side)
        b = x.shape[0]
        st3, zw_, zb_ = self._dummy_lane_inputs(b)
        z2, groups, prev = self._fused_flow_single(
            v, y, z_sym, st3, zw_, zb_, jnp.asarray(False)
        )
        y_hat = jnp.concatenate(prev, axis=-1)
        y_lens = [int(np.prod(g[0].shape[1:])) for g in groups]
        zshape = (int(z_sym.shape[1]), int(z_sym.shape[2]))
        enc_fn, all_lens = self._dev_enc_single(b, zshape, y_lens)
        s, wc, words, esc, pos, pack = enc_fn(z2, groups)
        _start_host_copy((s, wc, esc, pos, pack))

        # speculative words pull at the previous batch's bucket width
        # (same overlap trick as the united codec: the transfer rides the
        # link while the counts round-trip; a miss just re-pulls)
        wb_spec = getattr(self, "_last_wb1", None)
        spec_words = None
        if wb_spec is not None:
            spec_words = _start_host_copy(self._slicer(wb_spec)(words))

        s, wc, esc = jax.device_get((s, wc, esc))
        wmax_used = int(wc.max())
        if wmax_used > self.WMAX:
            raise ValueError(
                f"device encoder needs {wmax_used} words/lane > "
                f"RGBDC_WMAX={self.WMAX}; raise the env var"
            )
        wb = min(-(-max(wmax_used, 1) // self.WORD_BUCKET) * self.WORD_BUCKET,
                 self.WMAX)
        if wb_spec is not None and wmax_used <= wb_spec:
            wb = wb_spec
            words_h = jax.device_get(spec_words)
        else:
            words_h = jax.device_get(self._slicer(wb)(words))
        self._last_wb1 = wb

        esc_info = None
        self.last_esc_path = None
        if int(esc.sum()):
            if int(esc.max()) <= self.ESC_CAP:
                self.last_esc_path = "sideband"
                from ..coder.rans_tpu import escape_chunks_at

                pos_h, pack_h = jax.device_get((pos, pack))
                esc_info = []
                for i in range(b):
                    c = int(esc[i])
                    pk = pack_h[i][:c]
                    sym = (pk & 0xFFFF).astype(np.uint16).view(np.int16)
                    idx = (pk >> 16).astype(np.uint8)
                    esc_info.append(
                        escape_chunks_at(pos_h[i][:c], sym, idx, self._comb)
                    )
            else:
                # pathological stream (untrained model / adversarial
                # content): fall back to the full wire-tensor pull
                self.last_esc_path = "full"
                from ..coder.rans_tpu import escape_chunks

                y_sym, y_idx = jax.device_get(_pack_groups(list(groups)))
                z_h = jax.device_get(z2)
                zi = (eb_channel_indexes(z_h.shape) + 64).astype(np.uint8)
                esc_info = []
                for i in range(b):
                    z16 = np.clip(z_h[i], -32768, 32767).astype(np.int16)
                    esc_info.append(
                        escape_chunks(
                            np.concatenate([z16.reshape(-1), y_sym[i]]),
                            np.concatenate([zi[i].reshape(-1), y_idx[i]]),
                            self._comb,
                        )
                    )

        from ..coder.rans import (
            assemble_lanes_containers_batch, build_nibble_streams,
        )

        nib_lists = (
            [build_nibble_streams(esc_info[i], all_lens, self.LANES)
             for i in range(b)]
            if esc_info is not None else None
        )
        streams = assemble_lanes_containers_batch(s, wc, words_h, nib_lists)
        out = {"streams": streams, "shape": zshape, "y_hat": y_hat}
        if side is not None:
            out["side_info"] = self._side_to_host(side)
        return out

    def prepare_decode_lanes_single(self, streams):
        """Parse + upload a batch's lane containers ahead of time (the
        serial head of ``decompress_lanes``; see the united codec)."""
        self._lane_setup()
        return self._stack_streams(streams)

    def decompress_lanes(self, streams, shape, *cond, prepared=None,
                         side_info=None) -> dict:
        """On-device decode: upload the bitstreams once, then run the SAME
        fused executables compress_lanes drove, with is_decode=True."""
        self._lane_setup()
        v = self.variables
        zh, zw = int(shape[0]), int(shape[1])
        b = len(streams)
        if prepared is None:
            prepared = self.prepare_decode_lanes_single(streams)
        st3, words, byp = prepared
        cond = self._put_batch(cond)
        n = self.model.N
        m = int(sum(self.model.slice_ch))
        z0 = jnp.zeros((b, zh, zw, n), jnp.int32)
        y0 = jnp.zeros((b, zh * 4, zw * 4, m), jnp.float32)
        _, _, prev = self._fused_flow_single(
            v, y0, z0, st3, words, byp, jnp.asarray(True)
        )
        y_hat = jnp.concatenate(prev, axis=-1)
        x_hat = self._lane_synth(v, y_hat, cond, side_info)
        if isinstance(x_hat, tuple):  # return_mid aux codec: cascade taps
            x_hat, up1, up2, up3 = x_hat
            return {"x_hat": x_hat, "y_hat": y_hat,
                    "up1": up1, "up2": up2, "up3": up3}
        return {"x_hat": x_hat, "y_hat": y_hat}


class MlicLaneCodec(SingleLaneCodec):
    """Lane serving for the MLIC++ schedule (reference
    mlicpp/models/mlicpp.py compress/decompress): ELIC-style checkerboard
    phases per slice, but the nonanchor and merge stages additionally take
    the previous slices + hyper (local/global-intra/inter/channel contexts
    and the LRP refinements)."""

    def _build_slice_programs(self, sapply, dec_group, small_y, st):
        model = self.model
        mt = type(model)

        def fused_slice(v, i, prev, hyper, y, st3, words, byp, is_decode,
                        lut):
            idx_a, mn_a, pack = sapply(
                v, i, prev, hyper, st, method=mt.decode_anchor
            )
            st3, sym_a = jax.lax.cond(
                is_decode,
                lambda: dec_group(st3, words, byp, idx_a, lut, small_y),
                lambda: (st3,
                         model.apply(v, i, y, mn_a, method=mt.anchor_symbols)),
            )
            idx_na, mn_na, anchor_hat = sapply(
                v, i, sym_a, mn_a, pack, prev, hyper, st,
                method=mt.decode_nonanchor_mlic,
            )
            st3, sym_na = jax.lax.cond(
                is_decode,
                lambda: dec_group(st3, words, byp, idx_na, lut, small_y),
                lambda: (st3,
                         model.apply(v, i, y, mn_na, method=mt.nonanchor_symbols)),
            )
            y_hat_slice = model.apply(
                v, i, anchor_hat, sym_na, mn_na, prev, hyper,
                method=mt.merge_slice_mlic,
            )
            return (y_hat_slice, st3, (sym_a, idx_a), (sym_na, idx_na))

        self._slice_body = fused_slice

        def make_fs(i):
            f = jax.jit(lambda v, *a: fused_slice(v, i, *a))
            return lambda v, *a: f(v, *a, self._lut)

        self._fused_slice1 = {
            i: make_fs(i) for i in range(len(model.slice_ch))
        }


class MasterLaneCodec(SingleLaneCodec):
    """Lane serving for the aux-conditioned master cascade (reference
    models/elic_master.py:222-387, testing/tester_master.py:109-148).

    The slice schedule is ELIC's own 5-slice/2-phase checkerboard — the
    fused per-slice programs come straight from ``SingleLaneCodec`` — but
    the encode front takes the DECODED aux image (emitting beta/gamma side
    info: 2x64 f16 = 256 B/image on the wire, exactly the compat
    ``MasterCodec.compress`` accounting) and synthesis is conditioned on
    the aux image plus the aux decoder's up1..up3 taps.  When the aux
    ELIC itself serves through the lane path, its decoded image and taps
    never leave the device: the whole cascade decode is two lane streams
    plus 256 bytes of side info per image."""

    def _build_serving_front_synth(self, _to16):
        model = self.model
        mt = type(model)

        def _front16(v, x, aux):
            y, z_sym, beta, gamma = model.apply(
                _to16(v), x.astype(jnp.bfloat16), aux.astype(jnp.bfloat16),
                method=mt.encode_front_master,
            )
            return (y.astype(jnp.float32), z_sym,
                    beta.astype(jnp.float32), gamma.astype(jnp.float32))

        def _synth16(v, y, aux, beta, gamma, ups):
            out = model.apply(
                _to16(v), y.astype(jnp.bfloat16), aux.astype(jnp.bfloat16),
                beta.astype(jnp.bfloat16), gamma.astype(jnp.bfloat16),
                *(u.astype(jnp.bfloat16) for u in ups),
                method=mt.synthesize_master,
            )
            return out.astype(jnp.float32)

        # the f32 variants are the jitted programs MasterCodec.__init__
        # already builds (_encode_front_master / _synth_master)
        self._front_master_srv = (
            jax.jit(_front16) if self._bf16_serving
            else self._encode_front_master
        )
        self._synth_master_srv = (
            jax.jit(_synth16) if self._bf16_serving else self._synth_master
        )

    def _lane_front(self, v, x, cond):
        (aux,) = cond
        y, z_sym, beta, gamma = self._front_master_srv(v, x, aux)
        return y, z_sym, (beta, gamma)

    def _side_to_host(self, side):
        beta, gamma = jax.device_get(side)
        # 2x64 halves = 256 bytes of side info per image, like the compat
        # wire (codec.py MasterCodec.compress)
        return (np.asarray(beta).astype(np.float16),
                np.asarray(gamma).astype(np.float16))

    def _lane_synth(self, v, y_hat, cond, side_info):
        aux, ups = cond
        beta, gamma = side_info
        return self._synth_master_srv(
            v, y_hat, aux,
            jnp.asarray(beta, jnp.float32), jnp.asarray(gamma, jnp.float32),
            tuple(ups),
        )


class CarLaneCodec(SingleLaneCodec):
    """Lane serving for channel-autoregressive codecs (STF family —
    reference models/stf.py:430-520): ONE dense rANS group per slice, each
    slice's entropy parameters conditioned on the previously decoded
    slices (up to the model's max_support_slices) and the hyper pair.
    Same wire format, knobs, and device encoder as the ELIC schedule —
    only the fused per-slice program differs (no checkerboard split)."""

    def _build_slice_programs(self, sapply, dec_group, small_y, st):
        model = self.model
        mt = type(model)

        def fused_slice(v, i, prev, hyper, y, st3, words, byp, is_decode,
                        lut):
            """One slice of the channel-AR schedule: entropy params from
            (prev slices, hyper), then scan decode OR quantize-from-y,
            then the LRP reconstruction."""
            idx_i, mu = sapply(v, i, prev, hyper, st, method=mt.slice_params)
            st3, sym = jax.lax.cond(
                is_decode,
                lambda: dec_group(st3, words, byp, idx_i, lut, small_y),
                lambda: (st3,
                         model.apply(v, i, y, mu, method=mt.slice_symbols)),
            )
            y_hat_slice = model.apply(
                v, i, sym, mu, prev, hyper, method=mt.slice_reconstruct
            )
            return (y_hat_slice, st3, (sym, idx_i))

        self._slice_body = fused_slice

        def make_fs(i):
            f = jax.jit(lambda v, *a: fused_slice(v, i, *a))
            return lambda v, *a: f(v, *a, self._lut)

        self._fused_slice1 = {
            i: make_fs(i) for i in range(len(model.slice_ch))
        }
