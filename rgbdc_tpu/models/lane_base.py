"""Modality-agnostic machinery of the lane-format (on-device) serving path.

``LaneServingBase`` holds everything about the lane wire format that does
not depend on the model's group schedule: capacity knobs, the serving
env-knob snapshot, container parse/upload (classic and flat layouts), the
cached dummy encode-side inputs, the word-buffer slicers, and the builder
for the single-stream on-device reverse-scan encoder.

Extracted from the flagship ``UnitedCodec`` lane path (models/codec.py) so
single-latent codecs (``ElicCodec`` family: ELIC, Cheng2020-ckbd, R2D —
reference models/elic.py:172-329) serve through the SAME wire format,
knobs, and device encoder.  Subclasses provide the fused per-slice stage
programs (their group schedule is model-specific) and set ``_LUT_ATTRS``
to the names of their device-resident decode/encode LUT attributes.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


class LaneServingBase:
    # -- lane-format capacity knobs -------------------------------------------
    LANES = int(os.environ.get("RGBDC_LANES", "128"))
    # set by shard_serving(): NamedSharding for batch-dim-sharded arrays
    _batch_sharding = None
    # static words-per-lane / nibble-words-per-lane capacity of the fused
    # programs; streams longer than this cannot be decoded on-device
    # (raise, suggesting the env var).  Defaults scale inversely with the
    # lane count — the main stream consumes <=1 word per symbol, so a
    # lane's worst case is its symbol count (~total/lanes); keeping
    # WMAX*LANES constant keeps the [b, LANES, WMAX] buffers (and the
    # encoder's scatter target) the same size at any lane width.
    WMAX = int(os.environ.get("RGBDC_WMAX", str(max(512, 655360 // LANES))))
    BMAX = int(os.environ.get("RGBDC_BMAX", str(max(256, 262144 // LANES))))
    # per-image capacity of the device encoder's compacted escape sideband;
    # batches with more escapes/image fall back to the full wire-tensor pull
    ESC_CAP = int(os.environ.get("RGBDC_ESC_CAP", "4096"))
    # upload widths are bucketed so repeat batches reuse the pad program;
    # the bucket scales inversely with the lane count (per-lane words do
    # too), keeping padding waste <=12% at typical stream sizes (the pad
    # to WMAX happens on DEVICE, so the bucket only sizes the transfers)
    WORD_BUCKET = max(16, 16384 // LANES)

    # device-resident LUT attributes re-placed onto the mesh by
    # shard_serving (subclasses override with their attribute names)
    _LUT_ATTRS: tuple = ()

    # -- multi-chip DP serving -------------------------------------------------

    def shard_serving(self, mesh):
        """Multi-chip DP serving: shard the image batch (and every wire
        tensor) over the mesh's 'data' axis; params and decode LUTs are
        replicated.  Each chip then runs the fused stage programs and the
        lockstep rans scans on its own sub-batch — the chunk pipeline's
        1:1 chunk->chip mapping (docs/ROADMAP.md), with zero cross-chip
        collectives in the codec itself (entropy coding is per-image).

        Must be called before the first compress/decompress so the fused
        executables compile against the sharded layouts.  The bit-exact
        enc/dec closure is preserved: both directions run the SAME sharded
        executables.  Batch size must be a multiple of the mesh size."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        self._mesh = mesh
        self._batch_sharding = NamedSharding(mesh, P("data"))
        self._replicated = NamedSharding(mesh, P())
        self.variables = jax.device_put(self.variables, self._replicated)
        if getattr(self, "_lane_ready", False):
            # re-place the LUTs if lane setup already ran unsharded
            for name in self._LUT_ATTRS:
                setattr(
                    self, name, jax.device_put(getattr(self, name), self._replicated)
                )
            self._dummy_cache = None
        return self

    def _put_batch(self, tree):
        """device_put onto the serving mesh (batch axis sharded); identity
        when shard_serving was not called."""
        if self._batch_sharding is None:
            return tree
        return jax.tree.map(
            lambda x: jax.device_put(x, self._batch_sharding), tree
        )

    # -- serving env-knob snapshot ----------------------------------------------

    def _lane_knobs(self):
        """Parse + validate the serving knobs ONCE, snapshotted onto the
        instance so A/B harnesses can build two codec instances under
        different env and have each keep its own config (the encode
        programs trace lazily, after the harness has restored the env —
        tools/prof_knobs_ab.py)."""
        # flat device wire layout (RGBDC_FLAT_UPLOAD=1): words/nibbles
        # upload as ONE lane-major flat array per stream (the container's
        # native payload order) instead of per-lane bucket-padded rows —
        # ~4x fewer h2d bytes at trained stream sizes; each lane's cursor
        # starts at its base offset.  Must be consistent across
        # compress/decompress of one codec instance: the fused executables
        # are shape-specialized, and the enc/dec closure requires both
        # sides to drive the SAME executable.
        self._flat_upload = os.environ.get("RGBDC_FLAT_UPLOAD", "0") == "1"
        # dense-capped tables (RGBDC_DENSE128=1, serving opt-in): cap every
        # CDF row at RGBDC_DENSE_CAP entries so the dense one-hot-matmul
        # lookup covers ALL rows.  126 = 124 real symbols + escape +
        # terminator: the augmented dense table (k_cap + offset/maxv
        # columns) lands on exactly 128 lanes — one tile for the per-row
        # matmul and compares.
        self._dense = os.environ.get("RGBDC_DENSE128", "0") == "1"
        self._dense_cap = int(os.environ.get("RGBDC_DENSE_CAP", "126"))
        # encoder-scan knobs
        self._enc_scanout = os.environ.get("RGBDC_ENC_SCANOUT", "0") == "1"
        self._enc_unroll = int(os.environ.get("RGBDC_ENC_UNROLL", "4"))
        # decode-scan row unroll (k rows per scan step; bit-exact by
        # construction — same row order/carry math, pads stripped)
        self._dec_unroll = int(os.environ.get("RGBDC_DEC_UNROLL", "1"))
        self._enc_pallas = os.environ.get("RGBDC_ENC_PALLAS", "0") == "1"
        # sort-free compaction of the encode outputs ("1" = both, or
        # "words" / "esc" to isolate): XLA lowers the arbitrary-index
        # scatters (word-stream compaction, escape-sideband compaction)
        # via multi-ms full sorts; the monotone-position gather versions
        # are bit-identical (tools/prof_enc_trace.py, docs/PERF.md).
        # "onehot": words compaction as a masked max-reduce over the rows
        # (gather-free — even the monotone gather is element-bound at ~11
        # ns/elem).  Escape sideband keeps the binary-search gather either
        # way.  All modes bit-identical.
        gc = os.environ.get("RGBDC_ENC_GCOMPACT", "0")
        if gc not in ("0", "1", "words", "esc", "onehot"):
            raise ValueError(f"RGBDC_ENC_GCOMPACT={gc}")
        self._gc_words = (
            "onehot" if gc == "onehot"
            else ("gather" if gc in ("1", "words") else False)
        )
        self._gc_esc = gc in ("1", "esc", "onehot")
        if self._gc_words and not (self._enc_scanout or self._enc_pallas):
            raise ValueError(
                "RGBDC_ENC_GCOMPACT words mode needs RGBDC_ENC_SCANOUT=1 "
                "(the classic path compacts inside the scan)"
            )
        if self._enc_pallas and not self._dense:
            raise ValueError("RGBDC_ENC_PALLAS=1 requires RGBDC_DENSE128=1")
        # escape-fixup decode (RGBDC_DEC_ESCFIX=1): the decode scan body
        # drops its escape while_loop (bypass nibbles never touch the rANS
        # state), and escape VALUES are reconstructed per group in a
        # post-scan pass over escape ordinals (rans_tpu._escape_fixup).
        self._escfix_on = os.environ.get("RGBDC_DEC_ESCFIX", "0") == "1"
        # Pallas decode backend (RGBDC_DEC_PALLAS=1): requires dense-capped
        # tables + escfix — the kernel is gather-free and carries no escape
        # machinery (coder/rans_pallas.py).
        self._dec_pallas = os.environ.get("RGBDC_DEC_PALLAS", "0") == "1"
        if self._dec_pallas and not (self._dense and self._escfix_on):
            raise ValueError(
                "RGBDC_DEC_PALLAS=1 requires RGBDC_DENSE128=1 and "
                "RGBDC_DEC_ESCFIX=1"
            )
        if self._dec_pallas and self._flat_upload:
            raise ValueError(
                "RGBDC_DEC_PALLAS=1 needs the [b, lanes, W] word layout "
                "(unset RGBDC_FLAT_UPLOAD)"
            )
        # one-hot renorm word fetch (RGBDC_DEC_WFETCH=onehot): the in-scan
        # take_along_axis gather costs ~11 ns per ELEMENT on this TPU; a
        # compare-select-reduce over the (static) word columns runs at VPU
        # vector rate.  Only sensible with a tight cap (RGBDC_WMAX=128).
        wfetch = os.environ.get("RGBDC_DEC_WFETCH", "gather")
        if wfetch not in ("gather", "onehot"):
            raise ValueError(f"RGBDC_DEC_WFETCH={wfetch}")
        self._wfetch1h = wfetch == "onehot"
        # single-program slice flow (RGBDC_FUSE_SLICES=1): trace the z
        # program + EVERY fused slice program into ONE executable per
        # direction instead of 1+n_slices dispatches.  Bit-exact by
        # construction (same op sequence, one trace); the win is dispatch
        # count and cross-slice scheduling — aimed at many-slice schedules
        # (MLIC++'s 10 even slices) where per-program overhead dominates.
        self._fuse_all = os.environ.get("RGBDC_FUSE_SLICES", "0") == "1"
        # bf16 entropy-parameter flow (RGBDC_BF16_FLOW=1): the fused stage
        # programs' context/aggregation convs run in bf16.  The enc/dec
        # bit-exact closure is untouched BY CONSTRUCTION — encoder and
        # decoder call the SAME compiled executables.
        self._flow16 = os.environ.get("RGBDC_BF16_FLOW", "0") == "1"
        # host-encode pull format: "compact" (5-bit syms, idx skipped when
        # every index clamps to the floor row) or "sym5idx" (5-bit syms +
        # real u8 idx stream — the right format for TRAINED models with
        # live sigma predictions).  "auto" starts compact and self-tunes.
        self._pull_auto = True
        self._pull_mode = os.environ.get("RGBDC_PULL", "auto")
        if self._pull_mode not in ("auto", "compact", "sym5idx"):
            raise ValueError(f"RGBDC_PULL={self._pull_mode}")
        if self._pull_mode != "auto":
            self._pull_auto = False
        else:
            self._pull_mode = "compact"

    def _bind_coder(self):
        from ..coder import rans_tpu as _rt
        from ..coder.rans import lanes_encode, lanes_split

        self._rt = _rt
        self._lanes_encode = lanes_encode
        self._lanes_split = lanes_split

    def _make_pad_to(self):
        """Jitted pad-to-static-cap programs (upload the bucketed width;
        pad to the fused programs' static cap ON DEVICE)."""
        lanes = self.LANES
        if self._flat_upload:
            self._pad_to = {
                cap: jax.jit(
                    lambda w, _c=cap: jnp.pad(w, ((0, 0), (0, _c - w.shape[-1])))
                )
                for cap in (self.WMAX * lanes, self.BMAX * lanes)
            }
        else:
            self._pad_to = {
                cap: jax.jit(
                    lambda w, _c=cap: jnp.pad(
                        w, ((0, 0), (0, 0), (0, _c - w.shape[-1]))
                    )
                )
                for cap in (self.WMAX, self.BMAX)
            }

    # -- encode-side dummies / word slicers -------------------------------------

    def _dummy_lane_inputs(self, b):
        """Cached zero (st3, words, byp) the encoder passes to the fused
        programs (its cond branches never read them)."""
        cached = getattr(self, "_dummy_cache", None)
        if cached is not None and cached[0] == b:
            return cached[1]
        zs = jnp.zeros((b, self.LANES), jnp.uint32)
        zp = jnp.zeros((b, self.LANES), jnp.int32)
        if self._flat_upload:
            # under the one-hot fetch the words arrive unflattened (see
            # _stack_streams_flat); the nibble stream stays flat
            if self._wfetch1h:
                zw = jnp.zeros((b, self.LANES, self.WMAX), jnp.uint16)
            else:
                zw = jnp.zeros((b, self.LANES * self.WMAX), jnp.uint16)
            zb = jnp.zeros((b, self.LANES * self.BMAX), jnp.uint16)
        else:
            zw = jnp.zeros((b, self.LANES, self.WMAX), jnp.uint16)
            zb = jnp.zeros((b, self.LANES, self.BMAX), jnp.uint16)
        zs, zp, zw, zb = self._put_batch((zs, zp, zw, zb))
        self._dummy_cache = (b, ((zs, zp, zp), zw, zb))
        return (zs, zp, zp), zw, zb

    def _slicer(self, wb):
        """Cached jitted [:, :, :wb] word slicer for the bucketed pull."""
        slicer = getattr(self, "_word_slicers", {})
        if wb not in slicer:
            slicer[wb] = jax.jit(lambda w, _wb=wb: w[:, :, :_wb])
            self._word_slicers = slicer
        return slicer[wb]

    # -- container parse + upload ------------------------------------------------

    def _stack_streams(self, streams):
        """Parse + upload a batch of lane containers; returns
        ((states, pos_init, nib_init), words, byp) ready to seed the fused
        decode carry.  Classic layout: per-lane rows padded to a bucketed
        width, cursors start at 0.  RGBDC_FLAT_UPLOAD=1: the container's
        native lane-major flat payload uploads as-is (exact bytes) and
        each lane's cursor starts at its base offset."""
        if self._flat_upload:
            return self._stack_streams_flat(streams)
        split = [self._lanes_split(s, self.LANES) for s in streams]

        def stack(k, cap, env):
            w = max(max((s[k].shape[1] for s in split), default=1), 1)
            if w > cap:
                raise ValueError(
                    f"lane stream needs {w} u16/lane > {env}={cap}; "
                    "raise the env var (recompiles the fused programs)"
                )
            w = min(-(-w // self.WORD_BUCKET) * self.WORD_BUCKET, cap)
            arr = np.stack(
                [np.pad(s[k], ((0, 0), (0, w - s[k].shape[1]))) for s in split]
            )
            # upload the bucketed width; pad to the static cap on DEVICE
            return self._pad_to[cap](self._put_batch(jnp.asarray(arr)))

        states = self._put_batch(jnp.asarray(np.stack([s[0] for s in split])))
        pos0 = jnp.zeros((len(streams), self.LANES), jnp.int32)
        return (
            (states, pos0, pos0),
            stack(1, self.WMAX, "RGBDC_WMAX"),
            stack(2, self.BMAX, "RGBDC_BMAX"),
        )

    def _stack_streams_flat(self, streams):
        from ..coder.rans import lanes_split_flat

        lanes = self.LANES
        split = [lanes_split_flat(s, lanes) for s in streams]
        wcap, bcap = self.WMAX * lanes, self.BMAX * lanes
        bucket = self.WORD_BUCKET * lanes

        def stackf(k, cap, env):
            w = max(max((s[k].size for s in split), default=1), 1)
            if w > cap:
                raise ValueError(
                    f"lane stream needs {w} flat u16 > {env}*LANES={cap}; "
                    "raise the env var (recompiles the fused programs)"
                )
            w = min(-(-w // bucket) * bucket, cap)
            arr = np.stack([np.pad(s[k], (0, w - s[k].size)) for s in split])
            return self._pad_to[cap](self._put_batch(jnp.asarray(arr)))

        states = self._put_batch(jnp.asarray(np.stack([s[0] for s in split])))
        pos0 = self._put_batch(jnp.asarray(np.stack([s[2] for s in split])))
        # nibble cursor counts NIBBLES: 4 per u16 word of base offset
        nib0 = self._put_batch(
            jnp.asarray(np.stack([s[4] * 4 for s in split]).astype(np.int32))
        )
        words = stackf(1, wcap, "RGBDC_WMAX")
        byp = stackf(3, bcap, "RGBDC_BMAX")
        if self._wfetch1h:
            # one-hot fetch needs the fixed-stride [b, lanes, WMAX] layout:
            # unflatten ON DEVICE with one bucketed gather (the flat
            # payload already crossed the link as exact bytes), then the
            # word cursor restarts at 0 per lane.  Nibbles stay flat (the
            # escape fixup pops a handful per batch).
            maxc = 1
            for s in split:
                counts = np.diff(np.append(s[2], s[1].size))
                if counts.size:
                    maxc = max(maxc, int(counts.max()))
            if maxc > self.WMAX:
                raise ValueError(
                    f"a lane holds {maxc} words > RGBDC_WMAX={self.WMAX}; "
                    "raise the env var (recompiles the fused programs)"
                )
            wb = min(-(-maxc // self.WORD_BUCKET) * self.WORD_BUCKET,
                     self.WMAX)
            words = self._unflatten_words(wb)(words, pos0)
            pos0 = jnp.zeros_like(pos0)
        return ((states, pos0, nib0), words, byp)

    def _unflatten_words(self, wb: int):
        """Cached jitted flat->[b, lanes, WMAX] word unflatten (gathers only
        ``wb`` columns per lane — the bucketed max count — and zero-pads the
        rest, so the gather stays ~b*lanes*wb elements)."""
        cache = getattr(self, "_unflat_cache", None)
        if cache is None:
            cache = self._unflat_cache = {}
        fn = cache.get(wb)
        if fn is None:
            wmax = self.WMAX

            @jax.jit
            def fn(flat, base):
                idx = base[..., None] + jnp.arange(wb, dtype=jnp.int32)
                idx = jnp.clip(idx, 0, flat.shape[-1] - 1)
                w = jnp.take_along_axis(
                    flat, idx.reshape(flat.shape[0], -1), axis=-1
                ).reshape(base.shape + (wb,))
                return jnp.pad(w, ((0, 0), (0, 0), (0, wmax - wb)))

            cache[wb] = fn
        return fn

    # -- device encoder (single stream) -------------------------------------------

    def _mk_stream_encoder(self, b, zh, zw, n, all_lens):
        """Build the traceable single-stream device encoder: concat z + y
        groups in coding order, detect escapes, compact the escape
        sideband, and run the on-device reverse-scan rans32 encoder
        (rans_tpu.encode_groups).  Returns
        ``one(z_sym, groups, enc_lut, off_np, mv_np, small, small_z)`` ->
        (states, wcounts, words, esc_cnt, esc_pos, esc_pack) — the last
        two are the COMPACTED escape sideband ([b, ESC_CAP] coding
        positions and (idx<<16 | sym&0xffff) packs) the host unpacks into
        bypass nibble streams, so no symbol-sized tensor ever crosses the
        link.  Shared by the united codec (called once per modality) and
        the single-latent lane codecs."""
        _rt = self._rt
        lanes = self.LANES
        wcap = self.WMAX
        cap = self.ESC_CAP

        def small_take(table_np, idx):
            # y-row lookup as compare-sums: gathers are element-bound on
            # this TPU (~10 ns/elem); 64 fused scalar compares are cheaper
            out = jnp.zeros(idx.shape, jnp.int32)
            for j, tv in enumerate(table_np):
                out = out + jnp.where(idx == j, jnp.int32(tv), 0)
            return out

        def one(z_sym, groups, enc_lut, off_np, mv_np, small, small_z=None):
            z16 = jnp.clip(z_sym, -32768, 32767).astype(jnp.int16).reshape(b, -1)
            zi = jnp.broadcast_to(
                jnp.arange(n, dtype=jnp.int32) + 64, (b, zh, zw, n)
            ).reshape(b, -1)
            y_sym = jnp.concatenate([g[0].reshape(b, -1) for g in groups], axis=1)
            y_idx = jnp.concatenate(
                [g[1].reshape(b, -1).astype(jnp.int32) for g in groups], axis=1
            )
            # escape detection, split by table structure: z rows are just
            # 64 + channel, so (offset, maxv) broadcast per channel with
            # no lookup at all; y rows need only the 64 gaussian entries
            zv = jnp.clip(z_sym, -32768, 32767).astype(jnp.int32) - jnp.asarray(
                off_np[64 : 64 + n]
            )
            esc_z = (zv < 0) | (zv >= jnp.asarray(mv_np[64 : 64 + n]))
            yv = y_sym.astype(jnp.int32) - small_take(off_np[:64], y_idx)
            esc_y = (yv < 0) | (yv >= small_take(mv_np[:64], y_idx))
            esc = jnp.concatenate([esc_z.reshape(b, -1), esc_y], axis=1)
            esc_cnt = jnp.sum(esc, axis=1, dtype=jnp.int32)

            sym = jnp.concatenate([z16, y_sym], axis=1)
            idx = jnp.concatenate([zi, y_idx], axis=1)
            t = sym.shape[1]
            pack = (idx << 16) | (sym.astype(jnp.int32) & 0xFFFF)
            if self._gc_esc:
                # sort-free sideband compaction: escape positions are
                # MONOTONE, so slot k is a binary search for the (k+1)-th
                # set bit in the inclusive escape cumsum (19 aligned
                # take_along_axis rounds beat XLA's sort-lowered scatter)
                c = jnp.cumsum(esc.astype(jnp.int32), axis=1)  # [b, t]
                kq = jnp.arange(cap, dtype=jnp.int32)
                lo = jnp.zeros((b, cap), jnp.int32)
                hi = jnp.full((b, cap), t, jnp.int32)
                for _ in range(int(np.ceil(np.log2(t + 1)))):
                    mid = (lo + hi) >> 1
                    v = jnp.take_along_axis(c, jnp.minimum(mid, t - 1), axis=1)
                    upd = lo < hi
                    gt = v > kq  # c[mid] > k -> answer <= mid
                    hi = jnp.where(upd & gt, mid, hi)
                    lo = jnp.where(upd & ~gt, mid + 1, lo)
                valid = kq < esc_cnt[:, None]
                r_k = jnp.minimum(lo, t - 1)
                esc_pos = jnp.where(valid, lo, -1)
                esc_pack = jnp.where(
                    valid, jnp.take_along_axis(pack, r_k, axis=1), 0
                )
            else:
                # exclusive-prefix positions -> 2 scatters
                pos = jnp.cumsum(esc.astype(jnp.int32), axis=1) - esc.astype(
                    jnp.int32
                )
                tgt = jnp.where(esc, pos, cap)
                bi = jnp.broadcast_to(
                    jnp.arange(b, dtype=jnp.int32)[:, None], (b, t)
                )
                gpos = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32), (b, t))
                esc_pos = jnp.full((b, cap), -1, jnp.int32).at[bi, tgt].set(
                    gpos, mode="drop"
                )
                esc_pack = jnp.zeros((b, cap), jnp.int32).at[bi, tgt].set(
                    pack, mode="drop"
                )

            states, wcounts, words = _rt.encode_groups(
                sym, idx, enc_lut, lanes=lanes, group_lens=all_lens, wcap=wcap,
                small=small, small_z=small_z,
                unroll=self._enc_unroll,
                scan_out=self._enc_scanout,
                pallas=self._enc_pallas,
                gather_compact=self._gc_words,
            )
            return states, wcounts, words, esc_cnt, esc_pos, esc_pack

        return one
