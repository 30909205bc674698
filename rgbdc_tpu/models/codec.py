"""Host-side codec runner: drives jitted model stages + the C rANS coder.

Replaces the reference's per-model compress/decompress methods
(models/elic.py:172-329) with a generic driver:

  compress:   ONE jitted program emits every (slice, phase) symbol/index
              tensor; the host then encodes them in coding order with a
              single buffered rANS encoder per image.
  decompress: phase-serial loop (true data dependency, SURVEY §3.5): each
              phase is one jitted context/param computation on device and
              one batched C rANS call on host.

Entropy-coder state (quantized CDF tables) lives host-side in CodecTables,
built by ``update()`` — the analog of reference net.update(force=True).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..coder.registry import entropy_coder_classes
from ..entropy import get_scale_table
from ..entropy.tables import CdfTable, build_bottleneck_tables, build_gaussian_tables
from .lane_base import LaneServingBase
from .lane_single import (
    CarLaneCodec,
    MasterLaneCodec,
    MlicLaneCodec,
    SingleLaneCodec,
)


@dataclass
class CodecTables:
    """All host state needed to entropy-code with a trained model."""

    gc: CdfTable  # gaussian conditional, indexed by scale-table entry
    eb: dict  # name -> CdfTable for each entropy bottleneck
    scale_table: np.ndarray

    @classmethod
    def build(cls, variables, eb_names=("entropy_bottleneck",)) -> "CodecTables":
        scale_table = get_scale_table()
        gc = build_gaussian_tables(scale_table)
        eb = {}
        for name in eb_names:
            table, _medians = build_bottleneck_tables(variables["params"][name])
            eb[name] = table
        return cls(gc=gc, eb=eb, scale_table=scale_table)


_POOL = ThreadPoolExecutor(max_workers=int(os.environ.get("RGBDC_CODER_THREADS", "8")))
# separate pool for batch-chunk pipelining (avoids nested-pool starvation)
_CHUNK_POOL = ThreadPoolExecutor(max_workers=4)


def _start_host_copy(tree):
    """Kick off async device->host copies for every array in the tree."""
    for leaf in jax.tree_util.tree_leaves(tree):
        try:
            leaf.copy_to_host_async()
        except AttributeError:
            pass
    return tree


def _tmap(fn, n):
    """Map fn over range(n) on the coder thread pool (ctypes releases the
    GIL, so per-image rANS calls run truly parallel)."""
    if n == 1:
        return [fn(0)]
    return list(_POOL.map(fn, range(n)))


def _chunk_bounds(n: int, n_chunks: int):
    k = (n + n_chunks - 1) // n_chunks
    return [(i, min(i + k, n)) for i in range(0, n, k)]


def eb_channel_indexes(shape) -> np.ndarray:
    """[B,H,W,C] channel-index map for factorized-prior coding."""
    b, h, w, c = shape
    return np.broadcast_to(np.arange(c, dtype=np.int32), (b, h, w, c))


@jax.jit
def _pack_groups(groups):
    """Concatenate per-group (sym,[B,...] i16, idx u8) tensors into two
    [B, total] wire buffers in coding order.

    The tunnel pays ~17 ms per d2h transfer regardless of size, so pulling
    the ~84 per-(slice,phase) tensors of a united encode costs ~1.4 s while
    the same bytes in 4 packed buffers cross in ~0.3 s (docs/PERF.md)."""
    b = groups[0][0].shape[0]
    sym = jnp.concatenate([s.reshape(b, -1) for s, _ in groups], axis=1)
    idx = jnp.concatenate(
        [i.reshape(b, -1).astype(jnp.uint8) for _, i in groups], axis=1
    )
    return sym, idx


@partial(jax.jit, static_argnums=(1,))
def _pack_groups_i8(groups, mode_idx: int = -1):
    """Compact pull variant of _pack_groups: three 5-bit symbols pack into
    each u16 (0.67 B/symbol), and the index tensor does not cross AT ALL
    when every index equals the static ``mode_idx`` (under the serving
    sigma floor every predicted sigma clamps to the floor row, so the u8
    index stream is pure redundancy — measured 100% on the bench model,
    docs/PERF.md).  Returns (packed u16, overflow count, index-mismatch
    count) per image; nonzero counts make the caller fall back to the
    exact i16/idx pull (symbols out of [-15, 15] are rare: measured max
    |residual| is 9)."""
    b = groups[0][0].shape[0]
    sym = jnp.concatenate([s.reshape(b, -1) for s, _ in groups], axis=1)
    idx = jnp.concatenate(
        [i.reshape(b, -1).astype(jnp.int32) for _, i in groups], axis=1
    )
    big = (sym < -15) | (sym > 15)
    diff = jnp.sum(idx != mode_idx, axis=1, dtype=jnp.int32)
    t = sym.shape[1]
    pad = (-t) % 3
    u5 = (jnp.clip(sym, -15, 15).astype(jnp.int32) + 16).astype(jnp.uint16)
    u5 = jnp.pad(u5, ((0, 0), (0, pad))).reshape(b, -1, 3)
    packed = u5[:, :, 0] | (u5[:, :, 1] << 5) | (u5[:, :, 2] << 10)
    return packed, jnp.sum(big, axis=1, dtype=jnp.int32), diff


@jax.jit
def _pack_groups_i8_idx(groups):
    """Live-sigma pull variant: 5-bit packed symbols PLUS the real u8 index
    stream (1.67 B/symbol).  A trained codec's sigma predictions vary per
    element, so the idx-skip of :func:`_pack_groups_i8` can never fire —
    but its 5-bit symbol packing still applies (trained residuals are
    small).  Returns (packed u16, overflow count, idx u8)."""
    b = groups[0][0].shape[0]
    sym = jnp.concatenate([s.reshape(b, -1) for s, _ in groups], axis=1)
    idx = jnp.concatenate(
        [i.reshape(b, -1).astype(jnp.uint8) for _, i in groups], axis=1
    )
    big = (sym < -15) | (sym > 15)
    t = sym.shape[1]
    pad = (-t) % 3
    u5 = (jnp.clip(sym, -15, 15).astype(jnp.int32) + 16).astype(jnp.uint16)
    u5 = jnp.pad(u5, ((0, 0), (0, pad))).reshape(b, -1, 3)
    packed = u5[:, :, 0] | (u5[:, :, 1] << 5) | (u5[:, :, 2] << 10)
    return packed, jnp.sum(big, axis=1, dtype=jnp.int32), idx


def _unpack_sym5(packed: np.ndarray, t: int) -> np.ndarray:
    """Host mirror of the 3-per-u16 5-bit packing -> int16 symbols."""
    p = np.asarray(packed)
    out = np.empty((p.shape[0], p.shape[1] * 3), np.int16)
    out[:, 0::3] = (p & 31).astype(np.int16) - 16
    out[:, 1::3] = ((p >> 5) & 31).astype(np.int16) - 16
    out[:, 2::3] = ((p >> 10) & 31).astype(np.int16) - 16
    return out[:, :t]


class ElicCodec(SingleLaneCodec):
    """compress()/decompress() for ELIC-style single-latent checkerboard
    models (ELIC, Cheng2020+ckbd via shared method names).

    Also exposes the lane-format serving path (compress_lanes /
    decompress_lanes, models/lane_single.py): one on-device rans32 lane
    stream per image, same fused-program bit-exact closure and serving
    knobs as the flagship united codec."""

    def __init__(self, model, variables, tables: CodecTables | None = None):
        self.model = model
        self.variables = variables
        # backend classes resolved from the registry at construction, like
        # the reference's _EntropyCoder proxy (entropy_models.py:20-57)
        self.RansEncoder, self.RansDecoder = entropy_coder_classes()
        self.tables = tables if tables is not None else CodecTables.build(variables)
        # numpy (STATIC) so build_indexes can unroll its compare-sum;
        # 63 floats inline into the HLO as constants
        st = np.asarray(self.tables.scale_table, dtype=np.float32)

        mt = type(model)
        self._encode_front = jax.jit(
            lambda v, x: model.apply(v, x, method=mt.encode_front)
        )
        self._sym_a = {}
        self._sym_na = {}
        for i in range(len(model.slice_ch)):
            self._sym_a[i] = jax.jit(
                partial(
                    lambda v, y, mn, idx: model.apply(
                        v, idx, y, mn, method=mt.anchor_symbols
                    ),
                    idx=i,
                )
            )
            self._sym_na[i] = jax.jit(
                partial(
                    lambda v, y, mn, idx: model.apply(
                        v, idx, y, mn, method=mt.nonanchor_symbols
                    ),
                    idx=i,
                )
            )
        self._hyper = jax.jit(
            lambda v, z_sym: model.apply(v, z_sym, method=mt.hyper_decode)
        )
        self._dec_anchor = {}
        self._dec_nonanchor = {}
        for i in range(len(model.slice_ch)):
            self._dec_anchor[i] = jax.jit(
                partial(
                    lambda v, prev, hyper, idx: model.apply(
                        v, idx, prev, hyper, st, method=mt.decode_anchor
                    ),
                    idx=i,
                )
            )
            self._dec_nonanchor[i] = jax.jit(
                partial(
                    lambda v, sym_a, mn_a, ch_ctx, hyper, idx: model.apply(
                        v, idx, sym_a, mn_a, ch_ctx, hyper, st, method=mt.decode_nonanchor
                    ),
                    idx=i,
                )
            )
        self._merge = jax.jit(
            lambda v, a, s, m: model.apply(v, a, s, m, method=mt.merge_slice)
        )
        self._synth = jax.jit(lambda v, y: model.apply(v, y, method=mt.synthesize))

    # -- compress -----------------------------------------------------------

    def compress(self, x) -> dict:
        """Encode x. Runs the decoder's own jitted stage programs on-device
        (bit-exact closure), then one host pass of C rANS calls."""
        v = self.variables
        y, z_sym_dev = self._encode_front(v, x)
        hyper = self._hyper(v, z_sym_dev)

        groups = []
        y_hat_slices: list = []
        for i in range(len(self.model.slice_ch)):
            idx_a, mn_a, ch_ctx = self._dec_anchor[i](v, tuple(y_hat_slices), hyper)
            sym_a = self._sym_a[i](v, y, mn_a)
            idx_na, mn_na, anchor_hat = self._dec_nonanchor[i](
                v, sym_a, mn_a, ch_ctx, hyper
            )
            sym_na = self._sym_na[i](v, y, mn_na)
            y_hat_slices.append(self._merge(v, anchor_hat, sym_na, mn_na))
            groups.append((sym_a, idx_a))
            groups.append((sym_na, idx_na))

        packed = _start_host_copy(_pack_groups(groups))
        z_sym, (y_sym, y_idx) = jax.device_get((z_sym_dev, packed))

        b = z_sym.shape[0]
        eb_table = self.tables.eb["entropy_bottleneck"]
        z_idx = eb_channel_indexes(z_sym.shape)

        def encode_one(n):
            # packed buffer == the y stream in exact coding order
            enc = self.RansEncoder()
            enc.buffer(y_sym[n], y_idx[n], self.tables.gc)
            enc_z = self.RansEncoder()
            enc_z.buffer(z_sym[n], z_idx[n], eb_table)
            return enc.flush(), enc_z.flush()

        pairs = _tmap(encode_one, b)
        return {
            "strings": [[p[0] for p in pairs], [p[1] for p in pairs]],
            "shape": (z_sym.shape[1], z_sym.shape[2]),
            # the decoder MUST reproduce this bit-for-bit (shared programs)
            "y_hat": jnp.concatenate(y_hat_slices, axis=-1),
        }

    # -- decompress ---------------------------------------------------------

    def decompress(self, strings, shape) -> dict:
        y_strings, z_strings = strings
        b = len(y_strings)
        zh, zw = shape
        c = self.model.N
        eb_table = self.tables.eb["entropy_bottleneck"]

        z_idx = eb_channel_indexes((b, zh, zw, c))
        z_sym = np.stack(
            _tmap(lambda n: self.RansDecoder(z_strings[n]).decode(z_idx[n], eb_table), b)
        )
        hyper = self._hyper(self.variables, jnp.asarray(z_sym))

        decoders = [self.RansDecoder(y_strings[n]) for n in range(b)]

        def pull(idx_dev):
            idx_np = np.asarray(idx_dev)
            return jnp.asarray(np.stack(
                _tmap(lambda n: decoders[n].decode(idx_np[n], self.tables.gc), b)
            ))

        y_hat_slices: list = []
        for i in range(len(self.model.slice_ch)):
            idx_a, mn_a, ch_ctx = self._dec_anchor[i](
                self.variables, tuple(y_hat_slices), hyper
            )
            sym_a = pull(idx_a)
            idx_na, mn_na, anchor_hat = self._dec_nonanchor[i](
                self.variables, sym_a, mn_a, ch_ctx, hyper
            )
            sym_na = pull(idx_na)
            y_hat_slices.append(
                self._merge(self.variables, anchor_hat, sym_na, mn_na)
            )

        y_hat = jnp.concatenate(y_hat_slices, axis=-1)
        x_hat = self._synth(self.variables, y_hat)
        if isinstance(x_hat, tuple):  # return_mid aux codec: taps for cascade
            x_hat, up1, up2, up3 = x_hat
            return {"x_hat": x_hat, "y_hat": y_hat, "up1": up1, "up2": up2, "up3": up3}
        return {"x_hat": x_hat, "y_hat": y_hat}


class MasterCodec(MasterLaneCodec, ElicCodec):
    """Cascade codec driver for ELIC_master: same 5-slice checkerboard loop
    as ElicCodec, plus the feature-fusion front (decoded aux conditioning)
    and beta/gamma side info (reference testing/tester_master.py:109-148).

    Lane serving rides models/lane_single.MasterLaneCodec: the aux ELIC
    decodes through its own lane path (image + up-taps stay on device) and
    the master's lane programs condition on them — the compat host-serial
    wire below remains for reference parity."""

    def __init__(self, model, variables, tables: CodecTables | None = None):
        super().__init__(model, variables, tables)
        mt = type(model)
        self._encode_front_master = jax.jit(
            lambda v, x, aux: model.apply(v, x, aux, method=mt.encode_front_master)
        )
        self._synth_master = jax.jit(
            lambda v, y, aux, beta, gamma, ups: model.apply(
                v, y, aux, beta, gamma, *ups, method=mt.synthesize_master
            )
        )

    def compress(self, x, aux, aux_ups=None) -> dict:
        v = self.variables
        y, z_sym_dev, beta, gamma = self._encode_front_master(v, x, aux)
        hyper = self._hyper(v, z_sym_dev)

        groups = []
        y_hat_slices: list = []
        for i in range(len(self.model.slice_ch)):
            idx_a, mn_a, ch_ctx = self._dec_anchor[i](v, tuple(y_hat_slices), hyper)
            sym_a = self._sym_a[i](v, y, mn_a)
            idx_na, mn_na, anchor_hat = self._dec_nonanchor[i](
                v, sym_a, mn_a, ch_ctx, hyper
            )
            sym_na = self._sym_na[i](v, y, mn_na)
            y_hat_slices.append(self._merge(v, anchor_hat, sym_na, mn_na))
            groups.append((sym_a, idx_a))
            groups.append((sym_na, idx_na))

        packed = _start_host_copy(_pack_groups(groups))
        z_sym, (y_sym, y_idx), beta, gamma = jax.device_get(
            (z_sym_dev, packed, beta, gamma)
        )
        b = z_sym.shape[0]
        eb_table = self.tables.eb["entropy_bottleneck"]
        z_idx = eb_channel_indexes(z_sym.shape)

        def encode_one(n):
            enc = self.RansEncoder()
            enc.buffer(y_sym[n], y_idx[n], self.tables.gc)
            enc_z = self.RansEncoder()
            enc_z.buffer(z_sym[n], z_idx[n], eb_table)
            return enc.flush(), enc_z.flush()

        pairs = _tmap(encode_one, b)
        return {
            "strings": [[p[0] for p in pairs], [p[1] for p in pairs]],
            "shape": (z_sym.shape[1], z_sym.shape[2]),
            "y_hat": jnp.concatenate(y_hat_slices, axis=-1),
            # 128 halves = 256 bytes of side info per image
            "side_info": (beta.astype(np.float16), gamma.astype(np.float16)),
        }

    def decompress(self, strings, shape, aux, aux_ups, side_info) -> dict:
        v = self.variables
        y_strings, z_strings = strings
        b = len(y_strings)
        zh, zw = shape
        eb_table = self.tables.eb["entropy_bottleneck"]
        z_idx = eb_channel_indexes((b, zh, zw, self.model.N))
        z_sym = np.stack(
            _tmap(lambda n: self.RansDecoder(z_strings[n]).decode(z_idx[n], eb_table), b)
        )
        hyper = self._hyper(v, jnp.asarray(z_sym))

        decoders = [self.RansDecoder(y_strings[n]) for n in range(b)]

        def pull(idx_dev):
            idx_np = np.asarray(idx_dev)
            return jnp.asarray(np.stack(
                _tmap(lambda n: decoders[n].decode(idx_np[n], self.tables.gc), b)
            ))

        y_hat_slices: list = []
        for i in range(len(self.model.slice_ch)):
            idx_a, mn_a, ch_ctx = self._dec_anchor[i](v, tuple(y_hat_slices), hyper)
            sym_a = pull(idx_a)
            idx_na, mn_na, anchor_hat = self._dec_nonanchor[i](
                v, sym_a, mn_a, ch_ctx, hyper
            )
            sym_na = pull(idx_na)
            y_hat_slices.append(self._merge(v, anchor_hat, sym_na, mn_na))

        y_hat = jnp.concatenate(y_hat_slices, axis=-1)
        beta, gamma = side_info
        x_hat = self._synth_master(
            v,
            y_hat,
            aux,
            jnp.asarray(beta, dtype=jnp.float32),
            jnp.asarray(gamma, dtype=jnp.float32),
            tuple(aux_ups),
        )
        return {"x_hat": x_hat, "y_hat": y_hat}


class MlicCodec(MlicLaneCodec, ElicCodec):
    """MLIC++ driver: ELIC-style checkerboard phases, but the nonanchor and
    merge stages also take the previous slices + hyper (for LRP and the
    global contexts).

    Lane serving rides models/lane_single.MlicLaneCodec (same wire format
    and knobs as the flagship; the fused slice program threads the
    prev+hyper packs through the MLIC context stages)."""

    def __init__(self, model, variables, tables: CodecTables | None = None):
        super().__init__(model, variables, tables)
        # numpy (STATIC) so build_indexes can unroll its compare-sum;
        # 63 floats inline into the HLO as constants
        st = np.asarray(self.tables.scale_table, dtype=np.float32)
        mt = type(model)
        self._dec_nonanchor = {
            i: jax.jit(
                partial(
                    lambda v, sym_a, mn_a, pack, prev, hyper, idx: model.apply(
                        v, idx, sym_a, mn_a, pack, prev, hyper, st,
                        method=mt.decode_nonanchor_mlic,
                    ),
                    idx=i,
                )
            )
            for i in range(len(model.slice_ch))
        }
        self._merge_i = {
            i: jax.jit(
                partial(
                    lambda v, a, s, m, prev, hyper, idx: model.apply(
                        v, idx, a, s, m, prev, hyper, method=mt.merge_slice_mlic
                    ),
                    idx=i,
                )
            )
            for i in range(len(model.slice_ch))
        }

    def compress(self, x) -> dict:
        v = self.variables
        y, z_sym_dev = self._encode_front(v, x)
        hyper = self._hyper(v, z_sym_dev)

        groups = []
        y_hat_slices: list = []
        for i in range(len(self.model.slice_ch)):
            prev = tuple(y_hat_slices)
            idx_a, mn_a, pack = self._dec_anchor[i](v, prev, hyper)
            sym_a = self._sym_a[i](v, y, mn_a)
            idx_na, mn_na, anchor_hat = self._dec_nonanchor[i](
                v, sym_a, mn_a, pack, prev, hyper
            )
            sym_na = self._sym_na[i](v, y, mn_na)
            y_hat_slices.append(
                self._merge_i[i](v, anchor_hat, sym_na, mn_na, prev, hyper)
            )
            groups.append((sym_a, idx_a))
            groups.append((sym_na, idx_na))

        packed = _start_host_copy(_pack_groups(groups))
        z_sym, (y_sym, y_idx) = jax.device_get((z_sym_dev, packed))
        b = z_sym.shape[0]
        eb_table = self.tables.eb["entropy_bottleneck"]
        z_idx = eb_channel_indexes(z_sym.shape)

        def encode_one(n):
            enc = self.RansEncoder()
            enc.buffer(y_sym[n], y_idx[n], self.tables.gc)
            enc_z = self.RansEncoder()
            enc_z.buffer(z_sym[n], z_idx[n], eb_table)
            return enc.flush(), enc_z.flush()

        pairs = _tmap(encode_one, b)
        return {
            "strings": [[p[0] for p in pairs], [p[1] for p in pairs]],
            "shape": (z_sym.shape[1], z_sym.shape[2]),
            "y_hat": jnp.concatenate(y_hat_slices, axis=-1),
        }

    def decompress(self, strings, shape) -> dict:
        v = self.variables
        y_strings, z_strings = strings
        b = len(y_strings)
        zh, zw = shape
        eb_table = self.tables.eb["entropy_bottleneck"]
        z_idx = eb_channel_indexes((b, zh, zw, self.model.N))
        z_sym = np.stack(
            _tmap(lambda n: self.RansDecoder(z_strings[n]).decode(z_idx[n], eb_table), b)
        )
        hyper = self._hyper(v, jnp.asarray(z_sym))

        decoders = [self.RansDecoder(y_strings[n]) for n in range(b)]

        def pull(idx_dev):
            idx_np = np.asarray(idx_dev)
            return jnp.asarray(np.stack(
                _tmap(lambda n: decoders[n].decode(idx_np[n], self.tables.gc), b)
            ))

        y_hat_slices: list = []
        for i in range(len(self.model.slice_ch)):
            prev = tuple(y_hat_slices)
            idx_a, mn_a, pack = self._dec_anchor[i](v, prev, hyper)
            sym_a = pull(idx_a)
            idx_na, mn_na, anchor_hat = self._dec_nonanchor[i](
                v, sym_a, mn_a, pack, prev, hyper
            )
            sym_na = pull(idx_na)
            y_hat_slices.append(
                self._merge_i[i](v, anchor_hat, sym_na, mn_na, prev, hyper)
            )

        y_hat = jnp.concatenate(y_hat_slices, axis=-1)
        return {"x_hat": self._synth(v, y_hat), "y_hat": y_hat}


class ChannelARCodec(CarLaneCodec):
    """compress()/decompress() for channel-autoregressive codecs with no
    checkerboard (STF family): one dense rANS group per slice, sequential
    slice decode conditioned on previously decoded slices.

    Also exposes the lane-format serving path (compress_lanes /
    decompress_lanes, models/lane_single.py CarLaneCodec): one on-device
    rans32 lane stream per image, same fused-program bit-exact closure
    and serving knobs as the flagship united codec."""

    def __init__(self, model, variables, tables: CodecTables | None = None):
        self.model = model
        self.variables = variables
        self.RansEncoder, self.RansDecoder = entropy_coder_classes()
        self.tables = tables if tables is not None else CodecTables.build(variables)
        # numpy (STATIC) so build_indexes can unroll its compare-sum;
        # 63 floats inline into the HLO as constants
        st = np.asarray(self.tables.scale_table, dtype=np.float32)
        mt = type(model)
        n_slices = len(model.slice_ch)

        self._encode_front = jax.jit(
            lambda v, x: model.apply(v, x, method=mt.encode_front)
        )
        self._hyper = jax.jit(
            lambda v, z: model.apply(v, z, method=mt.hyper_decode)
        )
        self._params = {
            i: jax.jit(
                partial(
                    lambda v, prev, hyper, idx: model.apply(
                        v, idx, prev, hyper, st, method=mt.slice_params
                    ),
                    idx=i,
                )
            )
            for i in range(n_slices)
        }
        self._sym = {
            i: jax.jit(
                partial(
                    lambda v, y, mu, idx: model.apply(
                        v, idx, y, mu, method=mt.slice_symbols
                    ),
                    idx=i,
                )
            )
            for i in range(n_slices)
        }
        self._recon = {
            i: jax.jit(
                partial(
                    lambda v, sym, mu, prev, hyper, idx: model.apply(
                        v, idx, sym, mu, prev, hyper, method=mt.slice_reconstruct
                    ),
                    idx=i,
                )
            )
            for i in range(n_slices)
        }
        self._synth = jax.jit(lambda v, y: model.apply(v, y, method=mt.synthesize))

    def compress(self, x) -> dict:
        v = self.variables
        y, z_sym_dev = self._encode_front(v, x)
        hyper = self._hyper(v, z_sym_dev)

        groups, y_hat_slices = [], []
        for i in range(len(self.model.slice_ch)):
            idx_i, mu = self._params[i](v, tuple(y_hat_slices), hyper)
            sym = self._sym[i](v, y, mu)
            y_hat_slices.append(self._recon[i](v, sym, mu, tuple(y_hat_slices), hyper))
            groups.append((sym, idx_i))

        packed = _start_host_copy(_pack_groups(groups))
        z_sym, (y_sym, y_idx) = jax.device_get((z_sym_dev, packed))
        b = z_sym.shape[0]
        eb_table = self.tables.eb["entropy_bottleneck"]
        z_idx = eb_channel_indexes(z_sym.shape)

        def encode_one(n):
            enc = self.RansEncoder()
            enc.buffer(y_sym[n], y_idx[n], self.tables.gc)
            enc_z = self.RansEncoder()
            enc_z.buffer(z_sym[n], z_idx[n], eb_table)
            return enc.flush(), enc_z.flush()

        pairs = _tmap(encode_one, b)
        return {
            "strings": [[p[0] for p in pairs], [p[1] for p in pairs]],
            "shape": (z_sym.shape[1], z_sym.shape[2]),
            "y_hat": jnp.concatenate(y_hat_slices, axis=-1),
        }

    def decompress(self, strings, shape) -> dict:
        v = self.variables
        y_strings, z_strings = strings
        b = len(y_strings)
        zh, zw = shape
        eb_table = self.tables.eb["entropy_bottleneck"]
        z_idx = eb_channel_indexes((b, zh, zw, self.model.N))
        z_sym = np.stack(
            _tmap(lambda n: self.RansDecoder(z_strings[n]).decode(z_idx[n], eb_table), b)
        )
        hyper = self._hyper(v, jnp.asarray(z_sym))

        decoders = [self.RansDecoder(y_strings[n]) for n in range(b)]
        y_hat_slices: list = []
        for i in range(len(self.model.slice_ch)):
            idx_i, mu = self._params[i](v, tuple(y_hat_slices), hyper)
            idx_np = np.asarray(idx_i)
            sym = jnp.asarray(np.stack(
                _tmap(lambda n: decoders[n].decode(idx_np[n], self.tables.gc), b)
            ))
            y_hat_slices.append(self._recon[i](v, sym, mu, tuple(y_hat_slices), hyper))

        y_hat = jnp.concatenate(y_hat_slices, axis=-1)
        return {"x_hat": self._synth(v, y_hat), "y_hat": y_hat}


class UnitedCodec(LaneServingBase):
    """compress()/decompress() for the Bi-CEE 4-group joint RGB-D codecs
    (ELIC_united family). Two bitstream pairs per image: (rgb_y, rgb_z) and
    (depth_y, depth_z), matching the reference's paired-file output
    (testing/tester_united.py:141-195)."""

    EB_NAMES = ("rgb_entropy_bottleneck", "depth_entropy_bottleneck")

    def __init__(self, model, variables, tables: CodecTables | None = None):
        self.model = model
        self.variables = variables
        self.RansEncoder, self.RansDecoder = entropy_coder_classes()
        self.tables = (
            tables
            if tables is not None
            else CodecTables.build(variables, eb_names=self.EB_NAMES)
        )
        # numpy (STATIC) so build_indexes can unroll its compare-sum;
        # 63 floats inline into the HLO as constants
        st = np.asarray(self.tables.scale_table, dtype=np.float32)
        mt = type(model)
        n_slices = len(model.slice_ch)

        self._encode_front = jax.jit(
            lambda v, r, d: model.apply(v, r, d, method=mt.encode_front)
        )
        self._hyper = jax.jit(
            lambda v, rz, dz: model.apply(v, rz, dz, method=mt.hyper_decode)
        )

        def _mk(meth, i):
            return jax.jit(
                partial(
                    lambda v, *args, idx: model.apply(v, idx, *args, st, method=meth),
                    idx=i,
                )
            )

        self._s1 = {i: _mk(mt.stage_rgb_anchor, i) for i in range(n_slices)}
        self._s2 = {i: _mk(mt.stage_depth_anchor, i) for i in range(n_slices)}
        self._s3 = {i: _mk(mt.stage_rgb_nonanchor, i) for i in range(n_slices)}
        self._s4 = {i: _mk(mt.stage_depth_nonanchor, i) for i in range(n_slices)}
        self._sym_a = {
            i: jax.jit(
                partial(
                    lambda v, y, mn, idx: model.apply(
                        v, idx, y, mn, method=mt.anchor_symbols
                    ),
                    idx=i,
                )
            )
            for i in range(n_slices)
        }
        self._sym_na = {
            i: jax.jit(
                partial(
                    lambda v, y, mn, idx: model.apply(
                        v, idx, y, mn, method=mt.nonanchor_symbols
                    ),
                    idx=i,
                )
            )
            for i in range(n_slices)
        }
        self._merge_d = jax.jit(
            lambda v, a, s, m: model.apply(v, a, s, m, method=mt.merge_depth_slice)
        )
        self._synth = jax.jit(
            lambda v, ry, dy: model.apply(v, ry, dy, method=mt.synthesize)
        )

        # bf16 serving variants of the two conv-heavy stages (RGBDC_BF16=1;
        # bench.py default).  Only the LANE path uses them: the analysis
        # front just picks which symbols get coded (encoder-internal — the
        # decoder never recomputes it) and synthesis runs after y_hat is
        # already bit-exact, so the enc/dec closure is untouched.  The
        # entropy-parameter fused programs stay f32 (they set quantization
        # boundaries and are pinned by the imported-weights golden parity).
        # Measured: front 186 -> 141 ms, synth 213 -> 170 ms per batch 16
        # (tools/prof_bf16.py); reconstruction error ~1e-2 relative.
        self._bf16_serving = os.environ.get("RGBDC_BF16", "0") == "1"

        def _cast16(t):
            return jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32
                else x,
                t,
            )

        def _front16(v, r, d):
            ry, dy, rz, dz = model.apply(
                _cast16(v), r.astype(jnp.bfloat16), d.astype(jnp.bfloat16),
                method=mt.encode_front,
            )
            return (ry.astype(jnp.float32), dy.astype(jnp.float32), rz, dz)

        def _synth16(v, ry, dy):
            out = model.apply(
                _cast16(v), ry.astype(jnp.bfloat16), dy.astype(jnp.bfloat16),
                method=mt.synthesize,
            )
            return tuple(x.astype(jnp.float32) for x in out)

        self._encode_front_srv = (
            jax.jit(_front16) if self._bf16_serving else self._encode_front
        )
        self._synth_srv = jax.jit(_synth16) if self._bf16_serving else self._synth

    def _encode_stage_flow(self, rgb, depth):
        """Drive the shared per-stage programs over all slices; returns the
        device-side (sym, idx) group lists in coding order plus y_hat.
        These are the SAME compiled program objects decompress uses — the
        bit-exact closure both wire formats rely on."""
        v = self.variables
        rgb_y, depth_y, rz_sym, dz_sym = self._encode_front(v, rgb, depth)
        rgb_hyper, depth_hyper = self._hyper(v, rz_sym, dz_sym)

        r_groups, d_groups = [], []
        r_prev, d_prev = [], []
        for i in range(len(self.model.slice_ch)):
            idx1, r_mn_a, init = self._s1[i](
                v, tuple(r_prev), tuple(d_prev), rgb_hyper, depth_hyper
            )
            r_sym_a = self._sym_a[i](v, rgb_y, r_mn_a)
            idx2, d_mn_a, r_anchor_hat, r_local = self._s2[i](
                v, r_sym_a, r_mn_a, init
            )
            d_sym_a = self._sym_a[i](v, depth_y, d_mn_a)
            idx3, r_mn_na, d_anchor_hat, d_local = self._s3[i](
                v, d_sym_a, d_mn_a, r_local, init
            )
            r_sym_na = self._sym_na[i](v, rgb_y, r_mn_na)
            idx4, d_mn_na, r_hat_slice = self._s4[i](
                v, r_anchor_hat, r_sym_na, r_mn_na, d_local, init
            )
            d_sym_na = self._sym_na[i](v, depth_y, d_mn_na)
            d_hat_slice = self._merge_d(v, d_anchor_hat, d_sym_na, d_mn_na)
            r_prev.append(r_hat_slice)
            d_prev.append(d_hat_slice)
            r_groups += [(r_sym_a, idx1), (r_sym_na, idx3)]
            d_groups += [(d_sym_a, idx2), (d_sym_na, idx4)]
        # pack each modality's 2*n_slices groups into two [B, total] wire
        # buffers on DEVICE and pull those: 4 transfers instead of ~84
        r_lens = [int(np.prod(sym.shape[1:])) for sym, _ in r_groups]
        d_lens = [int(np.prod(sym.shape[1:])) for sym, _ in d_groups]
        r_packed = _start_host_copy(_pack_groups(r_groups))
        d_packed = _start_host_copy(_pack_groups(d_groups))
        _start_host_copy((rz_sym, dz_sym))
        return (
            rz_sym, dz_sym,
            (r_packed, r_lens), (d_packed, d_lens),
            r_prev, d_prev,
        )

    def compress(self, rgb, depth) -> dict:
        rz_sym, dz_sym, (r_packed, _), (d_packed, _), r_prev, d_prev = (
            self._encode_stage_flow(rgb, depth)
        )
        rz_sym, dz_sym, (r_sym, r_idx), (d_sym, d_idx) = jax.device_get(
            (rz_sym, dz_sym, r_packed, d_packed)
        )

        b = rz_sym.shape[0]
        z_idx = eb_channel_indexes(rz_sym.shape)

        def encode_one(n):
            # the packed buffer is the y stream in exact coding order: one
            # buffer call == the old per-group loop (buffer() concatenates)
            enc_ry = self.RansEncoder()
            enc_ry.buffer(r_sym[n], r_idx[n], self.tables.gc)
            enc_rz = self.RansEncoder()
            enc_rz.buffer(rz_sym[n], z_idx[n], self.tables.eb["rgb_entropy_bottleneck"])
            enc_dy = self.RansEncoder()
            enc_dy.buffer(d_sym[n], d_idx[n], self.tables.gc)
            enc_dz = self.RansEncoder()
            enc_dz.buffer(
                dz_sym[n], z_idx[n], self.tables.eb["depth_entropy_bottleneck"]
            )
            return [enc_ry.flush(), enc_rz.flush()], [enc_dy.flush(), enc_dz.flush()]

        pairs = _tmap(encode_one, b)
        r_strings = [p[0] for p in pairs]
        d_strings = [p[1] for p in pairs]

        return {
            "r_strings": r_strings,
            "d_strings": d_strings,
            "shape": (rz_sym.shape[1], rz_sym.shape[2]),
            "y_hat": {
                "r": jnp.concatenate(r_prev, axis=-1),
                "d": jnp.concatenate(d_prev, axis=-1),
            },
        }

    def decompress(self, r_strings, d_strings, shape) -> dict:
        v = self.variables
        b = len(r_strings)
        zh, zw = shape
        c = self.model.N
        z_idx = eb_channel_indexes((b, zh, zw, c))
        rz_sym = np.stack(_tmap(
            lambda n: self.RansDecoder(r_strings[n][1]).decode(
                z_idx[n], self.tables.eb["rgb_entropy_bottleneck"]
            ),
            b,
        ))
        dz_sym = np.stack(_tmap(
            lambda n: self.RansDecoder(d_strings[n][1]).decode(
                z_idx[n], self.tables.eb["depth_entropy_bottleneck"]
            ),
            b,
        ))
        rgb_hyper, depth_hyper = self._hyper(
            v, jnp.asarray(rz_sym), jnp.asarray(dz_sym)
        )

        r_dec = [self.RansDecoder(r_strings[n][0]) for n in range(b)]
        d_dec = [self.RansDecoder(d_strings[n][0]) for n in range(b)]

        def _pull(decs, idx_dev):
            idx_np = np.asarray(idx_dev)
            return jnp.asarray(np.stack(
                _tmap(lambda n: decs[n].decode(idx_np[n], self.tables.gc), b)
            ))

        r_prev, d_prev = [], []
        for i in range(len(self.model.slice_ch)):
            idx1, r_mn_a, init = self._s1[i](
                v, tuple(r_prev), tuple(d_prev), rgb_hyper, depth_hyper
            )
            r_sym_a = _pull(r_dec, idx1)
            idx2, d_mn_a, r_anchor_hat, r_local = self._s2[i](
                v, r_sym_a, r_mn_a, init
            )
            d_sym_a = _pull(d_dec, idx2)
            idx3, r_mn_na, d_anchor_hat, d_local = self._s3[i](
                v, d_sym_a, d_mn_a, r_local, init
            )
            r_sym_na = _pull(r_dec, idx3)
            idx4, d_mn_na, r_hat_slice = self._s4[i](
                v, r_anchor_hat, r_sym_na, r_mn_na, d_local, init
            )
            d_sym_na = _pull(d_dec, idx4)
            d_hat_slice = self._merge_d(v, d_anchor_hat, d_sym_na, d_mn_na)
            r_prev.append(r_hat_slice)
            d_prev.append(d_hat_slice)

        rgb_y_hat = jnp.concatenate(r_prev, axis=-1)
        depth_y_hat = jnp.concatenate(d_prev, axis=-1)
        rgb_hat, depth_hat = self._synth(v, rgb_y_hat, depth_y_hat)
        return {
            "x_hat": {"r": rgb_hat, "d": depth_hat},
            "y_hat": {"r": rgb_y_hat, "d": depth_y_hat},
        }

    # -- lane-format (on-device decode) path ----------------------------------
    #
    # The compat path above is phase-serial on the HOST: 20 BLOCKING
    # device->host round trips per image batch (~25 ms RTT each through the
    # tunnel), because every phase's symbols must come back for the C rANS
    # decoder.  The lane path keeps the symbols on the DEVICE: the bitstream
    # is the lane-split rans32 format (coder/csrc/rans.cpp) and each slice
    # is ONE fused jitted program (4 stage computations + 4 lockstep rans
    # scans, coder/rans_tpu.py).
    #
    # Bit-exact closure, fused edition: encoder and decoder call the SAME
    # compiled fused executables — one per slice — with a runtime is_decode
    # operand selecting (lax.cond) between "decode symbols from the stream"
    # and "compute symbols from y".  The entropy parameters are produced by
    # identical machine code on both sides BY CONSTRUCTION, so the fp-jitter
    # desync that killed the earlier two-program fusion attempt (encoder and
    # decoder compiled separately -> different conv tiling -> ~1e-4 mean
    # jitter -> flipped CDF indexes) cannot occur.  Never give either side
    # its own differently-fused copy of a stage computation.
    #
    # Word matrices have a STATIC width (RGBDC_WMAX) so both modes share one
    # executable: the decoder pads its uploaded words on-device; the encoder
    # passes a cached zero matrix (its cond branch never reads it).
    #
    # Rate trade-off vs the compat format: 6 bytes/lane of container
    # overhead per stream (u32 state + u16 word count, compact v3 header;
    # +2 B/lane of u16 nibble counts only when the stream has escapes)
    # plus up to one padding u16 per lane of nibble stream; ~0.8 KB/stream
    # at 128 lanes, ~3 KB at the bench's 512.  The tester keeps the compat
    # format for reference bpp parity; this path is the serving format.

    # device-resident LUTs re-placed onto the mesh by shard_serving
    _LUT_ATTRS = ("_lut_r", "_lut_d", "_enc_lut_r", "_enc_lut_d")

    def _lane_setup(self):
        if getattr(self, "_lane_ready", False):
            return
        self._bind_coder()
        # serving env-knob snapshot (LaneServingBase._lane_knobs)
        self._lane_knobs()
        _rt = self._rt
        # combined tables: rows [0,64) = gaussian conditional, rows [64,..)
        # = the modality's entropy bottleneck (z indexes = 64 + channel)
        self._comb_r = _rt.combine_tables(
            self.tables.gc, self.tables.eb["rgb_entropy_bottleneck"]
        )
        self._comb_d = _rt.combine_tables(
            self.tables.gc, self.tables.eb["depth_entropy_bottleneck"]
        )
        # dense-capped tables (RGBDC_DENSE128=1, serving opt-in): cap every
        # CDF row at RGBDC_DENSE_CAP entries so the dense one-hot-matmul
        # lookup covers ALL rows — the 134 MB packed LUTs and the big-row
        # gather while_loops drop out of both scan bodies (and the LUT
        # HBM/upload cost disappears).  Streams CHANGE under this knob
        # (capped rows fold their tail into the escape interval), but both
        # encode paths and the decoder all read the capped _comb_* tables,
        # so every cross-path byte-identity below still holds.
        if self._dense:
            self._comb_r = _rt.cap_table(self._comb_r, self._dense_cap)
            self._comb_d = _rt.cap_table(self._comb_d, self._dense_cap)
        lanes = self.LANES
        model = self.model
        mt = type(model)
        n = model.N
        # numpy (STATIC) so build_indexes can unroll its compare-sum;
        # 63 floats inline into the HLO as constants
        st = np.asarray(self.tables.scale_table, dtype=np.float32)
        # the packed decode LUTs are ~134 MB each: they must be
        # device-resident ARGUMENTS of the jitted fns (a closure capture
        # would inline them into the HLO and re-ship them through the
        # tunnel per compile).  Under shard_serving they replicate onto
        # every chip of the mesh.
        put = (
            (lambda x: jax.device_put(x, self._replicated))
            if self._batch_sharding is not None
            else jax.device_put
        )
        if self._dense:
            # all rows ride the dense path: the packed LUTs are never
            # gathered (the big-row while_loops run zero iterations), so
            # tiny dummies stand in as the traced arguments
            self._lut_r = put(jnp.zeros((1, 2), jnp.uint32))
            self._lut_d = self._lut_r
        else:
            self._lut_r = put(jnp.asarray(_rt.build_lut(self._comb_r)))
            self._lut_d = put(jnp.asarray(_rt.build_lut(self._comb_d)))
        # dense small-row CDFs (numpy constants, ~17 KB inlined into the
        # fused programs): gather-free decode for the narrow-sigma rows a
        # trained codec concentrates on (rans_tpu.build_small_tables).
        # k_cap 40 (rows 0..26) instead of the max 66: the dense-row
        # compare/select width is paid PER SYMBOL, and the trained
        # checkpoint's symbols live on rows 0..21 — mid rows fall back to
        # the packed-LUT while_loop (measured ~7% off the decode scan,
        # tools/prof_lanes2.py k_cap sweep)
        if self._dense:
            # dense-total small tables: every (capped) row fits, so the
            # prefix covers the whole table and is_small is always true
            cap_len = int(max(self._comb_r.cdf_length.max(),
                              self._comb_d.cdf_length.max()))
            self._small_r = _rt.build_small_tables(
                self._comb_r, k_cap=cap_len, r_max=1 << 30
            )
            self._small_d = _rt.build_small_tables(
                self._comb_d, k_cap=cap_len, r_max=1 << 30
            )
            assert self._small_r[3] == self._comb_r.cdf.shape[0]
            assert self._small_d[3] == self._comb_d.cdf.shape[0]
            # y-group decode tables: y indexes are always gaussian rows
            # (< 64), so the y scans' one-hot needs only that prefix — a
            # 4x narrower matmul/compare per row than the combined table
            # (z scans keep the combined table: their idx start at 64)
            y_rows = self.tables.gc.cdf.shape[0]
            self._small_y = {
                m: (s[0][:y_rows], s[1][:y_rows], s[2][:y_rows], y_rows)
                for m, s in (("r", self._small_r), ("d", self._small_d))
            }
            self._enc_lut_r = put(jnp.zeros((1,), jnp.uint32))
            self._enc_lut_d = self._enc_lut_r
        else:
            kcap = int(os.environ.get("RGBDC_SMALL_KCAP", "40"))
            self._small_r = _rt.build_small_tables(self._comb_r, k_cap=kcap)
            self._small_d = _rt.build_small_tables(self._comb_d, k_cap=kcap)
            # encode LUTs for the on-device reverse-scan encoder (64 MB each)
            self._enc_lut_r = put(jnp.asarray(_rt.build_enc_lut(self._comb_r)))
            self._enc_lut_d = put(jnp.asarray(_rt.build_enc_lut(self._comb_d)))
        # per-row (offset, maxv) as SMALL static tables for the escape-count
        # guard — looked up with compare-sums, not gathers (docs/PERF.md)
        self._row_off = {
            "r": np.asarray(self._comb_r.offset, np.int32),
            "d": np.asarray(self._comb_d.offset, np.int32),
        }
        # the static CDF row every sigma clamps to under the serving floor
        from ..entropy.gaussian import SCALE_BOUND

        bound = float(os.environ.get("RGBDC_SCALE_BOUND", SCALE_BOUND))
        self._floor_row = int(
            np.searchsorted(self.tables.scale_table[:-1], bound, side="left")
        )
        # host-encode pull format: "compact" (5-bit syms, idx skipped when
        # every index clamps to the floor row) or "sym5idx" (5-bit syms +
        # real u8 idx stream — the right format for TRAINED models with
        # live sigma predictions).  "auto" starts compact and self-tunes:
        # if a compress sees the idx-mismatch fallback on every slice, the
        # next compress switches to sym5idx.
        # (All serving knobs were snapshotted by _lane_knobs at the top.)
        self._row_maxv = {
            "r": np.asarray(self._comb_r.cdf_length - 2, np.int32),
            "d": np.asarray(self._comb_d.cdf_length - 2, np.int32),
        }

        # y scans use the gaussian-prefix tables in dense mode (narrower
        # one-hot); the z scans below always get the combined tables
        zc_small_r, zc_small_d = self._small_r, self._small_d
        if self._dense:
            small_r, small_d = self._small_y["r"], self._small_y["d"]
        else:
            small_r, small_d = self._small_r, self._small_d

        # escape-fixup decode (RGBDC_DEC_ESCFIX=1, serving opt-in): the
        # decode scan body drops its escape while_loop (bypass nibbles
        # never touch the rANS state), and escape VALUES are reconstructed
        # per group in a post-scan pass over escape ordinals
        # (rans_tpu._escape_fixup).  Bit-exact by construction; the per-row
        # (offset, maxv) tables are a few hundred int32 constants.
        if self._escfix_on:
            escfix_r = (
                jnp.asarray(self._row_off["r"]), jnp.asarray(self._row_maxv["r"])
            )
            escfix_d = (
                jnp.asarray(self._row_off["d"]), jnp.asarray(self._row_maxv["d"])
            )
        else:
            escfix_r = escfix_d = None

        # Pallas decode backend / one-hot word fetch / bf16 flow: parsed
        # and validated by _lane_knobs (docs in lane_base.py).  NOTE the
        # Pallas word-capacity tax: the kernel's renorm fetch is a one-hot
        # over the WMAX columns, so serve with RGBDC_WMAX sized to real
        # streams (e.g. 128), not the padded default.
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

        def dec_group(st3, words, byp, lut, idx, small=None, escfix=None):
            b = idx.shape[0]
            carry = _rt.LaneState(*st3)
            carry, flat = _rt.decode_group(
                carry, words, byp, idx.astype(jnp.int32).reshape(b, -1), lut,
                lanes, small=small, escfix=escfix, pallas=dec_pallas,
                unroll=self._dec_unroll, wfetch1h=self._wfetch1h,
            )
            return tuple(carry), flat.reshape(idx.shape).astype(jnp.int16)

        def fused_z(v, r_st3, r_words, r_byp, d_st3, d_words, d_byp,
                    rz_enc, dz_enc, is_decode, lut_r, lut_d):
            """z scans (decode mode) + the shared hyper-decode program."""
            b, zh, zw, _ = rz_enc.shape
            c = jnp.arange(n, dtype=jnp.int32) + 64
            zidx = jnp.broadcast_to(c, (b, zh, zw, n)).reshape(b, -1)

            def dec_mod(st3, words, byp, lut, escfix, small):
                # z rows live ABOVE the small prefix in the classic mode
                # (LUT path); in dense mode the capped table covers them,
                # and the dummy-LUT gather must never run
                carry = _rt.LaneState(*st3)
                # z stays on the XLA scan even under RGBDC_DEC_PALLAS: z is
                # ~2-4% of the symbols, and its combined-table one-hot
                # (64 + N rows) would quadruple the kernel's matmul width
                # and VMEM footprint for no meaningful win
                carry, flat = _rt.decode_group(
                    carry, words, byp, zidx, lut, lanes, escfix=escfix,
                    small=small, unroll=self._dec_unroll,
                    wfetch1h=self._wfetch1h,
                )
                return tuple(carry), flat.reshape(b, zh, zw, n)

            z_small_r = zc_small_r if self._dense else None
            z_small_d = zc_small_d if self._dense else None
            r_st3, rz = jax.lax.cond(
                is_decode,
                lambda: dec_mod(r_st3, r_words, r_byp, lut_r, escfix_r,
                                z_small_r),
                lambda: (r_st3, rz_enc),
            )
            d_st3, dz = jax.lax.cond(
                is_decode,
                lambda: dec_mod(d_st3, d_words, d_byp, lut_d, escfix_d,
                                z_small_d),
                lambda: (d_st3, dz_enc),
            )
            rh, dh = sapply(v, rz, dz, method=mt.hyper_decode)
            return r_st3, d_st3, rz, dz, rh, dh

        def fused_slice(v, i, r_prev, d_prev, rh, dh, rgb_y, depth_y,
                        r_st3, r_words, r_byp, d_st3, d_words, d_byp,
                        is_decode, lut_r, lut_d):
            """One slice of the 4-group schedule: stage params + symbol
            source (scan decode OR quantize-from-y) for all four groups."""
            idx1, r_mn_a, init = sapply(
                v, i, r_prev, d_prev, rh, dh, st, method=mt.stage_rgb_anchor
            )
            r_st3, r_sym_a = jax.lax.cond(
                is_decode,
                lambda: dec_group(r_st3, r_words, r_byp, lut_r, idx1, small_r,
                                  escfix_r),
                lambda: (r_st3,
                         model.apply(v, i, rgb_y, r_mn_a, method=mt.anchor_symbols)),
            )
            idx2, d_mn_a, r_anchor_hat, r_local = sapply(
                v, i, r_sym_a, r_mn_a, init, st, method=mt.stage_depth_anchor
            )
            d_st3, d_sym_a = jax.lax.cond(
                is_decode,
                lambda: dec_group(d_st3, d_words, d_byp, lut_d, idx2, small_d,
                                  escfix_d),
                lambda: (d_st3,
                         model.apply(v, i, depth_y, d_mn_a, method=mt.anchor_symbols)),
            )
            idx3, r_mn_na, d_anchor_hat, d_local = sapply(
                v, i, d_sym_a, d_mn_a, r_local, init, st,
                method=mt.stage_rgb_nonanchor,
            )
            r_st3, r_sym_na = jax.lax.cond(
                is_decode,
                lambda: dec_group(r_st3, r_words, r_byp, lut_r, idx3, small_r,
                                  escfix_r),
                lambda: (r_st3,
                         model.apply(v, i, rgb_y, r_mn_na, method=mt.nonanchor_symbols)),
            )
            idx4, d_mn_na, r_hat_slice = sapply(
                v, i, r_anchor_hat, r_sym_na, r_mn_na, d_local, init, st,
                method=mt.stage_depth_nonanchor,
            )
            d_st3, d_sym_na = jax.lax.cond(
                is_decode,
                lambda: dec_group(d_st3, d_words, d_byp, lut_d, idx4, small_d,
                                  escfix_d),
                lambda: (d_st3,
                         model.apply(v, i, depth_y, d_mn_na, method=mt.nonanchor_symbols)),
            )
            d_hat_slice = model.apply(
                v, d_anchor_hat, d_sym_na, d_mn_na, method=mt.merge_depth_slice
            )
            return (
                r_hat_slice, d_hat_slice, r_st3, d_st3,
                (r_sym_a, idx1), (r_sym_na, idx3),
                (d_sym_a, idx2), (d_sym_na, idx4),
            )

        jfz = jax.jit(fused_z)
        self._fused_z = lambda v, *a: jfz(v, *a, self._lut_r, self._lut_d)
        self._fused_z_body_u = fused_z
        self._fused_slice_body_u = fused_slice

        def make_fs(i):
            f = jax.jit(lambda v, *a: fused_slice(v, i, *a))
            return lambda v, *a: f(v, *a, self._lut_r, self._lut_d)

        self._fused_slice = {i: make_fs(i) for i in range(len(model.slice_ch))}
        self._make_pad_to()
        self._lane_ready = True

    def _fused_flow(self, v, rgb_y, depth_y, rz_sym, dz_sym,
                    r_st3, r_words, r_byp, d_st3, d_words, d_byp, is_decode,
                    pack=False):
        """Drive the fused programs over all slices (both modes).

        pack=True (encode): each slice's 4 (sym, idx) groups are packed to
        [B, len] wire buffers ON DEVICE right after the slice's program is
        dispatched and their d2h copies start immediately — the ~40 MB of
        wire tensors cross the link UNDER the remaining slices' compute
        instead of as a 1.6 s serial tail (docs/PERF.md phase table).
        Returns per-slice packed chunk lists instead of raw group lists.

        RGBDC_FUSE_SLICES=1: the z program + every fused slice traced into
        ONE executable — identical op sequence, so the enc/dec closure is
        preserved by construction; the win is cold-compile time (one big
        program compiles ~2.5x faster than 11 through the remote-compile
        tunnel — measured on MLIC, docs/PERF.md round 4) at neutral
        throughput.  BOTH directions must run this same executable: if the
        host-encode pack path kept the per-slice programs while decode ran
        the fused one, cross-program fp jitter could flip quantization
        boundaries and desync the coder (advisor r4).  So under _fuse_all
        the pack path runs the fused program too and packs its outputs
        per slice afterwards — the d2h copies then all start after the one
        big program instead of overlapping the remaining slices' compute;
        the chunked pipeline (compress_pipelined / BENCH_CHUNKS) hides
        that tail under the next chunk's device stages."""
        if self._fuse_all:
            out = self._fused_flow_all_united(
                v, rgb_y, depth_y, rz_sym, dz_sym,
                r_st3, r_words, r_byp, d_st3, d_words, d_byp, is_decode,
            )
            if not pack:
                return out
            rz, dz, r_flat, d_flat, r_prev, d_prev = out
            _start_host_copy((rz, dz))
            r_out, d_out = [], []
            for i in range(len(self.model.slice_ch)):
                g_ra, g_rna = r_flat[2 * i], r_flat[2 * i + 1]
                g_da, g_dna = d_flat[2 * i], d_flat[2 * i + 1]
                if self._pull_mode == "sym5idx":
                    r_out.append(
                        (_start_host_copy(_pack_groups_i8_idx([g_ra, g_rna])),
                         (g_ra, g_rna))
                    )
                    d_out.append(
                        (_start_host_copy(_pack_groups_i8_idx([g_da, g_dna])),
                         (g_da, g_dna))
                    )
                else:
                    mode = self._floor_row
                    r_out.append(
                        (_start_host_copy(_pack_groups_i8([g_ra, g_rna], mode)),
                         (g_ra, g_rna))
                    )
                    d_out.append(
                        (_start_host_copy(_pack_groups_i8([g_da, g_dna], mode)),
                         (g_da, g_dna))
                    )
            return rz, dz, r_out, d_out, r_prev, d_prev
        r_st3, d_st3, rz, dz, rh, dh = self._fused_z(
            v, r_st3, r_words, r_byp, d_st3, d_words, d_byp, rz_sym, dz_sym,
            is_decode,
        )
        if pack:
            _start_host_copy((rz, dz))
        r_prev, d_prev = [], []
        r_out, d_out = [], []
        for i in range(len(self.model.slice_ch)):
            (r_hat, d_hat, r_st3, d_st3,
             g_ra, g_rna, g_da, g_dna) = self._fused_slice[i](
                v, tuple(r_prev), tuple(d_prev), rh, dh, rgb_y, depth_y,
                r_st3, r_words, r_byp, d_st3, d_words, d_byp, is_decode,
            )
            r_prev.append(r_hat)
            d_prev.append(d_hat)
            if pack:
                if self._pull_mode == "sym5idx":
                    r_out.append(
                        (_start_host_copy(_pack_groups_i8_idx([g_ra, g_rna])),
                         (g_ra, g_rna))
                    )
                    d_out.append(
                        (_start_host_copy(_pack_groups_i8_idx([g_da, g_dna])),
                         (g_da, g_dna))
                    )
                else:
                    mode = self._floor_row
                    r_out.append(
                        (_start_host_copy(_pack_groups_i8([g_ra, g_rna], mode)),
                         (g_ra, g_rna))
                    )
                    d_out.append(
                        (_start_host_copy(_pack_groups_i8([g_da, g_dna], mode)),
                         (g_da, g_dna))
                    )
            else:
                r_out += [g_ra, g_rna]
                d_out += [g_da, g_dna]
        return rz, dz, r_out, d_out, r_prev, d_prev

    def _fused_flow_all_united(self, v, rgb_y, depth_y, rz_sym, dz_sym,
                               r_st3, r_words, r_byp, d_st3, d_words, d_byp,
                               is_decode):
        prog = getattr(self, "_fuse_all_prog_u", None)
        if prog is None:
            z_body = self._fused_z_body_u
            s_body = self._fused_slice_body_u
            nsl = len(self.model.slice_ch)

            @jax.jit
            def whole(v, rgb_y, depth_y, rz_sym, dz_sym,
                      r_st3, r_words, r_byp, d_st3, d_words, d_byp,
                      is_decode, lut_r, lut_d):
                r_st3, d_st3, rz, dz, rh, dh = z_body(
                    v, r_st3, r_words, r_byp, d_st3, d_words, d_byp,
                    rz_sym, dz_sym, is_decode, lut_r, lut_d,
                )
                r_prev, d_prev = [], []
                r_out, d_out = [], []
                for i in range(nsl):
                    (r_hat, d_hat, r_st3, d_st3,
                     g_ra, g_rna, g_da, g_dna) = s_body(
                        v, i, tuple(r_prev), tuple(d_prev), rh, dh,
                        rgb_y, depth_y, r_st3, r_words, r_byp,
                        d_st3, d_words, d_byp, is_decode, lut_r, lut_d,
                    )
                    r_prev.append(r_hat)
                    d_prev.append(d_hat)
                    r_out += [g_ra, g_rna]
                    d_out += [g_da, g_dna]
                return rz, dz, r_out, d_out, r_prev, d_prev

            prog = self._fuse_all_prog_u = whole
        return prog(
            v, rgb_y, depth_y, rz_sym, dz_sym,
            r_st3, r_words, r_byp, d_st3, d_words, d_byp, is_decode,
            self._lut_r, self._lut_d,
        )

    def _device_encode_setup(self, b, zshape, group_lens):
        """Jitted program: concat z + y groups in coding order and run the
        on-device reverse-scan rans32 encoder for both modality streams.
        Returns per-stream (states, wcounts, words, esc_cnt, esc_pos,
        esc_pack) — the last two are the COMPACTED escape sideband
        ([b, ESC_CAP] coding positions and (idx<<16 | sym&0xffff) packs)
        the host unpacks into bypass nibble streams, so no symbol-sized
        tensor ever crosses the link.  Folded into the encode program (a
        separate sideband program measured 288 ms/batch-16 re-doing the
        symbol assembly and 256-row lookups, docs/PERF.md)."""
        key = (b, zshape, tuple(group_lens))
        cache = getattr(self, "_dev_enc_cache", {})
        if key in cache:
            return cache[key]
        n = self.model.N
        zh, zw = zshape
        z_len = zh * zw * n
        all_lens = [z_len] + [int(g) for g in group_lens]
        off_r, off_d = self._row_off["r"], self._row_off["d"]
        mv_r, mv_d = self._row_maxv["r"], self._row_maxv["d"]

        # single-stream encoder body (LaneServingBase._mk_stream_encoder),
        # instantiated once per modality below
        one = self._mk_stream_encoder(b, zh, zw, n, all_lens)

        # dense mode splits the encode scan at the z/y boundary: y rows
        # (96% of the scan) use the 64-row gaussian prefix, the z segment
        # the combined table (byte-identical streams — same row order)
        if self._dense:
            small_r, small_d = self._small_y["r"], self._small_y["d"]
            small_z_r, small_z_d = self._small_r, self._small_d
        else:
            small_r, small_d = self._small_r, self._small_d
            small_z_r = small_z_d = None

        def run(rz, dz, r_groups, d_groups, lut_r, lut_d):
            return (
                one(rz, r_groups, lut_r, off_r, mv_r, small_r, small_z_r),
                one(dz, d_groups, lut_d, off_d, mv_d, small_d, small_z_d),
            )

        jrun = jax.jit(run)
        fn = lambda rz, dz, rg, dg: jrun(
            rz, dz, rg, dg, self._enc_lut_r, self._enc_lut_d
        )
        cache[key] = (fn, all_lens)
        self._dev_enc_cache = cache
        return fn, all_lens

    def warm_serving(self, batch: int, image_hw=(512, 640)) -> None:
        """Compile the serving executables with maximal overlap (cold-start
        lever, VERDICT r4 task 5).

        A first roundtrip compiles the four dominant programs SERIALLY —
        encode front, the fused slice-flow executable, the device-encode
        scans, synthesis — each paying its own remote-compile round trip
        (the MLIC fuse lesson: per-program overhead through the tunnel is
        tens of seconds, docs/PERF.md round 4).  This drives each program
        once with zero inputs at the REAL serving signatures, the three
        smaller ones on worker threads while the main thread compiles the
        fused executable: tracing interleaves on the GIL, but the XLA
        compile RPCs (GIL-released) pipeline.  The jit caches then make
        the first real roundtrip compile-free.  A signature mismatch here
        is a soft failure (that program just compiles again on first real
        use)."""
        self._lane_setup()
        v = self.variables
        h, w = image_hw
        b = batch
        yh, yw, zh, zw = h // 16, w // 16, h // 64, w // 64
        n, m = self.model.N, self.model.M
        y0 = jnp.zeros((b, yh, yw, m), jnp.float32)
        z0 = jnp.zeros((b, zh, zw, n), jnp.int32)
        st3, zwords, zbyp = self._dummy_lane_inputs(b)

        def block(tree):
            for leaf in jax.tree_util.tree_leaves(tree):
                if hasattr(leaf, "block_until_ready"):
                    leaf.block_until_ready()
                    return

        def warm_front():
            block(self._encode_front_srv(
                v, jnp.zeros((b, h, w, 3)), jnp.zeros((b, h, w, 1))
            ))

        def warm_synth():
            block(self._synth_srv(v, y0, y0))

        def warm_encode():
            # the group wire tensors of the fused flow: per slice, anchor +
            # nonanchor (sym i16, idx u8) in the checkerboard-squeeze
            # layout [B, yh, yw/2, c]
            def g(c):
                sh = (b, yh, yw // 2, c)
                return (jnp.zeros(sh, jnp.int16), jnp.zeros(sh, jnp.uint8))

            rg = [g(c) for c in self.model.slice_ch for _ in range(2)]
            dg = [g(c) for c in self.model.slice_ch for _ in range(2)]
            y_lens = [int(np.prod(t[0].shape[1:])) for t in rg]
            enc_fn, _ = self._device_encode_setup(b, (zh, zw), y_lens)
            block(enc_fn(z0, z0, rg, dg))

        workers = [warm_front, warm_synth]
        if os.environ.get("RGBDC_DEVICE_ENCODE", "0") == "1":
            workers.append(warm_encode)
        pool = ThreadPoolExecutor(len(workers))
        futs = [pool.submit(f) for f in workers]
        block(self._fused_flow(
            v, y0, y0, z0, z0, st3, zwords, zbyp, st3, zwords, zbyp,
            jnp.asarray(False),
        ))
        for f in futs:
            f.result()
        pool.shutdown(wait=False)

    def compress_lanes(self, rgb, depth) -> dict:
        """Encode into the lane-split wire format (one stream per modality
        per image).  Default path (RGBDC_DEVICE_ENCODE=0): the fused flow
        runs on device, the wire tensors are pulled (packed) to the host,
        and the C rANS encoder builds the streams there.

        Opt-in path (RGBDC_DEVICE_ENCODE=1): fully ON-DEVICE encoding —
        the fused flow leaves the wire tensors on the chip, the
        reverse-scan rans32 encoder (coder/rans_tpu.py encode_groups)
        produces the per-lane word streams there, and only ~stream-sized
        bytes cross the link.  Escape symbols (absent under the serving
        sigma floor) divert to a host nibble-assembly slow path.  Host
        stays the default on the tunneled single-chip dev setup because
        the encoder scan's device time serializes with the decoder there
        and slightly exceeds what the smaller pull saves (5.9 vs 6.6
        img/s measured); on a real TPU host — fast PCIe, scarce host
        CPU — the device path keeps the host out of the hot loop
        entirely."""
        self._lane_setup()
        v = self.variables
        rgb, depth = self._put_batch((rgb, depth))
        rgb_y, depth_y, rz_sym, dz_sym = self._encode_front_srv(v, rgb, depth)
        b = rgb.shape[0]
        zst3, zw, zb = self._dummy_lane_inputs(b)
        if os.environ.get("RGBDC_DEVICE_ENCODE", "0") != "1":
            return self._compress_lanes_host(
                v, rgb_y, depth_y, rz_sym, dz_sym, b, zst3, zw, zb
            )

        rz2, dz2, r_groups, d_groups, r_prev, d_prev = self._fused_flow(
            v, rgb_y, depth_y, rz_sym, dz_sym,
            zst3, zw, zb, zst3, zw, zb, jnp.asarray(False),
        )
        r_y_hat = jnp.concatenate(r_prev, axis=-1)
        d_y_hat = jnp.concatenate(d_prev, axis=-1)
        y_lens = [int(np.prod(g[0].shape[1:])) for g in r_groups]
        zshape = (int(rz_sym.shape[1]), int(rz_sym.shape[2]))
        enc_fn, all_lens = self._device_encode_setup(b, zshape, y_lens)
        ((rs, rwc, rwords, resc, rpos, rpack),
         (ds, dwc, dwords, desc_, dpos, dpack)) = enc_fn(
            rz2, dz2, r_groups, d_groups
        )
        _start_host_copy((rs, rwc, resc, rpos, rpack, ds, dwc, desc_, dpos, dpack))

        _slicer = self._slicer

        # SPECULATIVE overlap (the link round trips are the serial tail of
        # compress on a tunneled host): dispatch the words slice at the
        # PREVIOUS batch's bucket width before the counts arrive — the
        # transfer rides the link while the counts round-trip; a
        # misprediction just re-pulls at the right width.
        wb_spec = getattr(self, "_last_wb", None)
        spec_words = None
        if wb_spec is not None:
            spec_words = _start_host_copy(
                (_slicer(wb_spec)(rwords), _slicer(wb_spec)(dwords))
            )

        rs, rwc, resc, ds, dwc, desc_ = jax.device_get(
            (rs, rwc, resc, ds, dwc, desc_)
        )
        wmax_used = int(max(rwc.max(), dwc.max()))
        if wmax_used > self.WMAX:
            raise ValueError(
                f"device encoder needs {wmax_used} words/lane > "
                f"RGBDC_WMAX={self.WMAX}; raise the env var"
            )
        wb = min(-(-max(wmax_used, 1) // self.WORD_BUCKET) * self.WORD_BUCKET,
                 self.WMAX)
        if wb_spec is not None and wmax_used <= wb_spec:
            wb = wb_spec
            rwords_h, dwords_h = jax.device_get(spec_words)
        else:
            rwords_h, dwords_h = jax.device_get(
                (_slicer(wb)(rwords), _slicer(wb)(dwords))
            )
        self._last_wb = wb
        if os.environ.get("RGBDC_DEBUG_PULL"):
            import sys

            print(
                f"[device-encode] wmax_used={wmax_used} wb={wb} "
                f"words_pull={2 * 2 * b * self.LANES * wb / 1e6:.1f} MB "
                f"esc r={int(resc.sum())} d={int(desc_.sum())} "
                f"(max/img {int(max(resc.max(), desc_.max()))})",
                file=sys.stderr,
            )

        r_esc_info = d_esc_info = None
        self.last_esc_path = None
        if int(resc.sum()) or int(desc_.sum()):
            if int(max(resc.max(), desc_.max())) <= self.ESC_CAP:
                self.last_esc_path = "sideband"
                # normal trained-stream case: a handful of escapes — the
                # compacted (position, idx<<16|sym) sideband came along
                # with the main outputs (~100 KB, already in flight)
                from ..coder.rans_tpu import escape_chunks_at

                rpos_h, rpack_h, dpos_h, dpack_h = jax.device_get(
                    (rpos, rpack, dpos, dpack)
                )

                def side_info(pos_h, pack_h, cnts, table):
                    out = []
                    for i in range(b):
                        c = int(cnts[i])
                        pk = pack_h[i][:c]
                        sym = (pk & 0xFFFF).astype(np.uint16).view(np.int16)
                        idx = (pk >> 16).astype(np.uint8)
                        out.append(
                            escape_chunks_at(pos_h[i][:c], sym, idx, table)
                        )
                    return out

                r_esc_info = side_info(rpos_h, rpack_h, resc, self._comb_r)
                d_esc_info = side_info(dpos_h, dpack_h, desc_, self._comb_d)
            else:
                # pathological stream (untrained model / adversarial
                # content): fall back to the full wire-tensor pull
                self.last_esc_path = "full"
                from ..coder.rans_tpu import escape_chunks

                r_sym, r_idx = jax.device_get(_pack_groups(list(r_groups)))
                d_sym, d_idx = jax.device_get(_pack_groups(list(d_groups)))
                rz_h, dz_h = jax.device_get((rz2, dz2))
                zi = (eb_channel_indexes(rz_h.shape) + 64).astype(np.uint8)

                def full(zh_, ys, yi, i):
                    z16 = np.clip(zh_[i], -32768, 32767).astype(np.int16).reshape(-1)
                    return (np.concatenate([z16, ys[i]]),
                            np.concatenate([zi[i].reshape(-1), yi[i]]))

                r_esc_info = [
                    escape_chunks(*full(rz_h, r_sym, r_idx, i), self._comb_r)
                    for i in range(b)
                ]
                d_esc_info = [
                    escape_chunks(*full(dz_h, d_sym, d_idx, i), self._comb_d)
                    for i in range(b)
                ]

        def asm(states, wc, words, esc_info):
            from ..coder.rans import (
                assemble_lanes_containers_batch, build_nibble_streams,
            )

            nib_lists = (
                [build_nibble_streams(esc_info[i], all_lens, self.LANES)
                 for i in range(b)]
                if esc_info is not None else None
            )
            return assemble_lanes_containers_batch(states, wc, words, nib_lists)

        r_streams = asm(rs, rwc, rwords_h, r_esc_info)
        d_streams = asm(ds, dwc, dwords_h, d_esc_info)
        return {
            "r_streams": r_streams,
            "d_streams": d_streams,
            "shape": zshape,
            "y_hat": {"r": r_y_hat, "d": d_y_hat},
        }

    def _compress_lanes_host(self, v, rgb_y, depth_y, rz_sym, dz_sym,
                             b, zst3, zw, zb):
        """Host C-encoder path (RGBDC_DEVICE_ENCODE=0): per-slice packed i8
        pulls + threaded lanes_encode."""
        rz_sym, dz_sym, r_chunks, d_chunks, r_prev, d_prev = self._fused_flow(
            v, rgb_y, depth_y, rz_sym, dz_sym,
            zst3, zw, zb, zst3, zw, zb, jnp.asarray(False), pack=True,
        )
        r_y_hat = jnp.concatenate(r_prev, axis=-1)
        d_y_hat = jnp.concatenate(d_prev, axis=-1)
        r_packed = [c[0] for c in r_chunks]
        d_packed = [c[0] for c in d_chunks]
        rz_sym, dz_sym, r_pulled, d_pulled = jax.device_get(
            (rz_sym, dz_sym, r_packed, d_packed)
        )

        mode = self._floor_row
        pull_mode = self._pull_mode
        self.last_fallback_slices = 0
        self.last_fast_slices = 0

        def widen(pulled, chunks):
            """Host-side widening of the packed pulls.

            compact mode: 5-bit unpack + constant-mode idx reconstruction;
            exact re-pull on symbol overflow / index mismatch (the normal
            case for a TRAINED codec with live sigma predictions — the
            compact path's idx skip fires when the serving sigma floor
            clamps every index to one row).

            sym5idx mode (live sigmas): 5-bit unpack + the REAL u8 index
            stream pulled alongside (1.67 B/symbol instead of the 3
            B/symbol exact fallback); exact re-pull on overflow only.

            The counters let tests and bench assert which path ran."""
            out = []
            for entry, (_, groups) in zip(pulled, chunks):
                t = sum(int(np.prod(g.shape[1:])) for g, _ in groups)
                if pull_mode == "sym5idx":
                    packed, ovf, idx = entry
                    if int(ovf.max()) == 0:
                        out.append((_unpack_sym5(packed, t), np.asarray(idx)))
                        self.last_fast_slices += 1
                    else:
                        out.append(jax.device_get(_pack_groups(list(groups))))
                        self.last_fallback_slices += 1
                    continue
                packed, ovf, diff = entry
                if int(ovf.max()) == 0 and int(diff.max()) == 0:
                    sym = _unpack_sym5(packed, t)
                    out.append((sym, np.full(sym.shape, mode, np.uint8)))
                    self.last_fast_slices += 1
                else:
                    out.append(jax.device_get(_pack_groups(list(groups))))
                    self.last_fallback_slices += 1
            return out

        r_pulled = widen(r_pulled, r_chunks)
        d_pulled = widen(d_pulled, d_chunks)
        if (
            self._pull_auto
            and pull_mode == "compact"
            and self.last_fallback_slices == len(r_chunks) + len(d_chunks)
        ):
            # every slice missed the idx skip: live sigma predictions —
            # subsequent compresses pull sym5+idx directly (1.67 B/sym
            # streamed async) instead of falling back to the 3 B/sym
            # exact pull after the counts arrive
            self._pull_mode = "sym5idx"
        z_idx = (eb_channel_indexes(rz_sym.shape) + 64).astype(np.uint8)

        def lens_of(chunks):
            # real per-group symbol counts from the chunk's group tensors —
            # do NOT infer as packed_width // 2: that silently assumes the
            # anchor and nonanchor groups are exactly equal size
            return [
                int(np.prod(g.shape[1:])) for _, groups in chunks for g, _ in groups
            ]

        r_lens, d_lens = lens_of(r_chunks), lens_of(d_chunks)

        def build_stream(n_img, z_sym, chunks, lens, table):
            z = np.clip(z_sym[n_img], -32768, 32767).astype(np.int16).reshape(-1)
            return self._lanes_encode(
                np.concatenate([z] + [c[0][n_img] for c in chunks]),
                np.concatenate(
                    [z_idx[n_img].reshape(-1)] + [c[1][n_img] for c in chunks]
                ),
                [z.size] + list(lens),
                table,
                lanes=self.LANES,
            )

        r_streams = _tmap(
            lambda i: build_stream(i, rz_sym, r_pulled, r_lens, self._comb_r), b
        )
        d_streams = _tmap(
            lambda i: build_stream(i, dz_sym, d_pulled, d_lens, self._comb_d), b
        )
        return {
            "r_streams": r_streams,
            "d_streams": d_streams,
            "shape": (rz_sym.shape[1], rz_sym.shape[2]),
            "y_hat": {"r": r_y_hat, "d": d_y_hat},
        }

    def prepare_decode_lanes(self, r_streams, d_streams):
        """Parse + upload a batch's lane containers ahead of time.

        The host-side container parse (numpy) and the h2d dispatches are
        the serial head of ``decompress_lanes``; a pipelined server runs
        this stage for batch i+1 while batch i's decode chain is still on
        the device (bench.py BENCH_DEPTH>=3), keeping the device queue
        non-empty across the batch boundary.  Returns an opaque handle
        for ``decompress_lanes(..., prepared=...)``."""
        self._lane_setup()
        return (self._stack_streams(r_streams), self._stack_streams(d_streams))

    def decompress_lanes(self, r_streams, d_streams, shape, prepared=None) -> dict:
        """On-device decode: upload the bitstreams once, then run the SAME
        fused executables compress_lanes drove, with is_decode=True — all
        async dispatches, zero blocking host pulls."""
        self._lane_setup()
        v = self.variables
        zh, zw = int(shape[0]), int(shape[1])
        b = len(r_streams)
        if prepared is None:
            prepared = self.prepare_decode_lanes(r_streams, d_streams)
        (r_st3, r_words, r_byp), (d_st3, d_words, d_byp) = prepared
        n, m = self.model.N, self.model.M
        rz0 = jnp.zeros((b, zh, zw, n), jnp.int32)
        y0 = jnp.zeros((b, zh * 4, zw * 4, m), jnp.float32)

        _, _, _, _, r_prev, d_prev = self._fused_flow(
            v, y0, y0, rz0, rz0,
            r_st3, r_words, r_byp,
            d_st3, d_words, d_byp, jnp.asarray(True),
        )
        rgb_y_hat = jnp.concatenate(r_prev, axis=-1)
        depth_y_hat = jnp.concatenate(d_prev, axis=-1)
        rgb_hat, depth_hat = self._synth_srv(v, rgb_y_hat, depth_y_hat)
        return {
            "x_hat": {"r": rgb_hat, "d": depth_hat},
            "y_hat": {"r": rgb_y_hat, "d": depth_y_hat},
        }

    # -- chunked pipelining ---------------------------------------------------
    #
    # The host link is RTT-bound (~25 ms per blocking dispatch through the
    # tunnel); splitting the batch into chunks on separate threads hides one
    # chunk's host coding + transfers under another chunk's device stages.

    def compress_pipelined(self, rgb, depth, chunks: int = 2) -> dict:
        b = rgb.shape[0]
        if chunks <= 1 or b < chunks:
            return self.compress(rgb, depth)
        bounds = _chunk_bounds(b, chunks)
        outs = list(
            _CHUNK_POOL.map(
                lambda se: self.compress(rgb[se[0] : se[1]], depth[se[0] : se[1]]),
                bounds,
            )
        )
        return {
            "r_strings": [x for o in outs for x in o["r_strings"]],
            "d_strings": [x for o in outs for x in o["d_strings"]],
            "shape": outs[0]["shape"],
            "y_hat": {
                "r": jnp.concatenate([o["y_hat"]["r"] for o in outs], axis=0),
                "d": jnp.concatenate([o["y_hat"]["d"] for o in outs], axis=0),
            },
        }

    def decompress_pipelined(self, r_strings, d_strings, shape, chunks: int = 2):
        b = len(r_strings)
        if chunks <= 1 or b < chunks:
            return self.decompress(r_strings, d_strings, shape)
        bounds = _chunk_bounds(b, chunks)
        outs = list(
            _CHUNK_POOL.map(
                lambda se: self.decompress(
                    r_strings[se[0] : se[1]], d_strings[se[0] : se[1]], shape
                ),
                bounds,
            )
        )
        return {
            "x_hat": {
                "r": jnp.concatenate([o["x_hat"]["r"] for o in outs], axis=0),
                "d": jnp.concatenate([o["x_hat"]["d"] for o in outs], axis=0),
            },
            "y_hat": {
                "r": jnp.concatenate([o["y_hat"]["r"] for o in outs], axis=0),
                "d": jnp.concatenate([o["y_hat"]["d"] for o in outs], axis=0),
            },
        }
