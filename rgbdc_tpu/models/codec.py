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

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..coder import RansDecoder, RansEncoder
from ..entropy import get_scale_table
from ..entropy.tables import CdfTable, build_bottleneck_tables, build_gaussian_tables


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


def eb_channel_indexes(shape) -> np.ndarray:
    """[B,H,W,C] channel-index map for factorized-prior coding."""
    b, h, w, c = shape
    return np.broadcast_to(np.arange(c, dtype=np.int32), (b, h, w, c))


class ElicCodec:
    """compress()/decompress() for ELIC-style single-latent checkerboard
    models (ELIC, Cheng2020+ckbd via shared method names)."""

    def __init__(self, model, variables, tables: CodecTables | None = None):
        self.model = model
        self.variables = variables
        self.tables = tables if tables is not None else CodecTables.build(variables)
        st = jnp.asarray(self.tables.scale_table, dtype=jnp.float32)

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

        z_sym = np.asarray(z_sym_dev)
        groups = [(np.asarray(s), np.asarray(i)) for s, i in groups]

        b = z_sym.shape[0]
        eb_table = self.tables.eb["entropy_bottleneck"]
        z_idx = eb_channel_indexes(z_sym.shape)

        y_strings, z_strings = [], []
        for n in range(b):
            enc = RansEncoder()
            for sym, idx in groups:
                enc.buffer(sym[n], idx[n], self.tables.gc)
            y_strings.append(enc.flush())

            enc_z = RansEncoder()
            enc_z.buffer(z_sym[n], z_idx[n], eb_table)
            z_strings.append(enc_z.flush())

        return {
            "strings": [y_strings, z_strings],
            "shape": (z_sym.shape[1], z_sym.shape[2]),
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
            [RansDecoder(z_strings[n]).decode(z_idx[n], eb_table) for n in range(b)]
        )
        hyper = self._hyper(self.variables, jnp.asarray(z_sym))

        decoders = [RansDecoder(y_strings[n]) for n in range(b)]
        y_hat_slices: list = []
        for i in range(len(self.model.slice_ch)):
            idx_a, mn_a, ch_ctx = self._dec_anchor[i](
                self.variables, tuple(y_hat_slices), hyper
            )
            idx_a_np = np.asarray(idx_a)
            sym_a = np.stack(
                [decoders[n].decode(idx_a_np[n], self.tables.gc) for n in range(b)]
            )
            idx_na, mn_na, anchor_hat = self._dec_nonanchor[i](
                self.variables, jnp.asarray(sym_a), mn_a, ch_ctx, hyper
            )
            idx_na_np = np.asarray(idx_na)
            sym_na = np.stack(
                [decoders[n].decode(idx_na_np[n], self.tables.gc) for n in range(b)]
            )
            y_hat_slices.append(
                self._merge(self.variables, anchor_hat, jnp.asarray(sym_na), mn_na)
            )

        y_hat = jnp.concatenate(y_hat_slices, axis=-1)
        x_hat = self._synth(self.variables, y_hat)
        return {"x_hat": x_hat, "y_hat": y_hat}
