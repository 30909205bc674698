"""MLIC++ — multi-reference entropy model codec, TPU-native.

Behavioral spec from reference models/mlicpp.py:15-429:
  - g_a/g_s: Cheng-style GDN residual backbone to M=320 (analysis.py:11-26,
    synthesis.py:12-29); GELU conv hyper nets (h_s -> 2M: scales || means)
  - entropy: 10 even 32ch slices, checkerboard anchor/nonanchor per slice;
    contexts per slice: hyper (2M), channel ctx (4C), linear global
    inter-slice attention (2C), 5x5 masked local window attention (2C),
    linear global intra-slice attention (2C)
  - latent residual prediction after each phase (anchor + nonanchor LRP)

Codec: shared-stage-program design; ch_ctx packs (inter_ctx, channel_ctx)
opaquely between the anchor and nonanchor stages.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
from ..nn.layers import conv1x1
import jax

from ..ops.math import exact_gelu
import jax.numpy as jnp

from ..entropy import EntropyBottleneck, build_indexes, gaussian_forward
from ..nn.context_mlic import (
    ChannelContextMLIC,
    LatentResidualPrediction,
    LinearGlobalInterContext,
    LinearGlobalIntraContext,
    LocalContext,
)
from ..nn.layers import (
    ResidualBlock,
    ResidualBlockUpsample,
    ResidualBlockWithStride,
    SubpelConv3x3,
    conv3x3,
)
from ..ops.wire import _sym16
from ..ops import (
    ckbd_anchor,
    ckbd_anchor_squeeze,
    ckbd_anchor_unsqueeze,
    ckbd_nonanchor,
    ckbd_nonanchor_squeeze,
    ckbd_nonanchor_unsqueeze,
    quantize_ste,
)


class _MlicAnalysis(nn.Module):
    N: int
    M: int

    @nn.compact
    def __call__(self, x):
        n = self.N
        x = ResidualBlockWithStride(n)(x)
        x = ResidualBlock(n)(x)
        x = ResidualBlockWithStride(n)(x)
        x = ResidualBlock(n)(x)
        x = ResidualBlockWithStride(n)(x)
        x = ResidualBlock(n)(x)
        return conv3x3(self.M, stride=2)(x)


class _MlicSynthesis(nn.Module):
    N: int
    M: int
    out_ch: int = 3

    @nn.compact
    def __call__(self, x):
        n = self.N
        x = ResidualBlock(n)(x)
        x = ResidualBlockUpsample(n)(x)
        x = ResidualBlock(n)(x)
        x = ResidualBlockUpsample(n)(x)
        x = ResidualBlock(n)(x)
        x = ResidualBlockUpsample(n)(x)
        x = ResidualBlock(n)(x)
        return SubpelConv3x3(self.out_ch, 2)(x)


class _MlicHyperAnalysis(nn.Module):
    N: int

    @nn.compact
    def __call__(self, x):
        n = self.N
        x = exact_gelu(conv3x3(n)(x))
        x = exact_gelu(conv3x3(n)(x))
        x = exact_gelu(conv3x3(n, stride=2)(x))
        x = exact_gelu(conv3x3(n)(x))
        return conv3x3(n, stride=2)(x)


class _MlicHyperSynthesis(nn.Module):
    M: int

    @nn.compact
    def __call__(self, x):
        m = self.M
        x = exact_gelu(conv3x3(m)(x))
        x = exact_gelu(SubpelConv3x3(m, 2)(x))
        x = exact_gelu(conv3x3(m * 3 // 2)(x))
        x = exact_gelu(SubpelConv3x3(m * 3 // 2, 2)(x))
        return conv3x3(m * 2)(x)


class MLICPlusPlus(nn.Module):
    N: int = 192
    M: int = 320
    slice_num: int = 10
    in_ch: int = 3
    quant: str = "ste"

    @property
    def slice_ch(self):
        sc = self.M // self.slice_num
        return (sc,) * self.slice_num

    def setup(self):
        n, m = self.N, self.M
        sc = self.M // self.slice_num
        ns = self.slice_num
        self.g_a = _MlicAnalysis(n, m)
        self.g_s = _MlicSynthesis(n, m, out_ch=self.in_ch)
        self.h_a = _MlicHyperAnalysis(n)
        self.h_s = _MlicHyperSynthesis(m)
        self.entropy_bottleneck = EntropyBottleneck(channels=n)

        self.local_context = [LocalContext(dim=sc) for _ in range(ns)]
        self.channel_context = [
            ChannelContextMLIC(sc) if i else None for i in range(ns)
        ]
        self.global_inter_context = [
            LinearGlobalInterContext(sc * i, 2 * sc, max(sc * i // 32, 1))
            if i
            else None
            for i in range(ns)
        ]
        self.global_intra_context = [
            LinearGlobalIntraContext(sc) if i else None for i in range(ns)
        ]
        self.entropy_parameters_anchor = [
            _EPMlic(2 * sc) for _ in range(ns)
        ]
        self.entropy_parameters_nonanchor = [
            _EPMlic(2 * sc) for _ in range(ns)
        ]
        self.lrp_anchor = [LatentResidualPrediction(sc) for _ in range(ns)]
        self.lrp_nonanchor = [LatentResidualPrediction(sc) for _ in range(ns)]

    # -- helpers ------------------------------------------------------------

    def _slices(self, y):
        sc = self.M // self.slice_num
        return [y[..., i * sc : (i + 1) * sc] for i in range(self.slice_num)]

    def _anchor_ctx(self, idx, y_hat_prev, hyper):
        """(params_input_list, (inter_ctx, channel_ctx))."""
        if idx == 0:
            return [hyper], (None, None)
        prev = jnp.concatenate(y_hat_prev, axis=-1)
        inter = self.global_inter_context[idx](prev)
        channel = self.channel_context[idx](prev)
        return [inter, channel, hyper], (inter, channel)

    def _apply_lrp(self, module, hyper_means, y_hat_prev, current):
        return module(
            jnp.concatenate([hyper_means] + list(y_hat_prev) + [current], axis=-1)
        )

    # -- training forward ---------------------------------------------------

    def __call__(self, x, training: bool = False):
        y = self.g_a(x)
        z = self.h_a(y)
        _, z_lik = self.entropy_bottleneck(z, training=training)
        z_hat = quantize_ste(z, self.entropy_bottleneck.medians())
        hyper = self.h_s(z_hat)
        _, hyper_means = jnp.split(hyper, 2, axis=-1)

        y_hat_slices, y_liks = [], []
        for idx, y_slice in enumerate(self._slices(y)):
            ctx_list, (inter, channel) = self._anchor_ctx(idx, y_hat_slices, hyper)
            p_a = self.entropy_parameters_anchor[idx](
                jnp.concatenate(ctx_list, axis=-1)
            )
            sc_a, mn_a = jnp.split(p_a, 2, axis=-1)
            sc_a, mn_a = ckbd_anchor(sc_a), ckbd_anchor(mn_a)
            anchor = ckbd_anchor(quantize_ste(ckbd_anchor(y_slice), mn_a))
            lrp_a = self._apply_lrp(
                self.lrp_anchor[idx], hyper_means, y_hat_slices, anchor
            )
            anchor = anchor + ckbd_anchor(lrp_a)

            local = self.local_context[idx](anchor)
            if idx == 0:
                na_ctx = [local, hyper]
            else:
                intra = self.global_intra_context[idx](y_hat_slices[-1], anchor)
                na_ctx = [local, intra, inter, channel, hyper]
            p_na = self.entropy_parameters_nonanchor[idx](
                jnp.concatenate(na_ctx, axis=-1)
            )
            sc_na, mn_na = jnp.split(p_na, 2, axis=-1)
            sc_na, mn_na = ckbd_nonanchor(sc_na), ckbd_nonanchor(mn_na)
            nonanchor = ckbd_nonanchor(quantize_ste(ckbd_nonanchor(y_slice), mn_na))

            # rate at the quantized latent (noise in training, round at eval)
            y_liks.append(
                gaussian_forward(
                    y_slice, sc_a + sc_na, mn_a + mn_na, training,
                    self.make_rng("noise") if training else None,
                )[1]
            )
            y_hat_slice = anchor + nonanchor
            lrp_na = self._apply_lrp(
                self.lrp_nonanchor[idx], hyper_means, y_hat_slices, y_hat_slice
            )
            y_hat_slices.append(y_hat_slice + ckbd_nonanchor(lrp_na))

        y_hat = jnp.concatenate(y_hat_slices, axis=-1)
        return {
            "x_hat": self.g_s(y_hat),
            "likelihoods": {"y": jnp.concatenate(y_liks, -1), "z": z_lik},
        }

    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()

    # -- codec stage surface (ElicCodec-compatible) -------------------------

    def encode_front(self, x):
        y = self.g_a(x)
        z = self.h_a(y)
        medians = self.entropy_bottleneck.medians()
        z_sym = jnp.round(z - medians).astype(jnp.int32)
        return y, z_sym

    def hyper_decode(self, z_sym):
        medians = self.entropy_bottleneck.medians()
        return self.h_s(z_sym.astype(jnp.float32) + medians)

    def decode_anchor(self, idx: int, y_hat_prev, hyper, scale_table):
        ctx_list, pack = self._anchor_ctx(idx, list(y_hat_prev), hyper)
        p_a = self.entropy_parameters_anchor[idx](jnp.concatenate(ctx_list, -1))
        sc, mn = jnp.split(p_a, 2, axis=-1)
        sc_sq = ckbd_anchor_squeeze(sc)
        mn_sq = ckbd_anchor_squeeze(mn)
        return build_indexes(sc_sq, scale_table), mn_sq, pack

    def decode_nonanchor_mlic(
        self, idx: int, sym_a, mn_a_sq, pack, y_hat_prev, hyper, scale_table
    ):
        inter, channel = pack
        _, hyper_means = jnp.split(hyper, 2, axis=-1)
        anchor = ckbd_anchor_unsqueeze(sym_a.astype(jnp.float32) + mn_a_sq)
        lrp_a = self._apply_lrp(
            self.lrp_anchor[idx], hyper_means, list(y_hat_prev), anchor
        )
        anchor = anchor + ckbd_anchor(lrp_a)
        local = self.local_context[idx](anchor)
        if idx == 0:
            na_ctx = [local, hyper]
        else:
            intra = self.global_intra_context[idx](list(y_hat_prev)[-1], anchor)
            na_ctx = [local, intra, inter, channel, hyper]
        p_na = self.entropy_parameters_nonanchor[idx](jnp.concatenate(na_ctx, -1))
        sc, mn = jnp.split(p_na, 2, axis=-1)
        sc_sq = ckbd_nonanchor_squeeze(sc)
        mn_sq = ckbd_nonanchor_squeeze(mn)
        return build_indexes(sc_sq, scale_table), mn_sq, anchor

    def merge_slice_mlic(
        self, idx: int, anchor_hat, sym_na, mn_na_sq, y_hat_prev, hyper
    ):
        _, hyper_means = jnp.split(hyper, 2, axis=-1)
        nonanchor = ckbd_nonanchor_unsqueeze(sym_na.astype(jnp.float32) + mn_na_sq)
        y_hat_slice = anchor_hat + nonanchor
        lrp_na = self._apply_lrp(
            self.lrp_nonanchor[idx], hyper_means, list(y_hat_prev), y_hat_slice
        )
        return y_hat_slice + ckbd_nonanchor(lrp_na)

    def anchor_symbols(self, idx: int, y, mn_sq):
        sc = self.M // self.slice_num
        y_slice = y[..., idx * sc : (idx + 1) * sc]
        return _sym16(ckbd_anchor_squeeze(y_slice) - mn_sq)

    def nonanchor_symbols(self, idx: int, y, mn_sq):
        sc = self.M // self.slice_num
        y_slice = y[..., idx * sc : (idx + 1) * sc]
        return _sym16(ckbd_nonanchor_squeeze(y_slice) - mn_sq)

    def synthesize(self, y_hat):
        return self.g_s(y_hat)


class _EPMlic(nn.Module):
    """1x1 funnel 320 -> 256 -> 128 -> out (reference entropy.py:31-53)."""

    out_dim: int

    @nn.compact
    def __call__(self, x):
        x = exact_gelu(conv1x1(320)(x))
        x = exact_gelu(conv1x1(256)(x))
        x = exact_gelu(conv1x1(128)(x))
        return conv1x1(self.out_dim)(x)
