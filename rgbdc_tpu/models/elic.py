"""ELIC single-modality codec, TPU-native.

Behavioral spec from reference models/elic.py:15-351: conv g_a/g_s with
ResidualBottleneck stacks + attention, conv hyper nets, 5 uneven channel
slices [16,16,32,64,192], per-slice checkerboard anchor/nonanchor coding
with hyper (2M) + channel + 5x5 local contexts, STE quantization.

TPU-first restructuring:
  * NHWC end to end; every checkerboard phase is a dense squeezed tensor
    [B,H,W/2,C] (no masked scatter).
  * ``forward`` is one jittable function (slices unrolled — ragged widths).
  * ``encode_stages`` computes ALL symbols + CDF indexes for every
    (slice, phase) in one jitted program; the host then makes a single pass
    of C rANS calls — no device<->host ping-pong during encoding (the
    reference crosses ~20x per image, utils/ckbd.py:83-105).
  * decode is phase-serial by construction (true data dependency); each
    phase is one jitted param computation + one C rANS call, batched over
    the image batch.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..entropy import EntropyBottleneck, build_indexes, gaussian_forward
from ..nn import (
    AnalysisTransformEX,
    ChannelContextEX,
    EntropyParameters,
    HyperAnalysisEX,
    HyperSynthesisEX,
    LocalContext5x5,
    SynthesisTransformEX,
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


class ELIC(nn.Module):
    """config fields (utils/config.py model_config): N, M, slice_ch, quant."""

    N: int = 192
    M: int = 320
    slice_ch: Sequence[int] = (16, 16, 32, 64, 192)
    quant: str = "ste"
    in_ch: int = 3
    return_mid: bool = False

    def setup(self):
        n, m = self.N, self.M
        sch = tuple(self.slice_ch)
        self.g_a = AnalysisTransformEX(n, m)
        self.g_s = SynthesisTransformEX(n, m, out_ch=self.in_ch, return_mid=self.return_mid)
        self.h_a = HyperAnalysisEX(n, m)
        self.h_s = HyperSynthesisEX(n, m)
        self.entropy_bottleneck = EntropyBottleneck(channels=n)
        self.local_context = [LocalContext5x5(2 * ch) for ch in sch]
        self.channel_context = [
            ChannelContextEX(2 * sch[i]) if i else None for i in range(len(sch))
        ]
        self.entropy_parameters_anchor = [
            EntropyParameters(2 * sch[i]) for i in range(len(sch))
        ]
        self.entropy_parameters_nonanchor = [
            EntropyParameters(2 * sch[i]) for i in range(len(sch))
        ]

    # --- helpers -----------------------------------------------------------

    def _slices(self, y):
        out, start = [], 0
        for ch in self.slice_ch:
            out.append(y[..., start : start + ch])
            start += ch
        return out

    def _rate_lik(self, y, scales, means, training):
        """Rate term at the QUANTIZED latent (reference GaussianConditional
        .forward quantizes before the likelihood, entropy_models.py:552-558):
        y + U(-0.5, 0.5) noise during training, round(y-mu)+mu at eval.
        Evaluating at raw continuous y would underestimate the coded bpp."""
        rng = self.make_rng("noise") if training else None
        return gaussian_forward(y, scales, means, training, rng)[1]

    def _quant(self, v, means, training):
        """Quantize masked latent around means (STE or noise path)."""
        if self.quant == "ste":
            return quantize_ste(v, means)
        if training:
            noise = jax.random.uniform(
                self.make_rng("noise"), v.shape, minval=-0.5, maxval=0.5
            )
            return v + noise
        return jnp.round(v - means) + means

    def _slice_params(self, idx, y_hat_prev, hyper):
        """(anchor_params_fn inputs) -> channel ctx + anchor scales/means."""
        if idx == 0:
            ch_ctx = None
            params_a = self.entropy_parameters_anchor[0](hyper)
        else:
            ch_ctx = self.channel_context[idx](jnp.concatenate(y_hat_prev, axis=-1))
            params_a = self.entropy_parameters_anchor[idx](
                jnp.concatenate([ch_ctx, hyper], axis=-1)
            )
        scales_a, means_a = jnp.split(params_a, 2, axis=-1)
        return ch_ctx, scales_a, means_a

    def _nonanchor_params(self, idx, anchor_hat, ch_ctx, hyper):
        local_ctx = self.local_context[idx](anchor_hat)
        parts = [local_ctx] + ([ch_ctx] if ch_ctx is not None else []) + [hyper]
        params_na = self.entropy_parameters_nonanchor[idx](
            jnp.concatenate(parts, axis=-1)
        )
        scales_na, means_na = jnp.split(params_na, 2, axis=-1)
        return scales_na, means_na

    # --- training / estimation forward ------------------------------------

    def __call__(self, x, training: bool = False):
        y = self.g_a(x)
        z = self.h_a(y)
        z_hat, z_lik = self.entropy_bottleneck(z, training=training)
        if self.quant == "ste":
            z_hat = quantize_ste(z, self.entropy_bottleneck.medians())
        hyper = self.h_s(z_hat)

        y_hat_slices, y_liks = [], []
        for idx, y_slice in enumerate(self._slices(y)):
            ch_ctx, scales_a, means_a = self._slice_params(idx, y_hat_slices, hyper)
            scales_a = ckbd_anchor(scales_a)
            means_a = ckbd_anchor(means_a)
            anchor = ckbd_anchor(y_slice)
            anchor_hat = ckbd_anchor(self._quant(anchor, means_a, training))

            scales_na, means_na = self._nonanchor_params(idx, anchor_hat, ch_ctx, hyper)
            scales_na = ckbd_nonanchor(scales_na)
            means_na = ckbd_nonanchor(means_na)
            nonanchor = ckbd_nonanchor(y_slice)
            nonanchor_hat = ckbd_nonanchor(self._quant(nonanchor, means_na, training))

            y_liks.append(
                self._rate_lik(
                    y_slice, scales_a + scales_na, means_a + means_na, training
                )
            )
            y_hat_slices.append(anchor_hat + nonanchor_hat)

        y_hat = jnp.concatenate(y_hat_slices, axis=-1)
        y_lik = jnp.concatenate(y_liks, axis=-1)

        out = {"likelihoods": {"y": y_lik, "z": z_lik}}
        if self.return_mid:
            x_hat, up1, up2, up3 = self.g_s(y_hat)
            out.update({"x_hat": x_hat, "up1": up1, "up2": up2, "up3": up3})
        else:
            out["x_hat"] = self.g_s(y_hat)
        return out

    # --- real codec paths --------------------------------------------------
    #
    # Bit-exact closure: the encoder does NOT have its own entropy-parameter
    # path.  It runs encode_front (g_a/h_a/z rounding) and then drives the
    # SAME jitted decode_anchor/decode_nonanchor/merge_slice programs the
    # decoder uses, feeding them the true symbols.  Identical XLA programs on
    # identical inputs are deterministic, so encoder-side means/indexes match
    # the decoder bit for bit (the role cudnn.deterministic plays in the
    # reference, models/elic.py:176,251).

    def encode_front(self, x):
        """g_a + h_a + z quantization (encoder-only stages)."""
        y = self.g_a(x)
        z = self.h_a(y)
        medians = self.entropy_bottleneck.medians()
        z_sym = jnp.round(z - medians).astype(jnp.int32)
        return y, z_sym

    def anchor_symbols(self, idx: int, y, mn_a_sq):
        start = sum(self.slice_ch[:idx])
        y_slice = y[..., start : start + self.slice_ch[idx]]
        a_sq = ckbd_anchor_squeeze(y_slice)
        return _sym16(a_sq - mn_a_sq)

    def nonanchor_symbols(self, idx: int, y, mn_na_sq):
        start = sum(self.slice_ch[:idx])
        y_slice = y[..., start : start + self.slice_ch[idx]]
        na_sq = ckbd_nonanchor_squeeze(y_slice)
        return _sym16(na_sq - mn_na_sq)

    def hyper_decode(self, z_sym):
        """z symbols -> hyper params (first stage of decompress)."""
        medians = self.entropy_bottleneck.medians()
        z_hat = z_sym.astype(jnp.float32) + medians
        return self.h_s(z_hat)

    def decode_anchor(self, idx: int, y_hat_prev, hyper, scale_table):
        """Per-slice anchor phase: CDF indexes + means (squeezed dense)."""
        ch_ctx, scales_a, means_a = self._slice_params(idx, list(y_hat_prev), hyper)
        sc_sq = ckbd_anchor_squeeze(scales_a)
        mn_sq = ckbd_anchor_squeeze(means_a)
        return build_indexes(sc_sq, scale_table), mn_sq, ch_ctx

    def decode_nonanchor(self, idx: int, sym_a, mn_a_sq, ch_ctx, hyper, scale_table):
        """Anchor symbols -> nonanchor phase indexes/means + anchor_hat."""
        anchor_hat = ckbd_anchor_unsqueeze(sym_a.astype(jnp.float32) + mn_a_sq)
        scales_na, means_na = self._nonanchor_params(idx, anchor_hat, ch_ctx, hyper)
        sc_sq = ckbd_nonanchor_squeeze(scales_na)
        mn_sq = ckbd_nonanchor_squeeze(means_na)
        return build_indexes(sc_sq, scale_table), mn_sq, anchor_hat

    def merge_slice(self, anchor_hat, sym_na, mn_na_sq):
        return anchor_hat + ckbd_nonanchor_unsqueeze(
            sym_na.astype(jnp.float32) + mn_na_sq
        )

    def synthesize(self, y_hat):
        return self.g_s(y_hat)

    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()
