"""ELIC_master — the cascade codec conditioned on a frozen aux-modality ELIC.

Behavioral spec from reference models/elic_master.py:15-403:
  - FeatureEncoder lifts both the master image and the (decoded) aux image
    to a 64-ch feature space; ChannelAligner produces
    fv_bar = gamma * aux_f + beta with globally-pooled beta/gamma
    (64 floats each — transmitted as bitstream side info)
  - g_a runs on cat[fv, fv_bar] (128 ch); the 5-slice checkerboard entropy
    model is identical to ELIC
  - g_s is SynthesisTransformPlus: swin cross-attention (SpatialAligner)
    fuses the aux decoder's up1..up3 taps; its 192-ch output is concatenated
    with fv_bar and crunched by FeatureDecoder to the master modality

The aux codec (ELIC with return_mid=True) runs separately; its DECODED
outputs feed the master on both sides, so everything the master decoder
needs is reconstructible from the two bitstreams + beta/gamma.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..entropy import EntropyBottleneck
from ..nn import (
    AnalysisTransformEX,
    ChannelContextEX,
    EntropyParametersEX,
    HyperAnalysisEX,
    HyperSynthesisEX,
    LocalContext5x5,
)
from ..nn.aligners import ChannelAligner, FeatureDecoder, FeatureEncoder
from ..nn.synthesis import SynthesisTransformPlus
from .elic import ELIC


class ELICMaster(ELIC):
    """in_ch: the master modality's channels (3 => aux is depth, 1 => rgb)."""

    def setup(self):
        n, m = self.N, self.M
        sch = tuple(self.slice_ch)
        self.g_a = AnalysisTransformEX(n, m)  # input: cat[fv, fv_bar] (128ch)
        self.g_s = SynthesisTransformPlus(n, m, out_ch=n)
        self.h_a = HyperAnalysisEX(n, m)
        self.h_s = HyperSynthesisEX(n, m)
        self.entropy_bottleneck = EntropyBottleneck(channels=n)
        self.local_context = [LocalContext5x5(2 * ch) for ch in sch]
        self.channel_context = [
            ChannelContextEX(2 * sch[i]) if i else None for i in range(len(sch))
        ]
        self.entropy_parameters_anchor = [
            EntropyParametersEX(2 * sch[i], act=jax.nn.relu) for i in range(len(sch))
        ]
        self.entropy_parameters_nonanchor = [
            EntropyParametersEX(2 * sch[i], act=jax.nn.relu) for i in range(len(sch))
        ]
        aux_ch = 1 if self.in_ch == 3 else 3
        self.aux_encoder = FeatureEncoder()
        self.master_encoder = FeatureEncoder()
        self.master_decoder = FeatureDecoder(out_ch=self.in_ch)
        self.channel_aligner = ChannelAligner()
        del aux_ch  # feature encoders are channel-agnostic (lazy conv input)

    # -- cascade front/back -------------------------------------------------

    def fuse_features(self, x, aux):
        """(fv, fv_bar, beta, gamma) from the master image + decoded aux."""
        aux_f = self.aux_encoder(aux)
        fv = self.master_encoder(x)
        fv_bar, beta, gamma = self.channel_aligner(fv, aux_f)
        return fv, fv_bar, beta, gamma

    def aux_features(self, aux):
        return self.aux_encoder(aux)

    def fv_bar_from_side_info(self, aux, beta, gamma):
        """Decoder-side fv_bar: aux features + transmitted beta/gamma."""
        return gamma * self.aux_encoder(aux) + beta

    def __call__(self, x, aux, up1, up2, up3, training: bool = False):
        fv, fv_bar, beta, gamma = self.fuse_features(x, aux)
        fused = jnp.concatenate([fv, fv_bar], axis=-1)

        y = self.g_a(fused)
        z = self.h_a(y)
        z_hat, z_lik = self.entropy_bottleneck(z, training=training)
        if self.quant == "ste":
            from ..ops import quantize_ste

            z_hat = quantize_ste(z, self.entropy_bottleneck.medians())
        hyper = self.h_s(z_hat)

        y_hat, y_lik = self._entropy_slices(y, hyper, training)
        g_out = self.g_s(y_hat, up1, up2, up3)
        x_hat = self.master_decoder(jnp.concatenate([fv_bar, g_out], axis=-1))
        return {
            "x_hat": x_hat,
            "likelihoods": {"y": y_lik, "z": z_lik},
            "beta": beta,
            "gamma": gamma,
        }

    def _entropy_slices(self, y, hyper, training):
        """ELIC's slice loop, shared verbatim (same context structure)."""
        from ..ops import ckbd_anchor, ckbd_nonanchor

        y_hat_slices, y_liks = [], []
        for idx, y_slice in enumerate(self._slices(y)):
            ch_ctx, scales_a, means_a = self._slice_params(idx, y_hat_slices, hyper)
            scales_a = ckbd_anchor(scales_a)
            means_a = ckbd_anchor(means_a)
            anchor_hat = ckbd_anchor(
                self._quant(ckbd_anchor(y_slice), means_a, training)
            )
            scales_na, means_na = self._nonanchor_params(idx, anchor_hat, ch_ctx, hyper)
            scales_na = ckbd_nonanchor(scales_na)
            means_na = ckbd_nonanchor(means_na)
            nonanchor_hat = ckbd_nonanchor(
                self._quant(ckbd_nonanchor(y_slice), means_na, training)
            )
            y_liks.append(
                self._rate_lik(
                    y_slice, scales_a + scales_na, means_a + means_na, training
                )
            )
            y_hat_slices.append(anchor_hat + nonanchor_hat)
        return (
            jnp.concatenate(y_hat_slices, axis=-1),
            jnp.concatenate(y_liks, axis=-1),
        )

    # -- codec stage surface (ELIC-compatible + cascade extras) -------------

    def encode_front_master(self, x, aux):
        """Master encode front: features + g_a/h_a/z rounding + side info."""
        fv, fv_bar, beta, gamma = self.fuse_features(x, aux)
        fused = jnp.concatenate([fv, fv_bar], axis=-1)
        y = self.g_a(fused)
        z = self.h_a(y)
        medians = self.entropy_bottleneck.medians()
        z_sym = jnp.round(z - medians).astype(jnp.int32)
        return y, z_sym, beta, gamma

    def synthesize_master(self, y_hat, aux, beta, gamma, up1, up2, up3):
        fv_bar = self.fv_bar_from_side_info(aux, beta, gamma)
        g_out = self.g_s(y_hat, up1, up2, up3)
        return self.master_decoder(jnp.concatenate([fv_bar, g_out], axis=-1))
