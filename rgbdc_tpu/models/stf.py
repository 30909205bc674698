"""STF — symmetrical Swin-transformer codec with channel-AR entropy.

Behavioral spec from reference models/stf.py:408-816 (Googolxx/STF):
  - g_a: PatchEmbed(p=2, d=48) -> 4 swin BasicLayers (depths [2,2,6,2],
    heads [3,6,12,24], window 4) with PatchMerging -> y: 384ch at H/16
  - g_s: mirrored BasicLayers with PatchSplit + end conv/PixelShuffle
  - h_a: conv3 funnel 384->336->288(s2)->240->192(s2); dual hyper decoders
    h_mean_s / h_scale_s back to 384
  - entropy: 12 even 32ch slices, channel-autoregressive with support =
    first min(i, 6) decoded slices; per-slice cc_mean/cc_scale conv stacks,
    STE rounding, latent residual prediction (0.5*tanh)
  - no checkerboard: each slice is one dense coding group

Codec: same shared-stage-programs design as ELIC (encoder drives the
decoder's jitted programs), one rANS group per slice.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax

from ..ops.math import exact_gelu
import jax.numpy as jnp

from ..entropy import EntropyBottleneck, build_indexes, gaussian_forward
from ..nn.layers import SubpelConv3x3, conv3x3
from ..nn.swin import BasicLayer, PatchEmbed
from ..ops import quantize_ste
from ..ops.wire import _sym16


class StfHyperAnalysis(nn.Module):
    M: int
    N: int

    @nn.compact
    def __call__(self, x):
        m, n = self.M, self.N
        x = conv3x3(m)(x)
        x = exact_gelu(x)
        x = conv3x3(m * 7 // 8)(x)
        x = exact_gelu(x)
        x = conv3x3(m * 3 // 4, stride=2)(x)
        x = exact_gelu(x)
        x = conv3x3(m * 5 // 8)(x)
        x = exact_gelu(x)
        return conv3x3(n, stride=2)(x)


class StfHyperSynthesis(nn.Module):
    """conv3 + subpel x2 back to M channels (h_mean_s / h_scale_s)."""

    M: int
    N: int

    @nn.compact
    def __call__(self, x):
        m, n = self.M, self.N
        x = conv3x3(m * 5 // 8)(x)
        x = exact_gelu(x)
        x = SubpelConv3x3(m * 3 // 4, 2)(x)
        x = exact_gelu(x)
        x = conv3x3(m * 7 // 8)(x)
        x = exact_gelu(x)
        x = SubpelConv3x3(m, 2)(x)
        x = exact_gelu(x)
        return conv3x3(m)(x)


class _CCTransform(nn.Module):
    """conv3 funnel 224->176->128->64->out with GELU (cc_mean/cc_scale/lrp)."""

    out_dim: int

    @nn.compact
    def __call__(self, x):
        for ch in (224, 176, 128, 64):
            x = conv3x3(ch)(x)
            x = exact_gelu(x)
        return conv3x3(self.out_dim)(x)


class SymmetricalTransFormer(nn.Module):
    embed_dim: int = 48
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window: int = 4
    num_slices: int = 12
    in_ch: int = 3

    @property
    def M(self):
        return self.embed_dim * 8

    @property
    def N(self):
        return self.embed_dim * 4

    @property
    def slice_ch(self):
        sc = self.M // self.num_slices
        return (sc,) * self.num_slices

    @property
    def max_support_slices(self):
        return self.num_slices // 2

    def setup(self):
        e = self.embed_dim
        nl = len(self.depths)
        self.patch_embed = PatchEmbed(e, 2)
        self.layers = [
            BasicLayer(
                dim=e * 2**i,
                depth=self.depths[i],
                num_heads=self.num_heads[i],
                window=self.window,
                resample="merge" if i < nl - 1 else None,
            )
            for i in range(nl)
        ]
        self.syn_layers = [
            BasicLayer(
                dim=e * 2 ** (nl - 1 - i),
                depth=self.depths[nl - 1 - i],
                num_heads=self.num_heads[nl - 1 - i],
                window=self.window,
                resample="split" if i < nl - 1 else None,
            )
            for i in range(nl)
        ]
        self.end_conv1 = nn.Conv(e * 4, (5, 5), padding="SAME")
        self.end_conv2 = nn.Conv(self.in_ch, (3, 3), padding="SAME")
        self.h_a = StfHyperAnalysis(self.M, self.N)
        self.h_mean_s = StfHyperSynthesis(self.M, self.N)
        self.h_scale_s = StfHyperSynthesis(self.M, self.N)
        self.cc_mean_transforms = [
            _CCTransform(self.slice_ch[0]) for _ in range(self.num_slices)
        ]
        self.cc_scale_transforms = [
            _CCTransform(self.slice_ch[0]) for _ in range(self.num_slices)
        ]
        self.lrp_transforms = [
            _CCTransform(self.slice_ch[0]) for _ in range(self.num_slices)
        ]
        self.entropy_bottleneck = EntropyBottleneck(channels=self.N)

    # -- transforms ---------------------------------------------------------

    def g_a(self, x):
        x = self.patch_embed(x)
        for layer in self.layers:
            x = layer(x)
        return x  # [B, H/16, W/16, M]

    def g_s(self, y_hat):
        x = y_hat
        for layer in self.syn_layers:
            x = layer(x)
        x = self.end_conv1(x)
        b, h, w, c = x.shape
        x = x.reshape(b, h, w, c // 4, 2, 2).transpose(0, 1, 4, 2, 5, 3)
        x = x.reshape(b, 2 * h, 2 * w, c // 4)
        return self.end_conv2(x)

    def _slices(self, y):
        return [
            y[..., i * self.slice_ch[0] : (i + 1) * self.slice_ch[0]]
            for i in range(self.num_slices)
        ]

    def _slice_mu_scale(self, i, support, means, scales):
        mu = self.cc_mean_transforms[i](jnp.concatenate([means] + support, -1))
        sc = self.cc_scale_transforms[i](jnp.concatenate([scales] + support, -1))
        return mu, sc

    def _apply_lrp(self, i, support_plus_yhat):
        lrp = self.lrp_transforms[i](support_plus_yhat)
        return 0.5 * jnp.tanh(lrp)

    # -- training forward ---------------------------------------------------

    def __call__(self, x, training: bool = False):
        y = self.g_a(x)
        z = self.h_a(y)
        _, z_lik = self.entropy_bottleneck(z, training=training)
        z_hat = quantize_ste(z, self.entropy_bottleneck.medians())
        scales = self.h_scale_s(z_hat)
        means = self.h_mean_s(z_hat)

        y_hat_slices, y_liks = [], []
        for i, y_slice in enumerate(self._slices(y)):
            support = y_hat_slices[: self.max_support_slices]
            mu, sc = self._slice_mu_scale(i, support, means, scales)
            # rate at the quantized latent (noise in training, round at eval)
            y_liks.append(
                gaussian_forward(
                    y_slice, sc, mu, training,
                    self.make_rng("noise") if training else None,
                )[1]
            )
            y_hat_slice = quantize_ste(y_slice, mu)
            lrp_in = jnp.concatenate([means] + support + [y_hat_slice], -1)
            y_hat_slice = y_hat_slice + self._apply_lrp(i, lrp_in)
            y_hat_slices.append(y_hat_slice)

        y_hat = jnp.concatenate(y_hat_slices, -1)
        x_hat = self.g_s(y_hat)
        return {
            "x_hat": x_hat,
            "likelihoods": {"y": jnp.concatenate(y_liks, -1), "z": z_lik},
        }

    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()

    # -- codec stage surface ------------------------------------------------

    def encode_front(self, x):
        y = self.g_a(x)
        z = self.h_a(y)
        medians = self.entropy_bottleneck.medians()
        z_sym = jnp.round(z - medians).astype(jnp.int32)
        return y, z_sym

    def hyper_decode(self, z_sym):
        medians = self.entropy_bottleneck.medians()
        z_hat = z_sym.astype(jnp.float32) + medians
        return self.h_scale_s(z_hat), self.h_mean_s(z_hat)

    def slice_params(self, i: int, y_hat_prev, hyper, scale_table):
        scales, means = hyper
        support = list(y_hat_prev)[: self.max_support_slices]
        mu, sc = self._slice_mu_scale(i, support, means, scales)
        return build_indexes(sc, scale_table), mu

    def slice_symbols(self, i: int, y, mu):
        start = i * self.slice_ch[0]
        y_slice = y[..., start : start + self.slice_ch[0]]
        return _sym16(y_slice - mu)

    def slice_reconstruct(self, i: int, sym, mu, y_hat_prev, hyper):
        _, means = hyper
        support = list(y_hat_prev)[: self.max_support_slices]
        y_hat_slice = sym.astype(jnp.float32) + mu
        lrp_in = jnp.concatenate([means] + support + [y_hat_slice], -1)
        return y_hat_slice + self._apply_lrp(i, lrp_in)

    def synthesize(self, y_hat):
        return self.g_s(y_hat)
