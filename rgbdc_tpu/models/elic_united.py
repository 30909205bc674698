"""ELIC_united — the paper's Bi-CPT + Bi-CEE joint RGB-D codec, TPU-native.

Behavioral spec from reference models/elic_united.py:14-620:
  - dual-branch g_a/g_s with bidirectional BiSPF fusion, independent h_a,
    cross-modal SE-gated h_s, two entropy bottlenecks + gaussian conditionals
  - Bi-CEE: per slice, FOUR sequential coding groups
      1. rgb anchor      <- [rgb_hyper, depth_hyper (, rgb_cc, depth_cc)]
      2. depth anchor    <- [rgb_local_ctx] + init
      3. rgb nonanchor   <- [rgb_local_ctx, depth_local_ctx] + init
      4. depth nonanchor <- [rgb_local_ctx2 (over full rgb slice),
                             depth_local_ctx] + init
    where local ctxs are 5x5 convs over the (masked) decoded planes
    (:137-177) and channel ctxs read all previously decoded slices.

Codec structure: same bit-exact-closure design as ELIC — the encoder drives
the decoder's jitted stage programs. Each slice decode is 4 group stages
(true data dependencies) + 4 batched host rANS calls, vs the reference's
~40 per-image GPU<->python->C++ crossings (SURVEY §3.5).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..entropy import EntropyBottleneck, build_indexes, gaussian_forward
from ..nn import (
    AnalysisTransformEXcross,
    AnalysisTransformEXSingle,
    ChannelContextEX,
    EntropyParametersEX,
    HyperAnalysisEXcross,
    HyperSynthesisEXcross,
    HyperSynthesisEXSingle,
    LocalContext5x5,
    SynthesisTransformEXcross,
    SynthesisTransformEXSingle,
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


class ELICUnited(nn.Module):
    """one_way=False: bidirectional Bi-CPT/Bi-CEE (the paper's model).
    one_way=True: the ICIP'22 R2D variant (models/elic_united_R2D.py:9-326) —
    RGB's transforms and entropy contexts never see depth; depth conditions
    on RGB everywhere."""

    N: int = 192
    M: int = 320
    slice_ch: Sequence[int] = (16, 16, 32, 64, 192)
    quant: str = "ste"
    one_way: bool = False

    def _setup_transforms(self):
        """Transform family — overridden by the swin-towered STF_united."""
        n, m = self.N, self.M
        if self.one_way:
            self.g_a = AnalysisTransformEXSingle(n, m)
            self.g_s = SynthesisTransformEXSingle(n, m)
            self.h_a = HyperAnalysisEXcross(n, m)
            self.h_s = HyperSynthesisEXSingle(n, m)
        else:
            self.g_a = AnalysisTransformEXcross(n, m)
            self.g_s = SynthesisTransformEXcross(n, m)
            self.h_a = HyperAnalysisEXcross(n, m)
            self.h_s = HyperSynthesisEXcross(n, m)

    def setup(self):
        sch = tuple(self.slice_ch)
        ns = len(sch)
        n = self.N
        self._setup_transforms()

        self.rgb_local_context = [LocalContext5x5(2 * c) for c in sch]
        self.rgb_local_context_full = [LocalContext5x5(2 * c) for c in sch]
        self.depth_local_context = [LocalContext5x5(2 * c) for c in sch]
        self.rgb_channel_context = [
            ChannelContextEX(2 * sch[i]) if i else None for i in range(ns)
        ]
        self.depth_channel_context = [
            ChannelContextEX(2 * sch[i]) if i else None for i in range(ns)
        ]
        self.rgb_ep_anchor = [
            EntropyParametersEX(2 * sch[i], act=jax.nn.relu) for i in range(ns)
        ]
        self.depth_ep_anchor = [
            EntropyParametersEX(2 * sch[i], act=jax.nn.relu) for i in range(ns)
        ]
        self.rgb_ep_nonanchor = [
            EntropyParametersEX(2 * sch[i], act=jax.nn.relu) for i in range(ns)
        ]
        self.depth_ep_nonanchor = [
            EntropyParametersEX(2 * sch[i], act=jax.nn.relu) for i in range(ns)
        ]
        self.rgb_entropy_bottleneck = EntropyBottleneck(channels=n)
        self.depth_entropy_bottleneck = EntropyBottleneck(channels=n)

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
        y + U(-0.5, 0.5) noise during training, round(y-mu)+mu at eval."""
        rng = self.make_rng("noise") if training else None
        return gaussian_forward(y, scales, means, training, rng)[1]

    def _quant(self, v, means, training):
        if self.quant == "ste":
            return quantize_ste(v, means)
        if training:
            noise = jax.random.uniform(
                self.make_rng("noise"), v.shape, minval=-0.5, maxval=0.5
            )
            return v + noise
        return jnp.round(v - means) + means

    def _init_context(self, idx, rgb_prev, depth_prev, rgb_hyper, depth_hyper):
        """Base contexts: (rgb_init, depth_init).  Bidirectional: both are
        [rgb_hyper, depth_hyper (, rgb_cc, depth_cc)].  One-way (R2D): rgb
        sees only its own hyper/channel ctx (elic_united_R2D.py:85-92)."""
        rgb_cc = depth_cc = None
        if idx != 0:
            rgb_cc = self.rgb_channel_context[idx](jnp.concatenate(rgb_prev, -1))
            depth_cc = self.depth_channel_context[idx](jnp.concatenate(depth_prev, -1))
        if self.one_way:
            rgb_init = [rgb_hyper] + ([rgb_cc] if rgb_cc is not None else [])
            depth_init = [rgb_hyper, depth_hyper] + (
                [rgb_cc, depth_cc] if rgb_cc is not None else []
            )
        else:
            shared = [rgb_hyper, depth_hyper] + (
                [rgb_cc, depth_cc] if rgb_cc is not None else []
            )
            rgb_init = depth_init = shared
        return rgb_init, depth_init

    def _ctx_rgb_nonanchor(self, r_local, d_local, rgb_init):
        if self.one_way:
            return [r_local] + rgb_init
        return [r_local, d_local] + rgb_init

    @staticmethod
    def _params(module, ctx_list):
        p = module(jnp.concatenate(ctx_list, axis=-1))
        return jnp.split(p, 2, axis=-1)  # scales, means

    # --- training / estimation forward ------------------------------------

    def __call__(self, rgb, depth, training: bool = False):
        rgb_y, depth_y = self.g_a(rgb, depth)
        rgb_z, depth_z = self.h_a(rgb_y, depth_y)

        rgb_z_hat, rgb_z_lik = self.rgb_entropy_bottleneck(rgb_z, training=training)
        depth_z_hat, depth_z_lik = self.depth_entropy_bottleneck(
            depth_z, training=training
        )
        if self.quant == "ste":
            rgb_z_hat = quantize_ste(rgb_z, self.rgb_entropy_bottleneck.medians())
            depth_z_hat = quantize_ste(
                depth_z, self.depth_entropy_bottleneck.medians()
            )

        rgb_hyper, depth_hyper = self.h_s(rgb_z_hat, depth_z_hat)

        rgb_hat_slices, depth_hat_slices = [], []
        rgb_liks, depth_liks = [], []
        for idx, (r_slice, d_slice) in enumerate(
            zip(self._slices(rgb_y), self._slices(depth_y))
        ):
            rgb_init, depth_init = self._init_context(
                idx, rgb_hat_slices, depth_hat_slices, rgb_hyper, depth_hyper
            )

            # group 1: rgb anchor
            r_sc_a, r_mn_a = self._params(self.rgb_ep_anchor[idx], rgb_init)
            r_sc_a, r_mn_a = ckbd_anchor(r_sc_a), ckbd_anchor(r_mn_a)
            r_anchor = ckbd_anchor(
                self._quant(ckbd_anchor(r_slice), r_mn_a, training)
            )
            r_local = self.rgb_local_context[idx](r_anchor)

            # group 2: depth anchor (sees rgb local ctx)
            d_sc_a, d_mn_a = self._params(
                self.depth_ep_anchor[idx], [r_local] + depth_init
            )
            d_sc_a, d_mn_a = ckbd_anchor(d_sc_a), ckbd_anchor(d_mn_a)
            d_anchor = ckbd_anchor(
                self._quant(ckbd_anchor(d_slice), d_mn_a, training)
            )
            d_local = self.depth_local_context[idx](d_anchor)

            # group 3: rgb nonanchor (sees both local ctxs)
            r_sc_na, r_mn_na = self._params(
                self.rgb_ep_nonanchor[idx],
                self._ctx_rgb_nonanchor(r_local, d_local, rgb_init),
            )
            r_sc_na, r_mn_na = ckbd_nonanchor(r_sc_na), ckbd_nonanchor(r_mn_na)
            r_nonanchor = ckbd_nonanchor(
                self._quant(ckbd_nonanchor(r_slice), r_mn_na, training)
            )
            r_hat_slice = r_anchor + r_nonanchor
            r_local_full = self.rgb_local_context_full[idx](r_hat_slice)

            # group 4: depth nonanchor (sees full rgb slice ctx + depth local)
            d_sc_na, d_mn_na = self._params(
                self.depth_ep_nonanchor[idx], [r_local_full, d_local] + depth_init
            )
            d_sc_na, d_mn_na = ckbd_nonanchor(d_sc_na), ckbd_nonanchor(d_mn_na)
            d_nonanchor = ckbd_nonanchor(
                self._quant(ckbd_nonanchor(d_slice), d_mn_na, training)
            )
            d_hat_slice = d_anchor + d_nonanchor

            rgb_liks.append(
                self._rate_lik(r_slice, r_sc_a + r_sc_na, r_mn_a + r_mn_na, training)
            )
            depth_liks.append(
                self._rate_lik(d_slice, d_sc_a + d_sc_na, d_mn_a + d_mn_na, training)
            )
            rgb_hat_slices.append(r_hat_slice)
            depth_hat_slices.append(d_hat_slice)

        rgb_y_hat = jnp.concatenate(rgb_hat_slices, axis=-1)
        depth_y_hat = jnp.concatenate(depth_hat_slices, axis=-1)
        rgb_hat, depth_hat = self.g_s(rgb_y_hat, depth_y_hat)

        return {
            "x_hat": {"r": rgb_hat, "d": depth_hat},
            "r_likelihoods": {
                "y": jnp.concatenate(rgb_liks, -1),
                "z": rgb_z_lik,
            },
            "d_likelihoods": {
                "y": jnp.concatenate(depth_liks, -1),
                "z": depth_z_lik,
            },
        }

    def aux_loss(self):
        return (
            self.rgb_entropy_bottleneck.aux_loss()
            + self.depth_entropy_bottleneck.aux_loss()
        )

    # --- codec stage programs (shared by encoder and decoder) --------------

    def encode_front(self, rgb, depth):
        rgb_y, depth_y = self.g_a(rgb, depth)
        rgb_z, depth_z = self.h_a(rgb_y, depth_y)
        r_med = self.rgb_entropy_bottleneck.medians()
        d_med = self.depth_entropy_bottleneck.medians()
        rgb_z_sym = jnp.round(rgb_z - r_med).astype(jnp.int32)
        depth_z_sym = jnp.round(depth_z - d_med).astype(jnp.int32)
        return rgb_y, depth_y, rgb_z_sym, depth_z_sym

    def hyper_decode(self, rgb_z_sym, depth_z_sym):
        r_med = self.rgb_entropy_bottleneck.medians()
        d_med = self.depth_entropy_bottleneck.medians()
        rgb_z_hat = rgb_z_sym.astype(jnp.float32) + r_med
        depth_z_hat = depth_z_sym.astype(jnp.float32) + d_med
        return self.h_s(rgb_z_hat, depth_z_hat)

    def stage_rgb_anchor(self, idx: int, rgb_prev, depth_prev, rgb_hyper, depth_hyper, scale_table):
        init = self._init_context(idx, list(rgb_prev), list(depth_prev), rgb_hyper, depth_hyper)
        sc, mn = self._params(self.rgb_ep_anchor[idx], init[0])
        sc_sq, mn_sq = ckbd_anchor_squeeze(sc), ckbd_anchor_squeeze(mn)
        return build_indexes(sc_sq, scale_table), mn_sq, init

    def stage_depth_anchor(self, idx: int, r_sym_a, r_mn_a_sq, init, scale_table):
        r_anchor_hat = ckbd_anchor_unsqueeze(r_sym_a.astype(jnp.float32) + r_mn_a_sq)
        r_local = self.rgb_local_context[idx](r_anchor_hat)
        sc, mn = self._params(self.depth_ep_anchor[idx], [r_local] + list(init[1]))
        sc_sq, mn_sq = ckbd_anchor_squeeze(sc), ckbd_anchor_squeeze(mn)
        return build_indexes(sc_sq, scale_table), mn_sq, r_anchor_hat, r_local

    def stage_rgb_nonanchor(self, idx: int, d_sym_a, d_mn_a_sq, r_local, init, scale_table):
        d_anchor_hat = ckbd_anchor_unsqueeze(d_sym_a.astype(jnp.float32) + d_mn_a_sq)
        d_local = self.depth_local_context[idx](d_anchor_hat)
        sc, mn = self._params(
            self.rgb_ep_nonanchor[idx],
            self._ctx_rgb_nonanchor(r_local, d_local, list(init[0])),
        )
        sc_sq = ckbd_nonanchor_squeeze(sc)
        mn_sq = ckbd_nonanchor_squeeze(mn)
        return build_indexes(sc_sq, scale_table), mn_sq, d_anchor_hat, d_local

    def stage_depth_nonanchor(
        self, idx: int, r_anchor_hat, r_sym_na, r_mn_na_sq, d_local, init, scale_table
    ):
        r_hat_slice = r_anchor_hat + ckbd_nonanchor_unsqueeze(
            r_sym_na.astype(jnp.float32) + r_mn_na_sq
        )
        r_local_full = self.rgb_local_context_full[idx](r_hat_slice)
        sc, mn = self._params(
            self.depth_ep_nonanchor[idx], [r_local_full, d_local] + list(init[1])
        )
        sc_sq = ckbd_nonanchor_squeeze(sc)
        mn_sq = ckbd_nonanchor_squeeze(mn)
        return build_indexes(sc_sq, scale_table), mn_sq, r_hat_slice

    def merge_depth_slice(self, d_anchor_hat, d_sym_na, d_mn_na_sq):
        return d_anchor_hat + ckbd_nonanchor_unsqueeze(
            d_sym_na.astype(jnp.float32) + d_mn_na_sq
        )

    def anchor_symbols(self, idx: int, y, mn_sq):
        start = sum(self.slice_ch[:idx])
        y_slice = y[..., start : start + self.slice_ch[idx]]
        return _sym16(ckbd_anchor_squeeze(y_slice) - mn_sq)

    def nonanchor_symbols(self, idx: int, y, mn_sq):
        start = sum(self.slice_ch[:idx])
        y_slice = y[..., start : start + self.slice_ch[idx]]
        return _sym16(ckbd_nonanchor_squeeze(y_slice) - mn_sq)

    def synthesize(self, rgb_y_hat, depth_y_hat):
        return self.g_s(rgb_y_hat, depth_y_hat)


class ELICUnitedR2D(ELICUnited):
    """Unidirectional RGB->depth prior transfer (reference
    models/elic_united_R2D.py): one-way transforms + rgb contexts that
    exclude depth."""

    one_way: bool = True
