"""STF_united — joint RGB-D Swin codec with Bi-CPT fusion + Bi-CEE entropy.

Behavioral spec from reference models/stf_united.py:408-679:
  - dual swin analysis/synthesis towers (one per modality); after every
    PatchMerging/PatchSplit a BiSPF fuses the modalities in residual-ADD
    form (rgb += rgb_f, depth += depth_f — unlike the conv codecs' concat)
  - hyper nets + the full Bi-CEE 4-group entropy model are inherited from
    ELIC_united with the overridden config N=192, M=384,
    slice_ch=[24,24,48,96,192] (reference :639-641)
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.attention import BiSPF
from ..nn.swin import BasicLayer, PatchEmbed
from .elic_united import ELICUnited


class AnalysisTransformSTFUnited(nn.Module):
    embed_dim: int = 48
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window: int = 4

    def setup(self):
        e = self.embed_dim
        nl = len(self.depths)
        self.rgb_patch_embed = PatchEmbed(e, 2)
        self.depth_patch_embed = PatchEmbed(e, 2)
        self.rgb_layers = [
            BasicLayer(
                dim=e * 2**i,
                depth=self.depths[i],
                num_heads=self.num_heads[i],
                window=self.window,
                resample="merge" if i < nl - 1 else None,
            )
            for i in range(nl)
        ]
        self.depth_layers = [
            BasicLayer(
                dim=e * 2**i,
                depth=self.depths[i],
                num_heads=self.num_heads[i],
                window=self.window,
                resample="merge" if i < nl - 1 else None,
            )
            for i in range(nl)
        ]
        # fusion at the post-merge width (reference: bi_spf(dim) after dim *= 2)
        self.fusions = [BiSPF(e * 2 ** (i + 1)) for i in range(nl - 1)]

    def __call__(self, rgb, depth):
        rgb = self.rgb_patch_embed(rgb)
        depth = self.depth_patch_embed(depth)
        nl = len(self.depths)
        for i in range(nl):
            rgb = self.rgb_layers[i](rgb)
            depth = self.depth_layers[i](depth)
            if i < nl - 1:
                rgb_f, depth_f = self.fusions[i](rgb, depth)
                rgb = rgb + rgb_f
                depth = depth + depth_f
        return rgb, depth  # [B, H/16, W/16, 8e]


class SynthesisTransformSTFUnited(nn.Module):
    embed_dim: int = 48
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window: int = 4

    def setup(self):
        e = self.embed_dim
        nl = len(self.depths)
        rdepths = tuple(reversed(self.depths))
        rheads = tuple(reversed(self.num_heads))
        self.rgb_layers = [
            BasicLayer(
                dim=e * 2 ** (nl - 1 - i),
                depth=rdepths[i],
                num_heads=rheads[i],
                window=self.window,
                resample="split" if i < nl - 1 else None,
            )
            for i in range(nl)
        ]
        self.depth_layers = [
            BasicLayer(
                dim=e * 2 ** (nl - 1 - i),
                depth=rdepths[i],
                num_heads=rheads[i],
                window=self.window,
                resample="split" if i < nl - 1 else None,
            )
            for i in range(nl)
        ]
        self.fusions = [BiSPF(e * 2 ** (nl - 2 - i)) for i in range(nl - 1)]
        self.rgb_end_conv1 = nn.Conv(e * 4, (5, 5), padding="SAME")
        self.rgb_end_conv2 = nn.Conv(3, (3, 3), padding="SAME")
        self.depth_end_conv1 = nn.Conv(e * 4, (5, 5), padding="SAME")
        self.depth_end_conv2 = nn.Conv(1, (3, 3), padding="SAME")

    @staticmethod
    def _pixel_shuffle2(x):
        b, h, w, c = x.shape
        x = x.reshape(b, h, w, c // 4, 2, 2).transpose(0, 1, 4, 2, 5, 3)
        return x.reshape(b, 2 * h, 2 * w, c // 4)

    def __call__(self, rgb, depth):
        nl = len(self.depths)
        for i in range(nl):
            rgb = self.rgb_layers[i](rgb)
            depth = self.depth_layers[i](depth)
            if i < nl - 1:
                rgb_f, depth_f = self.fusions[i](rgb, depth)
                rgb = rgb + rgb_f
                depth = depth + depth_f
        rgb = self.rgb_end_conv2(self._pixel_shuffle2(self.rgb_end_conv1(rgb)))
        depth = self.depth_end_conv2(self._pixel_shuffle2(self.depth_end_conv1(depth)))
        return rgb, depth


class STFUnited(ELICUnited):
    """Swin towers + the inherited Bi-CEE entropy model.

    Defaults mirror the reference's config override: N=192, M=384 (=8*48),
    slice_ch=[24,24,48,96,192]."""

    N: int = 192
    M: int = 384
    slice_ch: Sequence[int] = (24, 24, 48, 96, 192)
    embed_dim: int = 48
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window: int = 4

    # the reference force-overrides these on any config it is handed
    # (models/stf_united.py:639-641): the swin towers fix M = 8*embed_dim,
    # so the generic ELIC config's M=320/slice_ch would desync the towers.
    # build_model() keeps the class defaults for these fields.
    PINNED_CONFIG = ("N", "M", "slice_ch")

    def _setup_transforms(self):
        from ..nn import HyperAnalysisEXcross, HyperSynthesisEXcross

        self.g_a = AnalysisTransformSTFUnited(
            self.embed_dim, self.depths, self.num_heads, self.window
        )
        self.g_s = SynthesisTransformSTFUnited(
            self.embed_dim, self.depths, self.num_heads, self.window
        )
        self.h_a = HyperAnalysisEXcross(self.N, self.M)
        self.h_s = HyperSynthesisEXcross(self.N, self.M)
