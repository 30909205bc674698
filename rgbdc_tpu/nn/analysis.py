"""Analysis (encoder-side) transforms: g_a and h_a families.

Channel/stage plan from reference modules/transform/analysis.py:
  - AnalysisTransformEX (:29-52): 4x stride-2 conv5, 3x ResidualBottleneck
    between, AttentionBlock at N (after 2 downsamples) and at M (output)
  - AnalysisTransformEXcross (:116-174): dual-branch with 3 BiSPF (Bi-CPT)
    fusion points; after each fusion both branches concat their own fused
    features and the next strided conv maps 2N -> N (or 2N -> M at the end)
  - AnalysisTransformEXSingle (:56-112): R2D one-way variant — only depth
    concats the fused feature; rgb branch convs stay N -> N
  - HyperAnalysisEX (:207-216): conv3 s1 + 2x conv5 s2
  - HyperAnalysisEXcross (:231-242): two independent copies (no interaction)

The reference walks zipped nn.Sequentials with Identity placeholders; here
each branch is an explicit staged function — same dataflow, no torch-isms.
"""

from collections.abc import Callable

import flax.linen as nn
import jax

from .attention import BiSPF, BiSPFSingle
from .layers import AttentionBlock, ResidualBottleneck, conv, conv3x3

Act = Callable[[jax.Array], jax.Array]
import jax.numpy as jnp


class AnalysisTransformEX(nn.Module):
    N: int
    M: int
    act: Act = jax.nn.relu

    @nn.compact
    def __call__(self, x):
        n, m = self.N, self.M
        x = conv(n)(x)
        for _ in range(3):
            x = ResidualBottleneck(n, act=self.act)(x)
        x = conv(n)(x)
        for _ in range(3):
            x = ResidualBottleneck(n, act=self.act)(x)
        x = AttentionBlock(n)(x)
        x = conv(n)(x)
        for _ in range(3):
            x = ResidualBottleneck(n, act=self.act)(x)
        x = conv(m)(x)
        x = AttentionBlock(m)(x)
        return x


class AnalysisTransformEXcross(nn.Module):
    """Dual-branch g_a with bidirectional Bi-CPT fusion at 3 scales."""

    N: int
    M: int
    act: Act = jax.nn.relu

    @nn.compact
    def __call__(self, rgb, depth):
        n, m = self.N, self.M

        def res_stack(x, branch):
            for i in range(3):
                x = ResidualBottleneck(n, act=self.act)(x)
            return x

        rgb = conv(n)(rgb)
        depth = conv(n)(depth)
        for stage in range(3):
            rgb = res_stack(rgb, "r")
            depth = res_stack(depth, "d")
            if stage == 1:
                rgb = AttentionBlock(n)(rgb)
                depth = AttentionBlock(n)(depth)
            rgb_f, depth_f = BiSPF(n)(rgb, depth)
            rgb = jnp.concatenate([rgb, rgb_f], axis=-1)
            depth = jnp.concatenate([depth, depth_f], axis=-1)
            out_ch = m if stage == 2 else n
            rgb = conv(out_ch)(rgb)
            depth = conv(out_ch)(depth)
        rgb = AttentionBlock(m)(rgb)
        depth = AttentionBlock(m)(depth)
        return rgb, depth


class AnalysisTransformEXSingle(nn.Module):
    """R2D one-way variant: RGB branch is oblivious to depth."""

    N: int
    M: int
    act: Act = jax.nn.relu

    @nn.compact
    def __call__(self, rgb, depth):
        n, m = self.N, self.M

        def res_stack(x):
            for _ in range(3):
                x = ResidualBottleneck(n, act=self.act)(x)
            return x

        rgb = conv(n)(rgb)
        depth = conv(n)(depth)
        for stage in range(3):
            rgb = res_stack(rgb)
            depth = res_stack(depth)
            if stage == 1:
                rgb = AttentionBlock(n)(rgb)
                depth = AttentionBlock(n)(depth)
            depth_f = BiSPFSingle(n)(rgb, depth)
            depth = jnp.concatenate([depth, depth_f], axis=-1)
            out_ch = m if stage == 2 else n
            rgb = conv(out_ch)(rgb)
            depth = conv(out_ch)(depth)
        rgb = AttentionBlock(m)(rgb)
        depth = AttentionBlock(m)(depth)
        return rgb, depth


class HyperAnalysisEX(nn.Module):
    N: int
    M: int
    act: Act = jax.nn.relu

    @nn.compact
    def __call__(self, x):
        x = conv3x3(self.N)(x)
        x = self.act(x)
        x = conv(self.N)(x)
        x = self.act(x)
        x = conv(self.N)(x)
        return x


class HyperAnalysisEXcross(nn.Module):
    """Independent per-modality hyper encoders (no cross-talk in h_a)."""

    N: int
    M: int
    act: Act = jax.nn.relu

    def setup(self):
        self.rgb_reduction = HyperAnalysisEX(self.N, self.M, self.act)
        self.depth_reduction = HyperAnalysisEX(self.N, self.M, self.act)

    def __call__(self, rgb, depth):
        return self.rgb_reduction(rgb), self.depth_reduction(depth)
