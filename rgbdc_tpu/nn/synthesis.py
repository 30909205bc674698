"""Synthesis (decoder-side) transforms: g_s and h_s families.

Channel/stage plan from reference modules/transform/synthesis.py:
  - SynthesisTransformEX (:32-70): mirror of AnalysisTransformEX with 4
    stride-2 deconvs; optional return of the 3 intermediate deconv taps
    (up1..up3) for the master cascade
  - SynthesisTransformEXcross (:126-184): dual-branch; after each of the
    first 3 deconvs a BiSPF fuses modalities, both branches concat and a
    ResidualBottleneck(2N -> N) absorbs the doubled width
  - SynthesisTransformEXSingle (:186-242): one-way (rgb branch never widens)
  - HyperSynthesisEX (:276-285): 2 stride-2 deconv5 + stride-1 deconv3 -> 2M
  - HyperSynthesisEXcross (:305-323, 345-362): 3 SE-gated cross stages, each
    concat(self, other) -> SE -> deconv -> leaky_relu (last stage k3 s1,
    no activation)
"""

from collections.abc import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from .attention import BiSPF, BiSPFSingle, SEBlock
from .layers import AttentionBlock, ResidualBottleneck, deconv

Act = Callable[[jax.Array], jax.Array]


class SynthesisTransformEX(nn.Module):
    N: int
    M: int
    out_ch: int = 3
    act: Act = jax.nn.relu
    return_mid: bool = False

    @nn.compact
    def __call__(self, x):
        n = self.N
        x = AttentionBlock(self.M)(x)
        x = deconv(n)(x)
        up1 = x
        for _ in range(3):
            x = ResidualBottleneck(n, act=self.act)(x)
        x = deconv(n)(x)
        up2 = x
        x = AttentionBlock(n)(x)
        for _ in range(3):
            x = ResidualBottleneck(n, act=self.act)(x)
        x = deconv(n)(x)
        up3 = x
        for _ in range(3):
            x = ResidualBottleneck(n, act=self.act)(x)
        x = deconv(self.out_ch)(x)
        if self.return_mid:
            return x, up1, up2, up3
        return x


class SynthesisTransformPlus(nn.Module):
    """Master-cascade g_s (reference synthesis.py:74-110): the EX decoder
    with a SpatialAligner fusing the aux decoder's tap after each of the
    first three deconvs."""

    N: int
    M: int
    out_ch: int = 3
    act: Act = jax.nn.relu

    @nn.compact
    def __call__(self, x, up1, up2, up3):
        from .aligners import SpatialAligner

        n = self.N
        x = AttentionBlock(self.M)(x)
        x = deconv(n)(x)
        x = SpatialAligner(out_ch=n)(x, up1)
        for _ in range(3):
            x = ResidualBottleneck(n, act=self.act)(x)
        x = deconv(n)(x)
        x = SpatialAligner(out_ch=n)(x, up2)
        x = AttentionBlock(n)(x)
        for _ in range(3):
            x = ResidualBottleneck(n, act=self.act)(x)
        x = deconv(n)(x)
        x = SpatialAligner(out_ch=n)(x, up3)
        for _ in range(3):
            x = ResidualBottleneck(n, act=self.act)(x)
        return deconv(self.out_ch)(x)


class SynthesisTransformEXcross(nn.Module):
    """Dual-branch g_s with Bi-CPT fusion after each of the first 3 deconvs."""

    N: int
    M: int
    act: Act = jax.nn.relu

    @nn.compact
    def __call__(self, rgb, depth):
        n = self.N
        rgb = AttentionBlock(self.M)(rgb)
        depth = AttentionBlock(self.M)(depth)
        rgb = deconv(n)(rgb)
        depth = deconv(n)(depth)
        for stage in range(3):
            if stage == 1:
                rgb = AttentionBlock(n)(rgb)
                depth = AttentionBlock(n)(depth)
            rgb_f, depth_f = BiSPF(n)(rgb, depth)
            rgb = jnp.concatenate([rgb, rgb_f], axis=-1)
            depth = jnp.concatenate([depth, depth_f], axis=-1)
            rgb = ResidualBottleneck(2 * n, out=n, act=self.act)(rgb)
            depth = ResidualBottleneck(2 * n, out=n, act=self.act)(depth)
            for _ in range(2):
                rgb = ResidualBottleneck(n, act=self.act)(rgb)
                depth = ResidualBottleneck(n, act=self.act)(depth)
            if stage == 2:
                rgb = deconv(3)(rgb)
                depth = deconv(1)(depth)
            else:
                rgb = deconv(n)(rgb)
                depth = deconv(n)(depth)
        return rgb, depth


class SynthesisTransformEXSingle(nn.Module):
    """One-way variant: only depth sees fused features."""

    N: int
    M: int
    act: Act = jax.nn.relu

    @nn.compact
    def __call__(self, rgb, depth):
        n = self.N
        rgb = AttentionBlock(self.M)(rgb)
        depth = AttentionBlock(self.M)(depth)
        rgb = deconv(n)(rgb)
        depth = deconv(n)(depth)
        for stage in range(3):
            if stage == 1:
                rgb = AttentionBlock(n)(rgb)
                depth = AttentionBlock(n)(depth)
            depth_f = BiSPFSingle(n)(rgb, depth)
            depth = jnp.concatenate([depth, depth_f], axis=-1)
            rgb = ResidualBottleneck(n, out=n, act=self.act)(rgb)
            depth = ResidualBottleneck(2 * n, out=n, act=self.act)(depth)
            for _ in range(2):
                rgb = ResidualBottleneck(n, act=self.act)(rgb)
                depth = ResidualBottleneck(n, act=self.act)(depth)
            if stage == 2:
                rgb = deconv(3)(rgb)
                depth = deconv(1)(depth)
            else:
                rgb = deconv(n)(rgb)
                depth = deconv(n)(depth)
        return rgb, depth


class HyperSynthesisEX(nn.Module):
    N: int
    M: int
    act: Act = jax.nn.relu

    @nn.compact
    def __call__(self, x):
        m = self.M
        x = deconv(m)(x)
        x = self.act(x)
        x = deconv(m * 3 // 2)(x)
        x = self.act(x)
        x = deconv(m * 2, kernel=3, stride=1)(x)
        return x


class _HyperTransformBlock(nn.Module):
    out_ch: int
    is_last: bool = False

    @nn.compact
    def __call__(self, a, b=None):
        f = a if b is None else jnp.concatenate([a, b], axis=-1)
        f = SEBlock(f.shape[-1])(f)
        if self.is_last:
            return deconv(self.out_ch, kernel=3, stride=1)(f)
        f = deconv(self.out_ch, kernel=5, stride=2)(f)
        return jax.nn.leaky_relu(f, negative_slope=0.01)


class HyperSynthesisEXcross(nn.Module):
    """Cross-modal hyper decoder: 3 SE-gated stages, each conditioning on
    the other modality's running features."""

    N: int
    M: int

    def setup(self):
        m = self.M
        self.r_h_s1 = _HyperTransformBlock(m)
        self.r_h_s2 = _HyperTransformBlock(m * 3 // 2)
        self.r_h_s3 = _HyperTransformBlock(2 * m, is_last=True)
        self.d_h_s1 = _HyperTransformBlock(m)
        self.d_h_s2 = _HyperTransformBlock(m * 3 // 2)
        self.d_h_s3 = _HyperTransformBlock(2 * m, is_last=True)

    def __call__(self, rgb, depth):
        r1 = self.r_h_s1(rgb, depth)
        d1 = self.d_h_s1(depth, rgb)
        r2 = self.r_h_s2(r1, d1)
        d2 = self.d_h_s2(d1, r1)
        return self.r_h_s3(r2, d2), self.d_h_s3(d2, r2)


class HyperSynthesisEXSingle(nn.Module):
    """R2D variant: rgb hyper decoder is independent, depth conditions on rgb."""

    N: int
    M: int

    def setup(self):
        m = self.M
        self.r_h_s1 = _HyperTransformBlock(m)
        self.r_h_s2 = _HyperTransformBlock(m * 3 // 2)
        self.r_h_s3 = _HyperTransformBlock(2 * m, is_last=True)
        self.d_h_s1 = _HyperTransformBlock(m)
        self.d_h_s2 = _HyperTransformBlock(m * 3 // 2)
        self.d_h_s3 = _HyperTransformBlock(2 * m, is_last=True)

    def __call__(self, rgb, depth):
        r1 = self.r_h_s1(rgb)
        d1 = self.d_h_s1(depth, rgb)
        r2 = self.r_h_s2(r1)
        d2 = self.d_h_s2(d1, r1)
        return self.r_h_s3(r2), self.d_h_s3(d2, r2)
