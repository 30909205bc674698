"""Basic conv blocks, NHWC/flax.

Architecture spec (layer graph, channel plan) follows the reference's
modules/layers/{conv.py,res_blk.py} and CompressAI layers
(compressai/layers/layers.py:162-213), re-expressed channels-last.

Padding is TORCH-EXACT (symmetric k//2 for conv; the conv-transpose dual
of padding=k//2 + output_padding=s-1 for deconv, with transpose_kernel so
the math matches torch's gradient-of-conv semantics).  This makes every
transform block numerically interchangeable with the reference given
converted weights — the golden-parity tests
(tests/test_golden_parity.py) depend on it.  On TPU an explicit pad is
the same XLA conv as SAME padding; there is no performance cost.
"""

from collections.abc import Callable

import flax.linen as nn
import jax

from ..ops.math import exact_gelu
import jax.numpy as jnp

from ..ops.gdn import GDN

Act = Callable[[jax.Array], jax.Array]


def conv(features: int, kernel: int = 5, stride: int = 2) -> nn.Conv:
    p = kernel // 2
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride), padding=((p, p), (p, p))
    )


class Conv(nn.Module):
    """Dot-general lowering of the 1x1 conv (RGBDC_DOT1X1=1, serving
    opt-in).

    NOTE the class name: flax auto-names unnamed children
    ``f"{cls.__name__}_{i}"`` with the counter keyed by that NAME string,
    so this class must be called ``Conv`` to produce the same param paths
    ("Conv_0", ...) as ``nn.Conv`` in parents that mix both lowerings.
    Parameter-compatible with ``nn.Conv(features, (1, 1))`` — same
    ``kernel`` [1, 1, in, out] / ``bias`` params — so checkpoints load
    unchanged in either mode.

    Why: XLA's in-program layout assignment runs the attention/RB 1x1
    convs ~5x off the HBM bandwidth floor at serving shapes (the
    [16,256,320,192] 1x1 measured 7.1 ms inside the synthesis program vs
    1.3 ms isolated and 0.6 ms as a channel-contracting dot_general —
    docs/PERF.md round 3).  A dot constrains the layout to row-major with
    channels on the lanes, which is what the MXU wants here.  Same linear
    map up to fp summation order.
    """

    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kern = self.param(
            "kernel", nn.initializers.lecun_normal(), (1, 1, in_ch, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.stride != 1:
            x = x[:, :: self.stride, :: self.stride, :]
        dt = jnp.promote_types(x.dtype, kern.dtype)
        y = jax.lax.dot_general(
            x.astype(dt),
            kern[0, 0].astype(dt),
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=dt,
        )
        return y + bias.astype(dt)


def conv1x1(features: int, stride: int = 1) -> nn.Module:
    """1x1 conv; with RGBDC_DOT1X1=1 lowered as a channel dot (see
    :class:`Conv` — param-path and checkpoint compatible either way)."""
    import os

    if os.environ.get("RGBDC_DOT1X1", "0") == "1":
        return Conv(features, stride)
    return nn.Conv(features, (1, 1), strides=(stride, stride))


def conv3x3(features: int, stride: int = 1) -> nn.Conv:
    return nn.Conv(features, (3, 3), strides=(stride, stride), padding=((1, 1), (1, 1)))


class ConvTranspose(nn.Module):
    """Subpixel lowering of the k=5/s=2 transposed conv (RGBDC_SUBPIX=1).

    NOTE the class name: flax auto-names unnamed children
    ``f"{cls.__name__}_{i}"`` with the counter keyed by that NAME string,
    so this class must be called ``ConvTranspose`` to produce the same
    param paths ("ConvTranspose_0", ...) as ``nn.ConvTranspose`` — even
    in parents that mix both lowerings (e.g. HyperSynthesisEX's two k5/s2
    + one k3/s1 deconvs share one counter).

    Parameter-compatible with ``nn.ConvTranspose(transpose_kernel=True)``
    — same ``kernel`` [kh, kw, out, in] / ``bias`` params — and registered
    under the auto-name "ConvTranspose_N" (see :func:`deconv`), so trained
    checkpoints and converted torch weights load unchanged.

    Computes the identical linear map as one dense stride-1 3x3 conv that
    emits all four output phases, followed by depth-to-space: XLA lowers a
    stride-2 transposed conv to a conv over the 2x-zero-dilated input, so
    3/4 of its MACs multiply structural zeros; the phase decomposition
    re-packs the 25 taps into four dense 3x3 phase kernels (taps of kernel
    parity (p, q) feed output phase (p, q)) with zero wasted work.  Output
    differs from the reference lowering only by fp summation order — the
    serving synthesis runs bf16 anyway, and the enc/dec bit-exact closure
    never touches synthesis.
    """

    features: int

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        out = self.features
        kern = self.param(
            "kernel", nn.initializers.lecun_normal(), (5, 5, out, in_ch)
        )
        bias = self.param("bias", nn.initializers.zeros, (out,))
        kt = kern.transpose(0, 1, 3, 2)  # [5, 5, in, out]

        def phase_rows(m, p):
            # Output row 2i+p pulls input rows i-1..i+1 through kernel-row
            # taps of parity p: p=0 -> taps (4, 2, 0); p=1 -> (-, 3, 1).
            if p == 0:
                return jnp.stack([m[4], m[2], m[0]], axis=0)
            return jnp.stack([jnp.zeros_like(m[0]), m[3], m[1]], axis=0)

        phases = []
        for p in (0, 1):
            mp = phase_rows(kt, p)
            for q in (0, 1):
                mq = phase_rows(mp.transpose(1, 0, 2, 3), q).transpose(1, 0, 2, 3)
                phases.append(mq)
        w = jnp.concatenate(phases, axis=-1)  # [3, 3, in, 4*out]

        y = jax.lax.conv_general_dilated(
            x,
            w.astype(x.dtype),
            (1, 1),
            ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        b, h, wd, _ = y.shape
        y = y.reshape(b, h, wd, 2, 2, out)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * wd, out)
        return y + bias.astype(y.dtype)


def deconv(features: int, kernel: int = 5, stride: int = 2) -> nn.Module:
    """torch ConvTranspose2d(k, s, padding=k//2, output_padding=s-1) exact:
    lo = k-1-k//2, hi = lo + (s-1); transpose_kernel flips + swaps in/out
    so the kernel math is the gradient-of-conv, like torch.

    With RGBDC_SUBPIX=1 the hot k=5/s=2 case is lowered via
    :class:`SubpixelConvTranspose` (same params, same auto-name, same map
    up to fp order) — ~4x fewer MACs on TPU than the zero-dilated-input
    conv XLA otherwise emits."""
    import os

    if (
        kernel == 5
        and stride == 2
        and os.environ.get("RGBDC_SUBPIX", "0") == "1"
    ):
        return ConvTranspose(features)
    lo = kernel - 1 - kernel // 2
    hi = lo + (stride - 1)
    return nn.ConvTranspose(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((lo, hi), (lo, hi)),
        transpose_kernel=True,
    )


class SubpelConv3x3(nn.Module):
    """3x3 conv + depth-to-space upsampling (PixelShuffle equivalent)."""

    features: int
    r: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features * self.r**2, (3, 3), padding="SAME")(x)
        b, h, w, c = x.shape
        r = self.r
        x = x.reshape(b, h, w, r, r, c // (r * r))
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(b, h * r, w * r, c // (r * r))


def subpel_conv3x3(features: int, r: int = 1) -> SubpelConv3x3:
    return SubpelConv3x3(features=features, r=r)


class ResidualBottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck with residual (reference res_blk.py:7-27)."""

    features: int
    out: int | None = None
    act: Act = jax.nn.relu

    @nn.compact
    def __call__(self, x):
        n = self.features
        out_ch = n if self.out is None else self.out
        h = conv1x1(n // 2)(x)
        h = self.act(h)
        h = conv3x3(n // 2)(h)
        h = self.act(h)
        h = conv1x1(out_ch)(h)
        skip = x if x.shape[-1] == out_ch else conv1x1(out_ch)(x)
        return h + skip


class ResidualBlock(nn.Module):
    """Two 3x3 convs with ReLU and residual (reference res_blk.py:30-57)."""

    features: int

    @nn.compact
    def __call__(self, x):
        h = conv3x3(self.features)(x)
        h = jax.nn.relu(h)
        h = conv3x3(self.features)(h)
        h = jax.nn.relu(h)
        skip = x if x.shape[-1] == self.features else conv1x1(self.features)(x)
        return h + skip


class ResidualBlockWithStride(nn.Module):
    """Stride-2 residual block with GDN (reference res_blk.py:60-91)."""

    features: int
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        h = conv3x3(self.features, stride=self.stride)(x)
        h = exact_gelu(h)
        h = conv3x3(self.features)(h)
        h = GDN(channels=self.features)(h)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = conv1x1(self.features, stride=self.stride)(x)
        return h + x


class ResidualBlockUpsample(nn.Module):
    """Subpixel-upsample residual block with IGDN (reference res_blk.py:94-119)."""

    features: int
    upsample: int = 2

    @nn.compact
    def __call__(self, x):
        h = SubpelConv3x3(self.features, self.upsample)(x)
        h = exact_gelu(h)
        h = conv3x3(self.features)(h)
        h = GDN(channels=self.features, inverse=True)(h)
        skip = SubpelConv3x3(self.features, self.upsample)(x)
        return h + skip


class _ResidualUnit(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        n = self.features
        h = conv1x1(n // 2)(x)
        h = jax.nn.relu(h)
        h = conv3x3(n // 2)(h)
        h = jax.nn.relu(h)
        h = conv1x1(n)(h)
        return jax.nn.relu(h + x)


class AttentionBlock(nn.Module):
    """Cheng2020 simplified attention gate (compressai layers.py:162-213):
    trunk of 3 residual units gated by sigmoid of a parallel branch."""

    features: int

    @nn.compact
    def __call__(self, x):
        a = x
        for _ in range(3):
            a = _ResidualUnit(self.features)(a)
        b = x
        for _ in range(3):
            b = _ResidualUnit(self.features)(b)
        b = conv1x1(self.features)(b)
        return x + a * jax.nn.sigmoid(b)


class _GeluResidualUnit(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        n = self.features
        h = conv1x1(n // 2)(x)
        h = exact_gelu(h)
        h = conv3x3(n // 2)(h)
        h = exact_gelu(h)
        h = conv1x1(n)(h)
        return exact_gelu(h + x)


class WinNoShiftAttention(nn.Module):
    """STF-style window-attention gate block (reference
    modules/layers/conv.py:37-77): trunk of GELU residual units gated by a
    sigmoid branch that runs a non-shifted window attention first."""

    dim: int
    num_heads: int = 8
    window: int = 8

    @nn.compact
    def __call__(self, x):
        from .swin import WindowAttention, window_partition, window_reverse

        a = x
        for _ in range(3):
            a = _GeluResidualUnit(self.dim)(a)
        b, h, w, c = x.shape
        attn_in = window_partition(x, self.window)
        attn = WindowAttention(self.dim, self.num_heads, self.window)(attn_in)
        bb = window_reverse(attn, self.window, h, w)
        for _ in range(3):
            bb = _GeluResidualUnit(self.dim)(bb)
        bb = conv1x1(self.dim)(bb)
        return x + a * jax.nn.sigmoid(bb)
