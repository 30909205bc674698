"""Cheng2020-anchor + one-pass checkerboard context ("ckbd").

Behavioral spec from reference models/Cheng2020withCKBD.py:12-265 and the
Cheng2020Anchor backbone (CompressAI models/waseda.py:22-89):
  - g_a: GDN residual blocks, 4x downsample via strided res blocks + conv3
  - g_s: residual blocks with subpixel upsampling (IGDN)
  - h_a: conv3 stack with two stride-2 stages; h_s: conv3+subpixel -> 2N
  - context: ONE masked 5x5 conv over the full latent whose kernel taps only
    anchor-parity offsets; a single shared entropy-parameters head serves
    both phases (anchor sees a zero context)
  - training forward adds uniform noise and masks the anchor part of the
    context (one-pass); ``validate`` is the two-pass STE variant
  - compress/decompress: two dense passes over the whole latent (no channel
    slices)

Exposes the same stage-method surface as ELIC (slice_ch=(N,)) so the
generic ElicCodec driver handles the real bitstream paths.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..entropy import EntropyBottleneck, build_indexes, gaussian_forward
from ..nn import (
    AttentionBlock,
    ResidualBlock,
    ResidualBlockUpsample,
    ResidualBlockWithStride,
    conv3x3,
)
from .priors import JointAutoregressiveHierarchicalPriors, MaskedConv2D
from ..nn.layers import conv1x1, SubpelConv3x3
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


class CheckerboardMaskedConv(nn.Module):
    """5x5 conv whose kernel is zero except at anchor-parity offsets
    ((di+dj) odd), the one-pass checkerboard context predictor."""

    features: int
    kernel: int = 5

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, in_ch, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ii = np.arange(k)[:, None]
        jj = np.arange(k)[None, :]
        mask = jnp.asarray(((ii + jj) % 2 == 1)[..., None, None], dtype=kernel.dtype)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
        )
        out = jax.lax.conv_general_dilated(
            x, kernel * mask, (1, 1), "SAME", dimension_numbers=dn
        )
        return out + bias


class _ChengAnalysis(nn.Module):
    N: int

    @nn.compact
    def __call__(self, x):
        n = self.N
        x = ResidualBlockWithStride(n)(x)
        x = ResidualBlock(n)(x)
        x = ResidualBlockWithStride(n)(x)
        x = ResidualBlock(n)(x)
        x = ResidualBlockWithStride(n)(x)
        x = ResidualBlock(n)(x)
        return conv3x3(n, stride=2)(x)


class _ChengSynthesis(nn.Module):
    N: int
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


class _ChengHyperAnalysis(nn.Module):
    N: int

    @nn.compact
    def __call__(self, x):
        n = self.N
        x = jax.nn.leaky_relu(conv3x3(n)(x), 0.01)
        x = jax.nn.leaky_relu(conv3x3(n)(x), 0.01)
        x = jax.nn.leaky_relu(conv3x3(n, stride=2)(x), 0.01)
        x = jax.nn.leaky_relu(conv3x3(n)(x), 0.01)
        return conv3x3(n, stride=2)(x)


class _ChengHyperSynthesis(nn.Module):
    N: int

    @nn.compact
    def __call__(self, x):
        n = self.N
        x = jax.nn.leaky_relu(conv3x3(n)(x), 0.01)
        x = jax.nn.leaky_relu(SubpelConv3x3(n, 2)(x), 0.01)
        x = jax.nn.leaky_relu(conv3x3(n * 3 // 2)(x), 0.01)
        x = jax.nn.leaky_relu(SubpelConv3x3(n * 3 // 2, 2)(x), 0.01)
        return conv3x3(n * 2)(x)


class _SharedEntropyParameters(nn.Module):
    """1x1 funnel 4N -> 10N/3 -> 8N/3 -> 2N with LeakyReLU (the
    JointAutoregressive head, priors.py:372-380)."""

    N: int

    @nn.compact
    def __call__(self, x):
        n = self.N
        x = jax.nn.leaky_relu(conv1x1(n * 10 // 3)(x), 0.01)
        x = jax.nn.leaky_relu(conv1x1(n * 8 // 3)(x), 0.01)
        return conv1x1(n * 2)(x)


class Cheng2020AnchorCheckerboard(nn.Module):
    N: int = 192
    in_ch: int = 3

    @property
    def M(self):
        return self.N

    @property
    def slice_ch(self):
        return (self.N,)

    def setup(self):
        n = self.N
        self.g_a = _ChengAnalysis(n)
        self.g_s = _ChengSynthesis(n, out_ch=self.in_ch)
        self.h_a = _ChengHyperAnalysis(n)
        self.h_s = _ChengHyperSynthesis(n)
        self.entropy_parameters = _SharedEntropyParameters(n)
        self.context_prediction = CheckerboardMaskedConv(2 * n)
        self.entropy_bottleneck = EntropyBottleneck(channels=n)

    # --- training forwards -------------------------------------------------

    def __call__(self, x, training: bool = False):
        """One-pass forward with uniform-noise quantization
        (reference :52-71)."""
        y = self.g_a(x)
        z = self.h_a(y)
        z_hat, z_lik = self.entropy_bottleneck(z, training=training)
        if training:
            noise = jax.random.uniform(
                self.make_rng("noise"), y.shape, minval=-0.5, maxval=0.5
            )
            y_hat = y + noise
        else:
            y_hat = jnp.round(y)
        hyper = self.h_s(z_hat)
        ctx = ckbd_nonanchor(self.context_prediction(y_hat))  # mask anchor part
        params = self.entropy_parameters(jnp.concatenate([ctx, hyper], axis=-1))
        scales, means = jnp.split(params, 2, axis=-1)
        # rate at the quantized latent — the reference's
        # gaussian_conditional(y, ...) re-quantizes internally (:70)
        y_lik = gaussian_forward(
            y, scales, means, training,
            self.make_rng("noise") if training else None,
        )[1]
        x_hat = self.g_s(y_hat)
        return {"x_hat": x_hat, "likelihoods": {"y": y_lik, "z": z_lik}}

    def validate(self, x, training: bool = False):
        """Two-pass STE forward (reference :74-101) — true-distortion
        estimate; also usable as a training objective."""
        y = self.g_a(x)
        z = self.h_a(y)
        _, z_lik = self.entropy_bottleneck(z, training=False)
        z_hat = quantize_ste(z, self.entropy_bottleneck.medians())
        hyper = self.h_s(z_hat)
        zero_ctx = jnp.zeros(y.shape[:-1] + (2 * y.shape[-1],), y.dtype)
        p_anchor = self.entropy_parameters(
            jnp.concatenate([zero_ctx, hyper], axis=-1)
        )
        p_anchor = ckbd_anchor(p_anchor)
        _, means_a = jnp.split(p_anchor, 2, axis=-1)
        ctx = ckbd_nonanchor(self.context_prediction(quantize_ste(y, means_a)))
        params = self.entropy_parameters(jnp.concatenate([ctx, hyper], axis=-1))
        scales, means = jnp.split(params, 2, axis=-1)
        y_hat = quantize_ste(y, means)
        y_lik = gaussian_forward(
            y, scales, means, training,
            self.make_rng("noise") if training else None,
        )[1]
        x_hat = self.g_s(y_hat)
        return {"x_hat": x_hat, "likelihoods": {"y": y_lik, "z": z_lik}}

    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()

    # --- codec stage surface (ElicCodec-compatible, slice_ch=(N,)) ---------

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
        zero_ctx = jnp.zeros(hyper.shape[:-1] + (2 * self.N,), hyper.dtype)
        params = self.entropy_parameters(jnp.concatenate([zero_ctx, hyper], -1))
        scales, means = jnp.split(params, 2, axis=-1)
        sc_sq = ckbd_anchor_squeeze(scales)
        mn_sq = ckbd_anchor_squeeze(means)
        return build_indexes(sc_sq, scale_table), mn_sq, None

    def decode_nonanchor(self, idx: int, sym_a, mn_a_sq, ch_ctx, hyper, scale_table):
        anchor_hat = ckbd_anchor_unsqueeze(sym_a.astype(jnp.float32) + mn_a_sq)
        ctx = self.context_prediction(anchor_hat)
        params = self.entropy_parameters(jnp.concatenate([ctx, hyper], -1))
        scales, means = jnp.split(params, 2, axis=-1)
        sc_sq = ckbd_nonanchor_squeeze(scales)
        mn_sq = ckbd_nonanchor_squeeze(means)
        return build_indexes(sc_sq, scale_table), mn_sq, anchor_hat

    def merge_slice(self, anchor_hat, sym_na, mn_na_sq):
        return anchor_hat + ckbd_nonanchor_unsqueeze(
            sym_na.astype(jnp.float32) + mn_na_sq
        )

    def anchor_symbols(self, idx: int, y, mn_sq):
        return _sym16(ckbd_anchor_squeeze(y) - mn_sq)

    def nonanchor_symbols(self, idx: int, y, mn_sq):
        return _sym16(ckbd_nonanchor_squeeze(y) - mn_sq)

    def synthesize(self, y_hat):
        return self.g_s(y_hat)


# -- Cheng2020 with the SERIAL masked-conv AR context -------------------------
#
# The reference keeps the plain (non-checkerboard) Cheng2020 pair in its
# vendored CompressAI (models/waseda.py:22-131) without registering them in
# its model zoo; they are provided here for the same completeness: the Cheng
# GDN-resblock transforms over the JointAutoregressive entropy machinery
# (M == N), driven by JointARCodec for the real pixel-serial bitstream.


class _ChengAttnAnalysis(nn.Module):
    """waseda.py:108-119: g_a with two AttentionBlock gates."""

    N: int

    @nn.compact
    def __call__(self, x):
        n = self.N
        x = ResidualBlockWithStride(n)(x)
        x = ResidualBlock(n)(x)
        x = ResidualBlockWithStride(n)(x)
        x = AttentionBlock(n)(x)
        x = ResidualBlock(n)(x)
        x = ResidualBlockWithStride(n)(x)
        x = ResidualBlock(n)(x)
        x = conv3x3(n, stride=2)(x)
        return AttentionBlock(n)(x)


class _ChengAttnSynthesis(nn.Module):
    """waseda.py:121-131: g_s with two AttentionBlock gates."""

    N: int
    out_ch: int = 3

    @nn.compact
    def __call__(self, x):
        n = self.N
        x = AttentionBlock(n)(x)
        x = ResidualBlock(n)(x)
        x = ResidualBlockUpsample(n)(x)
        x = ResidualBlock(n)(x)
        x = ResidualBlockUpsample(n)(x)
        x = AttentionBlock(n)(x)
        x = ResidualBlock(n)(x)
        x = ResidualBlockUpsample(n)(x)
        x = ResidualBlock(n)(x)
        return SubpelConv3x3(self.out_ch, 2)(x)


class Cheng2020Anchor(JointAutoregressiveHierarchicalPriors):
    """Cheng2020 anchor (reference waseda.py:22-89): Cheng transforms +
    the JointAutoregressive serial context.  Construct with M == N (the
    Cheng family has a single width); in_ch is the reference's ``channel``
    arg.  Real codec: ``JointARCodec(model, variables)``."""

    def _transforms(self):
        return (
            _ChengAnalysis(self.N),
            _ChengSynthesis(self.N, out_ch=self.in_ch),
        )

    def setup(self):
        assert self.M == self.N, "Cheng2020 requires M == N (waseda.py:37)"
        n = self.N
        self.g_a, self.g_s = self._transforms()
        self.h_a = _ChengHyperAnalysis(n)
        self.h_s = _ChengHyperSynthesis(n)
        self.context_prediction = MaskedConv2D(2 * n, 5, "A")
        self.entropy_parameters = nn.Sequential(
            [
                conv1x1(n * 10 // 3), jax.nn.leaky_relu,
                conv1x1(n * 8 // 3), jax.nn.leaky_relu,
                conv1x1(n * 2),
            ]
        )
        self.entropy_bottleneck = EntropyBottleneck(channels=n)


class Cheng2020Attention(Cheng2020Anchor):
    """Cheng2020 attention variant (reference waseda.py:92-131): anchor
    plus AttentionBlock gates in g_a/g_s."""

    def _transforms(self):
        return (
            _ChengAttnAnalysis(self.N),
            _ChengAttnSynthesis(self.N, out_ch=self.in_ch),
        )
