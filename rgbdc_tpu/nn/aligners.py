"""Cascade-model components (the "Luguo" master codec, reference
modules/transform/{channelAligner,spatialAligner}.py + models/elic_master.py):

  - FeatureEncoder (elic_master.py:15-31): conv3x3 -> 3 residual blocks with
    a long skip, 64-channel feature space
  - FeatureDecoder (:34-53): 3 residual blocks + 1x1-skip + stride-1 deconv3
  - ChannelAligner (channelAligner.py:5-42): shared conv trunk; beta from
    the master features, gamma from the aux features, both global-avg-pooled
    to per-channel scalars; fv_bar = gamma * aux_f + beta.  beta/gamma are
    the 128-float bitstream side info.
  - SpatialAligner (spatialAligner.py:341-390): patch-embed(2) of x and the
    guide, 2 swin CROSS-attention blocks (q from x, kv from guide, shift on
    the 2nd), deconv recovery.
"""

from __future__ import annotations

import flax.linen as nn
import jax

from ..ops.math import exact_gelu
import jax.numpy as jnp

from .layers import ResidualBlock, conv1x1, conv3x3
from .swin import WindowAttention, _shift_attn_mask, window_partition, window_reverse


class FeatureEncoder(nn.Module):
    out_ch: int = 64

    @nn.compact
    def __call__(self, x):
        x = conv3x3(self.out_ch)(x)
        shortcut = x
        for _ in range(3):
            x = ResidualBlock(self.out_ch)(x)
        return x + shortcut


class FeatureDecoder(nn.Module):
    out_ch: int = 3

    @nn.compact
    def __call__(self, x):
        shortcut = x
        h = ResidualBlock(64)(x)
        h = ResidualBlock(64)(h)
        h = ResidualBlock(64)(h)
        h = h + conv1x1(64)(shortcut)
        return nn.ConvTranspose(self.out_ch, (3, 3), strides=(1, 1), padding="SAME")(h)


class ChannelAligner(nn.Module):
    """Global-pooled affine transfer; returns (fv_bar, beta, gamma)."""

    @nn.compact
    def __call__(self, master_f, aux_f):
        trunk = nn.Sequential(
            [
                conv3x3(256), lambda x: jax.nn.leaky_relu(x, 0.01),
                conv3x3(256), lambda x: jax.nn.leaky_relu(x, 0.01),
                conv3x3(256), lambda x: jax.nn.leaky_relu(x, 0.01),
                conv3x3(256), lambda x: jax.nn.leaky_relu(x, 0.01),
            ]
        )
        beta = jnp.mean(conv3x3(64)(trunk(master_f)), axis=(1, 2), keepdims=True)
        gamma = jnp.mean(conv3x3(64)(trunk(aux_f)), axis=(1, 2), keepdims=True)
        return gamma * aux_f + beta, beta, gamma


class _CrossSwinBlock(nn.Module):
    """Swin block with cross attention: queries from x, keys/values from the
    guide (reference spatialAligner.py:173-338)."""

    dim: int
    num_heads: int
    window: int = 4
    shift: int = 0
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, guide):
        b, h, wid, c = x.shape
        w = self.window
        shortcut = x
        x = nn.LayerNorm()(x)
        g = nn.LayerNorm()(guide)
        if self.shift > 0:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
            g = jnp.roll(g, (-self.shift, -self.shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(h, wid, w, self.shift))
        else:
            mask = None

        xw = window_partition(x, w)
        gw = window_partition(g, w)
        attn = _CrossWindowAttention(self.dim, self.num_heads, w)(xw, gw, mask)
        x = window_reverse(attn, w, h, wid)
        if self.shift > 0:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        x = shortcut + x

        y = nn.LayerNorm()(x)
        y = nn.Dense(int(c * self.mlp_ratio))(y)
        y = exact_gelu(y)
        y = nn.Dense(c)(y)
        return x + y


class _CrossWindowAttention(nn.Module):
    dim: int
    num_heads: int
    window: int

    @nn.compact
    def __call__(self, x, guide, mask=None):
        from .swin import _relative_position_index

        nb, n, c = x.shape
        heads = self.num_heads
        head_dim = c // heads
        scale = head_dim**-0.5
        # spatial-minor layout, same rationale as swin.WindowAttention
        # (round 5): keep the huge window-count axis in the tiled minor
        q = nn.Dense(c)(x).reshape(nb, n, heads, head_dim)
        q = q.transpose(2, 3, 1, 0)  # [heads, d, n, nB]
        kv = nn.Dense(2 * c)(guide).reshape(nb, n, 2, heads, head_dim)
        kv = kv.transpose(2, 3, 4, 1, 0)  # [2, heads, d, n, nB]
        k, v = kv[0], kv[1]
        attn = jnp.sum(
            (q * scale)[:, :, :, None, :] * k[:, :, None, :, :], axis=1,
            dtype=jnp.float32,
        )  # [heads, n, n, nB]
        table = self.param(
            "relative_position_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window - 1) ** 2, heads),
        )
        idx = jnp.asarray(_relative_position_index(self.window).reshape(-1))
        bias = table[idx].reshape(n, n, heads).transpose(2, 0, 1)
        attn = attn + bias[..., None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(heads, n, n, nb // nw, nw)
            attn = attn + jnp.asarray(mask).transpose(1, 2, 0)[:, :, None]
            attn = attn.reshape(heads, n, n, nb)
        attn = jax.nn.softmax(attn, axis=2)
        out = jnp.sum(
            attn[:, None] * v[:, :, None, :, :], axis=3, dtype=jnp.float32
        )  # [heads, d, n, nB]
        out = out.transpose(3, 2, 0, 1).reshape(nb, n, c)
        return nn.Dense(c)(out)


class SpatialAligner(nn.Module):
    out_ch: int = 192
    embed_dim: int = 96
    num_heads: int = 3
    window: int = 4
    patch: int = 2

    @nn.compact
    def __call__(self, x, guide):
        p = self.patch
        ex = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding="VALID")(x)
        eg = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding="VALID")(guide)
        ex = _CrossSwinBlock(self.embed_dim, self.num_heads, self.window, 0)(ex, eg)
        ex = _CrossSwinBlock(
            self.embed_dim, self.num_heads, self.window, self.window // 2
        )(ex, eg)
        return nn.ConvTranspose(self.out_ch, (p, p), strides=(p, p))(ex)
