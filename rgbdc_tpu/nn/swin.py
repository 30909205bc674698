"""Swin transformer stack for the STF codecs, NHWC/flax.

Structural spec from reference models/stf.py:15-405 (Googolxx/STF lineage):
  - PatchEmbed: stride-p conv (+ LayerNorm)
  - SwinBlock: LN -> (cyclic shift) -> windowed MSA with relative position
    bias (+ shift mask) -> residual -> LN -> MLP(GELU) -> residual
  - BasicLayer: alternating shift 0 / w/2 blocks, then PatchMerging (down)
    or PatchSplit (up)
  - PatchMerging: 2x2 space-to-depth -> LN -> Linear 4C->2C (no bias)
  - PatchSplit: LN -> Linear C->2C (no bias) -> depth-to-space(2) => C/2

Everything operates on [B, H, W, C] with static shapes (inputs are x64
padded upstream), so shift masks are built with numpy at trace time and the
whole stack jits into dense batched matmuls on the MXU.  Dropout /
drop-path are omitted (inference + from-scratch training default to 0 in
the reference config path we replicate).
"""

from __future__ import annotations

import flax.linen as nn
import jax

from ..ops.math import exact_gelu
import jax.numpy as jnp
import numpy as np


def window_partition(x: jax.Array, w: int) -> jax.Array:
    """[B,H,W,C] -> [B*nW, w*w, C]"""
    b, h, wid, c = x.shape
    x = x.reshape(b, h // w, w, wid // w, w, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, w * w, c)


def window_reverse(windows: jax.Array, w: int, h: int, wid: int) -> jax.Array:
    """[B*nW, w*w, C] -> [B,H,W,C]"""
    c = windows.shape[-1]
    b = windows.shape[0] // (h // w * (wid // w))
    x = windows.reshape(b, h // w, wid // w, w, w, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, wid, c)


def _relative_position_index(w: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
    coords = coords.reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # [2, w*w, w*w]
    rel = rel.transpose(1, 2, 0) + (w - 1)
    return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).astype(np.int32)


def _shift_attn_mask(h: int, wid: int, w: int, shift: int) -> np.ndarray:
    """[nW, w*w, w*w] additive mask for shifted windows (0 / -100)."""
    img = np.zeros((1, h, wid, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
        for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
            img[:, hs, ws, :] = cnt
            cnt += 1
    win = img.reshape(1, h // w, w, wid // w, w, 1).transpose(0, 1, 3, 2, 4, 5)
    win = win.reshape(-1, w * w)
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x, mask=None):
        """x: [nB, w*w, C]; mask: [nW, w*w, w*w] or None."""
        nb, n, c = x.shape
        heads = self.num_heads
        head_dim = c // heads
        scale = head_dim**-0.5

        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias)(x)
        # Spatial-minor (window-count-minor) attention: [nB, heads, n, n]
        # tensors put the tiny (n, n) = (16, 16) dims in the TPU (8,128)
        # tiled minors — 8x lane padding and thousands of padded micro
        # matmuls (the same failure mode as MLIC's LocalContext, fixed in
        # round 5; docs/PERF.md).  Keep the huge nB axis minor instead and
        # do the contractions as broadcast-multiply-reduces on the VPU.
        qkv = qkv.reshape(nb, n, 3, heads, head_dim).transpose(2, 3, 4, 1, 0)
        q, k, v = qkv[0] * scale, qkv[1], qkv[2]  # [heads, d, n, nB]
        attn = jnp.sum(
            q[:, :, :, None, :] * k[:, :, None, :, :], axis=1,
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


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int = 4
    shift: int = 0
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        """x: [B,H,W,C], H/W divisible by window."""
        b, h, wid, c = x.shape
        w = self.window
        shortcut = x
        x = nn.LayerNorm()(x)
        if self.shift > 0:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(h, wid, w, self.shift))
        else:
            mask = None
        windows = window_partition(x, w)
        attn = WindowAttention(self.dim, self.num_heads, w)(windows, mask)
        x = window_reverse(attn, w, h, wid)
        if self.shift > 0:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        x = shortcut + x

        y = nn.LayerNorm()(x)
        y = nn.Dense(int(c * self.mlp_ratio))(y)
        y = exact_gelu(y)
        y = nn.Dense(c)(y)
        return x + y


class PatchMerging(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        # order matches reference cat([x00, x10, x01, x11]) (stf.py:237-241)
        x = jnp.concatenate(
            [x[:, :, 0, :, 0], x[:, :, 1, :, 0], x[:, :, 0, :, 1], x[:, :, 1, :, 1]],
            axis=-1,
        )
        x = nn.LayerNorm()(x)
        return nn.Dense(2 * self.dim, use_bias=False)(x)


class PatchSplit(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = nn.LayerNorm()(x)
        x = nn.Dense(2 * self.dim, use_bias=False)(x)  # [B,H,W,2C]
        # PixelShuffle(2) on channels-first 2C -> C/2 at 2H x 2W:
        # channel layout [C/2, 2, 2] -> spatial
        x = x.reshape(b, h, w, c // 2, 2, 2)
        x = x.transpose(0, 1, 4, 2, 5, 3)  # B, H, 2, W, 2, C/2
        return x.reshape(b, 2 * h, 2 * w, c // 2)


class PatchEmbed(nn.Module):
    embed_dim: int
    patch_size: int = 2
    use_norm: bool = True

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding="VALID")(x)
        if self.use_norm:
            x = nn.LayerNorm()(x)
        return x


class BasicLayer(nn.Module):
    """depth x SwinBlock (alternating shift) + optional resample."""

    dim: int
    depth: int
    num_heads: int
    window: int = 4
    resample: str | None = None  # None | "merge" | "split"

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth):
            shift = 0 if i % 2 == 0 else self.window // 2
            x = SwinBlock(self.dim, self.num_heads, self.window, shift)(x)
        if self.resample == "merge":
            x = PatchMerging(self.dim)(x)
        elif self.resample == "split":
            x = PatchSplit(self.dim)(x)
        return x
