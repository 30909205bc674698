"""MLIC++ context modules, NHWC/flax.

Specs from reference modules/transform/context.py and LRP.py:
  - LocalContext (:33-137): 5x5-window masked local attention over the
    anchor plane.  Per center pixel, qkv projections of the 25-neighborhood
    attend under (a) a relative-position bias and (b) a checkerboard mask
    permitting attention only between anchor-parity positions; the window
    output is fused by a dense map (the reference's 5x5 conv over the
    window) to 2C, projected, and passed through a residual MLP.  The
    reference rebuilds the mask per resolution at runtime
    (update_resolution); here shapes are static so the mask is a trace-time
    numpy constant — and windows come from 25 shifted slices instead of
    unfold, which XLA fuses into cheap dynamic-slice reads.
  - ChannelContext (:140-160): 3x conv3 GELU funnel -> 4*slice_ch.
  - LinearGlobalIntraContext (:163-213): anchor -> nonanchor global
    linearized attention (softmax over keys spatially and queries
    channel-wise), with the checkerboard squeeze/unsqueeze dance.
  - LinearGlobalInterContext (:216-262): slice-history global linearized
    attention, reprojection + gated MLP + 1x1 skip.
  - LatentResidualPrediction (LRP.py:9-26): 4x conv3 funnel + 0.5*tanh.
"""

from __future__ import annotations

import flax.linen as nn
import jax

from ..ops.math import exact_gelu
from .layers import conv1x1
import jax.numpy as jnp
import numpy as np

from ..ops.ckbd import (
    anchor_mask,
    ckbd_anchor,
    ckbd_anchor_squeeze,
    ckbd_anchor_unsqueeze,
    ckbd_nonanchor,
    ckbd_nonanchor_squeeze,
    ckbd_nonanchor_unsqueeze,
)


def _extract_windows(x: jax.Array, k: int = 5) -> jax.Array:
    """[B,H,W,C] -> [B,H,W,k*k,C] zero-padded neighborhoods."""
    p = k // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    h, w = x.shape[1], x.shape[2]
    shifts = [
        xp[:, di : di + h, dj : dj + w, :] for di in range(k) for dj in range(k)
    ]
    return jnp.stack(shifts, axis=3)


def _window_parity_mask(h: int, w: int, k: int = 5) -> np.ndarray:
    """[H, W, k*k] 1.0 where the window element is an anchor (zero-padded
    borders count as non-anchor, matching the reference's zero unfold)."""
    p = k // 2
    full = np.zeros((h + 2 * p, w + 2 * p), np.float32)
    ii = np.arange(h)[:, None] + p
    jj = np.arange(w)[None, :] + p
    base = np.indices((h + 2 * p, w + 2 * p)).sum(0) % 2
    # interior anchor parity: (i+j) odd in UNPADDED coords -> (i+j) even in
    # padded coords shifted by 2p (even), so parity is preserved
    full[p:-p, p:-p] = (base[p:-p, p:-p] == 1).astype(np.float32)
    out = np.zeros((h, w, k * k), np.float32)
    for a, (di, dj) in enumerate((di, dj) for di in range(k) for dj in range(k)):
        out[:, :, a] = full[di : di + h, dj : dj + w]
    return out


class LocalContext(nn.Module):
    dim: int  # slice_ch
    window: int = 5
    num_heads: int = 2
    mlp_ratio: float = 2.0

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        k = self.window
        n = k * k
        heads = self.num_heads
        head_dim = c // heads
        scale = head_dim**-0.5
        p = k // 2

        xn = nn.LayerNorm()(x)
        qkv = nn.Dense(3 * c)(xn)  # [B,H,W,3C]
        q, kk, v = jnp.split(qkv, 3, axis=-1)

        # Spatial-minor (channel-first) layout: every large tensor from here
        # on keeps the H*W axis minor so TPU (8,128) tiling pads ~1.3x.  The
        # previous [B,H,W,heads,n,n]/[...,n,heads,d] 6-D layout put the tiny
        # (25,25)/(2,16) dims in the tiled minors — up to 128x padding, the
        # round-4 batch-32 OOM and the MLIC serving floor (docs/PERF.md).
        def cf_windows(t):
            # [B,H,W,C] -> [B,heads,d,n,H*W] zero-padded 25-neighborhoods
            tc = t.reshape(b, h, w, heads, head_dim).transpose(0, 3, 4, 1, 2)
            tp = jnp.pad(tc, ((0, 0), (0, 0), (0, 0), (p, p), (p, p)))
            sh = [
                tp[..., di : di + h, dj : dj + w]
                for di in range(k)
                for dj in range(k)
            ]
            return jnp.stack(sh, axis=3).reshape(b, heads, head_dim, n, h * w)

        qw = cf_windows(q * scale)
        kw = cf_windows(kk)
        vw = cf_windows(v)

        # attn[b,m,i,j,l] = sum_d q[b,m,d,i,l] * k[b,m,d,j,l] — an explicit
        # broadcast-multiply-reduce (VPU), NOT an einsum: dot_general would
        # make the spatial axis a batch dim and tile n x n matmuls on the MXU
        # with 5x+ padding.
        attn = jnp.sum(
            qw[:, :, :, :, None, :] * kw[:, :, :, None, :, :],
            axis=2,
            dtype=jnp.float32,
        )  # [B,heads,n,n,HW]

        table = self.param(
            "relative_position_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * k - 1) ** 2, heads),
        )
        from .swin import _relative_position_index

        rel_idx = jnp.asarray(_relative_position_index(k).reshape(-1))
        bias = table[rel_idx].reshape(n, n, heads).transpose(2, 0, 1)
        attn = attn + bias[:, :, :, None]

        par = _window_parity_mask(h, w, k).reshape(h * w, n)  # [HW,n]
        pair = par[:, :, None] * par[:, None, :]  # [HW,n,n]
        mask = (
            np.where(pair == 1.0, 0.0, -100.0)
            .astype(np.float32)
            .transpose(1, 2, 0)  # [n,n,HW]
        )
        attn = attn + jnp.asarray(mask)[None, None]

        attn = jax.nn.softmax(attn, axis=3)
        # out[b,m,d,i,l] = sum_j attn[b,m,i,j,l] * v[b,m,d,j,l]
        out = jnp.sum(
            attn[:, :, None, :, :, :] * vw[:, :, :, None, :, :],
            axis=4,
            dtype=jnp.float32,
        )  # [B,heads,d,n,HW]
        # flatten order (n, heads, d) matches the feature-minor reference
        out = out.transpose(0, 4, 3, 1, 2).reshape(b, h, w, n * c)
        # dense fusion over the window (== the reference's valid 5x5 conv)
        out = nn.Dense(2 * c)(out)
        out = nn.Dense(2 * c)(out)  # proj
        res = nn.LayerNorm()(out)
        res = nn.Dense(int(2 * c * self.mlp_ratio))(res)
        res = exact_gelu(res)
        res = nn.Dense(2 * c)(res)
        return out + res


class ChannelContextMLIC(nn.Module):
    out_dim: int  # slice_ch; output is 4*slice_ch

    @nn.compact
    def __call__(self, x):
        x = exact_gelu(nn.Conv(192, (3, 3), padding="SAME")(x))
        x = exact_gelu(nn.Conv(128, (3, 3), padding="SAME")(x))
        return nn.Conv(self.out_dim * 4, (3, 3), padding="SAME")(x)


class _QKVConv(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        x = conv1x1(self.dim)(x)
        return nn.Conv(
            self.dim, (3, 3), padding="SAME", feature_group_count=self.dim
        )(x)


def _linear_attention(queries, keys, values, num_heads, dim):
    """softmax(K over space) / softmax(Q over channels) linearized attention.
    All inputs [B, L, dim] with channels last flattened spatially."""
    head_dim = dim // num_heads
    outs = []
    for i in range(num_heads):
        sl = slice(i * head_dim, (i + 1) * head_dim)
        k = jax.nn.softmax(keys[..., sl], axis=1)  # over positions
        q = jax.nn.softmax(queries[..., sl], axis=2)  # over channels
        v = values[..., sl]
        context = jnp.einsum("blc,bld->bcd", k, v, preferred_element_type=jnp.float32)
        outs.append(
            jnp.einsum("bcd,blc->bld", context, q, preferred_element_type=jnp.float32)
        )
    return jnp.concatenate(outs, axis=-1)


class LinearGlobalInterContext(nn.Module):
    dim: int  # slice_ch * i
    out_dim: int  # slice_ch * 2
    num_heads: int

    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        q = _QKVConv(self.dim)(x).reshape(b, h * w, self.dim)
        k = _QKVConv(self.dim)(x).reshape(b, h * w, self.dim)
        v = _QKVConv(self.dim)(x).reshape(b, h * w, self.dim)
        agg = _linear_attention(q, k, v, self.num_heads, self.dim)
        agg = agg.reshape(b, h, w, self.dim)
        attn = nn.Conv(self.out_dim * 3 // 2, (5, 5), padding="SAME")(agg)
        mlp = conv1x1(self.out_dim * 2)(attn)
        mlp = exact_gelu(mlp)
        mlp = nn.Conv(
            self.out_dim * 2, (3, 3), padding="SAME",
            feature_group_count=self.out_dim * 2,
        )(mlp)
        mlp = exact_gelu(mlp)
        mlp = conv1x1(self.out_dim)(mlp)
        skip = conv1x1(self.out_dim)(attn)
        return skip + mlp


class LinearGlobalIntraContext(nn.Module):
    """Anchor positions of the previous slice attend into the current
    anchor; output conditions the nonanchor pass."""

    dim: int  # slice_ch
    num_heads: int = 2

    @nn.compact
    def __call__(self, x1, x2):
        b, h, w, c = x1.shape
        half = h * w // 2
        x1_anchor = ckbd_anchor(x1)
        x1_nonanchor = ckbd_nonanchor(x1)
        queries = ckbd_nonanchor_squeeze(_QKVConv(self.dim)(x1_nonanchor))
        keys = ckbd_anchor_squeeze(_QKVConv(self.dim)(x1_anchor))
        values = ckbd_anchor_squeeze(_QKVConv(self.dim)(x2))

        head_dim = self.dim // self.num_heads
        outs = []
        for i in range(self.num_heads):
            sl = slice(i * head_dim, (i + 1) * head_dim)
            k = jax.nn.softmax(keys[..., sl].reshape(b, half, head_dim), axis=1)
            q = jax.nn.softmax(queries[..., sl].reshape(b, half, head_dim), axis=2)
            v = values[..., sl].reshape(b, half, head_dim)
            # unsqueeze back to the full grid (zeros at the opposite parity)
            k = ckbd_anchor_unsqueeze(k.reshape(b, h, w // 2, head_dim)).reshape(
                b, h * w, head_dim
            )
            v = ckbd_anchor_unsqueeze(v.reshape(b, h, w // 2, head_dim)).reshape(
                b, h * w, head_dim
            )
            q = ckbd_nonanchor_unsqueeze(q.reshape(b, h, w // 2, head_dim)).reshape(
                b, h * w, head_dim
            )
            context = jnp.einsum(
                "blc,bld->bcd", k, v, preferred_element_type=jnp.float32
            )
            outs.append(
                jnp.einsum(
                    "bcd,blc->bld", context, q, preferred_element_type=jnp.float32
                )
            )
        agg = jnp.concatenate(outs, axis=-1).reshape(b, h, w, self.dim)
        attn = nn.Conv(self.dim * 2, (5, 5), padding="SAME")(agg)
        mlp = conv1x1(self.dim * 4)(attn)
        mlp = exact_gelu(mlp)
        mlp = nn.Conv(
            self.dim * 4, (3, 3), padding="SAME", feature_group_count=self.dim * 4
        )(mlp)
        mlp = exact_gelu(mlp)
        mlp = conv1x1(self.dim * 2)(mlp)
        return attn + mlp


class LatentResidualPrediction(nn.Module):
    out_dim: int

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        diff = abs(in_dim - self.out_dim)
        for ch in (in_dim - diff // 4, in_dim - diff // 2, in_dim - diff * 3 // 4):
            x = nn.Conv(ch, (3, 3), padding="SAME")(x)
            x = exact_gelu(x)
        x = nn.Conv(self.out_dim, (3, 3), padding="SAME")(x)
        return 0.5 * jnp.tanh(x)
