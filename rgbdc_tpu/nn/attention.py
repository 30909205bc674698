"""Cross-modal prior-transfer blocks (the paper's Bi-CPT) and gates.

Spec from reference modules/transform/attention.py:
  - SEBlock (:52-67): global-avg-pool channel gate, reduction 16, no biases
  - ESA (:70-97): enhanced spatial attention — 1x1 reduce to N/4, stride-2
    conv + 7x3 maxpool funnel, two 3x3 convs, bilinear upsample back, skip
    from the reduced features, 1x1 expand, sigmoid mask on the input
  - BiSPF / BiSPFSingle (:14-48): each modality 3x3-conv'd to N/2 + ReLU,
    concat pairs (self-first), ESA gate per direction; Single emits only the
    RGB->depth direction
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import conv1x1


class SEBlock(nn.Module):
    features: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        c = self.features
        y = jnp.mean(x, axis=(1, 2))  # [B, C]
        y = nn.Dense(c // self.reduction, use_bias=False)(y)
        y = jax.nn.relu(y)
        y = nn.Dense(c, use_bias=False)(y)
        y = jax.nn.sigmoid(y)
        return x * y[:, None, None, :]


def _bilinear_resize(x: jax.Array, h: int, w: int) -> jax.Array:
    """align_corners=False bilinear resize (matches F.interpolate default)."""
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), method="bilinear")


class ESA(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        f = self.features // 4
        b, h, w, _ = x.shape
        c1_ = conv1x1(f)(x)
        # shrink: stride-2 valid conv then 7x7/3 maxpool
        c1 = nn.Conv(f, (3, 3), strides=(2, 2), padding="VALID")(c1_)
        v = nn.max_pool(c1, (7, 7), strides=(3, 3))
        v = jax.nn.relu(nn.Conv(f, (3, 3), padding="SAME")(v))
        c3 = jax.nn.relu(nn.Conv(f, (3, 3), padding="SAME")(v))
        c3 = nn.Conv(f, (3, 3), padding="SAME")(c3)
        c3 = _bilinear_resize(c3, h, w)
        cf = conv1x1(f)(c1_)
        mask = jax.nn.sigmoid(conv1x1(self.features)(c3 + cf))
        return x * mask


class BiSPFSingle(nn.Module):
    """One-way spatial prior fusion: RGB guides depth only."""

    features: int

    def setup(self):
        n = self.features
        self.r_ext = nn.Conv(n // 2, (3, 3), padding="SAME")
        self.d_ext = nn.Conv(n // 2, (3, 3), padding="SAME")
        self.d_esa = ESA(n)

    def __call__(self, rgb, depth):
        r = jax.nn.relu(self.r_ext(rgb))
        d = jax.nn.relu(self.d_ext(depth))
        return self.d_esa(jnp.concatenate([d, r], axis=-1))


class BiSPF(nn.Module):
    """Bi-directional spatial prior fusion (Bi-CPT block)."""

    features: int

    def setup(self):
        n = self.features
        self.r_ext = nn.Conv(n // 2, (3, 3), padding="SAME")
        self.d_ext = nn.Conv(n // 2, (3, 3), padding="SAME")
        self.r_esa = ESA(n)
        self.d_esa = ESA(n)

    def __call__(self, rgb, depth):
        r = jax.nn.relu(self.r_ext(rgb))
        d = jax.nn.relu(self.d_ext(depth))
        r_out = self.r_esa(jnp.concatenate([r, d], axis=-1))
        d_out = self.d_esa(jnp.concatenate([d, r], axis=-1))
        return r_out, d_out
