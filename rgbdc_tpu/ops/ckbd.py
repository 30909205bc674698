"""Checkerboard two-phase spatial factorization, NHWC layout.

The entropy models code each latent in two dense passes:

  anchor positions     (i+j odd):   0 1 0 1     coded first, from hyper/channel ctx
  non-anchor positions (i+j even):  1 0 1 0     coded second, sees anchors via a 5x5 conv

Semantics mirror the reference's ``utils/ckbd.py:6-80`` (same anchor parity),
but instead of masked scatter-assignments every op here is a dense reshape /
select that XLA fuses for free.  The *_squeeze ops pack [B,H,W,C] into a dense
[B,H,W/2,C] layout (even output rows hold the odd input columns, odd output
rows hold the even input columns — identical packing to the reference) so the
entropy-coder stages always run on dense tensors with no wasted lanes.
"""

import jax
import jax.numpy as jnp


def anchor_mask(h: int, w: int, dtype=jnp.bool_) -> jax.Array:
    """[H, W, 1] mask, True at anchor positions ((i + j) odd)."""
    ii = jnp.arange(h)[:, None]
    jj = jnp.arange(w)[None, :]
    return (((ii + jj) % 2) == 1)[..., None].astype(dtype)


def ckbd_anchor(y: jax.Array) -> jax.Array:
    """Zero out non-anchor positions. y: [B, H, W, C]."""
    m = anchor_mask(y.shape[1], y.shape[2])
    return jnp.where(m, y, jnp.zeros_like(y))


def ckbd_nonanchor(y: jax.Array) -> jax.Array:
    """Zero out anchor positions. y: [B, H, W, C]."""
    m = anchor_mask(y.shape[1], y.shape[2])
    return jnp.where(m, jnp.zeros_like(y), y)


def ckbd_split(y: jax.Array):
    return ckbd_anchor(y), ckbd_nonanchor(y)


def ckbd_merge(anchor: jax.Array, nonanchor: jax.Array) -> jax.Array:
    return anchor + nonanchor


def _squeeze(y: jax.Array, even_col_offset: int) -> jax.Array:
    """Pack [B,H,W,C] -> [B,H,W//2,C]: even rows take cols offset::2,
    odd rows take cols (1-offset)::2."""
    b, h, w, c = y.shape
    even_rows = y[:, 0::2, even_col_offset::2, :]
    odd_rows = y[:, 1::2, (1 - even_col_offset)::2, :]
    out = jnp.stack([even_rows, odd_rows], axis=2)  # [B, H//2, 2, W//2, C]
    return out.reshape(b, h, w // 2, c)


def _unsqueeze(y: jax.Array, even_col_offset: int) -> jax.Array:
    """Inverse of _squeeze: [B,H,W,C] -> [B,H,2W,C] with zeros interleaved."""
    b, h, w, c = y.shape
    rows = y.reshape(b, h // 2, 2, w, c)
    even_rows, odd_rows = rows[:, :, 0], rows[:, :, 1]  # [B, H//2, W, C]
    zeros = jnp.zeros_like(even_rows)
    if even_col_offset == 1:
        even_full = jnp.stack([zeros, even_rows], axis=3)  # cols: 0, val
        odd_full = jnp.stack([odd_rows, zeros], axis=3)  # cols: val, 0
    else:
        even_full = jnp.stack([even_rows, zeros], axis=3)
        odd_full = jnp.stack([zeros, odd_rows], axis=3)
    even_full = even_full.reshape(b, h // 2, 2 * w, c)
    odd_full = odd_full.reshape(b, h // 2, 2 * w, c)
    out = jnp.stack([even_full, odd_full], axis=2)  # [B, H//2, 2, 2W, C]
    return out.reshape(b, h, 2 * w, c)


def ckbd_anchor_squeeze(y: jax.Array) -> jax.Array:
    """Dense-pack the anchor half: even rows keep odd cols, odd rows even cols."""
    return _squeeze(y, even_col_offset=1)


def ckbd_nonanchor_squeeze(y: jax.Array) -> jax.Array:
    """Dense-pack the non-anchor half: even rows keep even cols, odd rows odd cols."""
    return _squeeze(y, even_col_offset=0)


def ckbd_anchor_unsqueeze(y: jax.Array) -> jax.Array:
    return _unsqueeze(y, even_col_offset=1)


def ckbd_nonanchor_unsqueeze(y: jax.Array) -> jax.Array:
    return _unsqueeze(y, even_col_offset=0)
