"""Pad/crop to the codec's x64 stride (reference dataset/utils.py:41-100).

``replicate0`` = bottom/right replicate padding (the reference's default
eval mode); ``constant0`` = zero padding; ``center`` pads symmetrically.
"""

import jax.numpy as jnp


def pad_to_multiple(x, multiple: int = 64, mode: str = "replicate0"):
    """x: [B,H,W,C] -> padded x, original (H, W)."""
    b, h, w, c = x.shape
    ph = (multiple - h % multiple) % multiple
    pw = (multiple - w % multiple) % multiple
    if mode.startswith("replicate"):
        pad_mode = "edge"
    elif mode.startswith("reflect"):
        pad_mode = "reflect"
    else:
        pad_mode = "constant"
    if mode == "center" or mode.endswith("1"):
        top, left = ph // 2, pw // 2
        pads = ((0, 0), (top, ph - top), (left, pw - left), (0, 0))
    else:
        pads = ((0, 0), (0, ph), (0, pw), (0, 0))
    return jnp.pad(x, pads, mode=pad_mode), (h, w)


def crop_to(x, size, mode: str = "replicate0"):
    """Inverse of pad_to_multiple."""
    h, w = size
    if mode == "center" or mode.endswith("1"):
        ph = x.shape[1] - h
        pw = x.shape[2] - w
        top, left = ph // 2, pw // 2
        return x[:, top : top + h, left : left + w, :]
    return x[:, :h, :w, :]
