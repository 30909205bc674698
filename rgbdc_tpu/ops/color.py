"""Color transforms (reference CompressAI/compressai/transforms/functional.py):
RGB <-> YCbCr per ITU-R BT.709 on [0,1] floats, and 444 <-> 420 chroma
resampling. NHWC."""

import jax
import jax.numpy as jnp

_YCBCR_WEIGHTS = (0.2126, 0.7152, 0.0722)  # BT.709


def rgb2ycbcr(rgb: jax.Array) -> jax.Array:
    kr, kg, kb = _YCBCR_WEIGHTS
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = kr * r + kg * g + kb * b
    cb = 0.5 * (b - y) / (1 - kb) + 0.5
    cr = 0.5 * (r - y) / (1 - kr) + 0.5
    return jnp.stack([y, cb, cr], axis=-1)


def ycbcr2rgb(ycbcr: jax.Array) -> jax.Array:
    kr, kg, kb = _YCBCR_WEIGHTS
    y, cb, cr = ycbcr[..., 0], ycbcr[..., 1], ycbcr[..., 2]
    r = y + (2 - 2 * kr) * (cr - 0.5)
    b = y + (2 - 2 * kb) * (cb - 0.5)
    g = (y - kr * r - kb * b) / kg
    return jnp.stack([r, g, b], axis=-1)


def yuv_444_to_420(ycbcr: jax.Array):
    """[B,H,W,3] -> (y [B,H,W,1], cb [B,H/2,W/2,1], cr [...]) via 2x2 avg."""
    y = ycbcr[..., 0:1]

    def down(c):
        b, h, w, _ = c.shape
        return c.reshape(b, h // 2, 2, w // 2, 2, 1).mean(axis=(2, 4))

    return y, down(ycbcr[..., 1:2]), down(ycbcr[..., 2:3])


def yuv_420_to_444(y: jax.Array, cb: jax.Array, cr: jax.Array) -> jax.Array:
    def up(c):
        return jnp.repeat(jnp.repeat(c, 2, axis=1), 2, axis=2)

    return jnp.concatenate([y, up(cb), up(cr)], axis=-1)
