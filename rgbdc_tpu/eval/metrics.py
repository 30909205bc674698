"""Quality metrics in JAX: PSNR and multi-scale SSIM, NHWC.

MS-SSIM follows Wang et al. 2003 (the formulation pytorch_msssim implements,
which the reference uses for both loss and eval — utils/rd_loss.py:7,34,102
and utils/metrics.py:8-16): 11-tap gaussian window (sigma 1.5), 5 scales with
weights [0.0448, 0.2856, 0.3001, 0.2363, 0.1333], 2x avg-pool between scales,
product of contrast-structure terms with luminance at the coarsest scale.
"""

import jax
import jax.numpy as jnp
import numpy as np

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def psnr(a: jax.Array, b: jax.Array, data_range: float = 1.0) -> jax.Array:
    """PSNR on clamped [0, data_range] images (any shape, mean over all)."""
    a = jnp.clip(a, 0.0, data_range)
    b = jnp.clip(b, 0.0, data_range)
    mse = jnp.mean(jnp.square(a - b))
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(-0.5 * ((np.arange(size) - (size - 1) / 2.0) / sigma) ** 2)
    return (g / g.sum()).astype(np.float32)


def _filter2d_sep(x: jax.Array, k1d: jax.Array) -> jax.Array:
    """Separable depthwise valid-conv with the gaussian window. x: NHWC.

    precision=HIGHEST: on TPU the default conv precision is bf16, which is
    enough noise in the E[x^2]-mu^2 variance estimates to push the cs ratio
    above 1 (observed ms-ssim 1.09 on-chip) — metrics must be exact f32."""
    c = x.shape[-1]
    kh = jnp.tile(k1d.reshape(-1, 1, 1, 1), (1, 1, 1, c))  # [K,1,1,C]
    kw = jnp.tile(k1d.reshape(1, -1, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )
    return x


def _ssim_terms(x, y, k1d, data_range, k1=0.01, k2=0.03):
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu_x = _filter2d_sep(x, k1d)
    mu_y = _filter2d_sep(y, k1d)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_xx = _filter2d_sep(x * x, k1d) - mu_xx
    sigma_yy = _filter2d_sep(y * y, k1d) - mu_yy
    sigma_xy = _filter2d_sep(x * y, k1d) - mu_xy
    cs = (2 * sigma_xy + c2) / (sigma_xx + sigma_yy + c2)
    luminance = (2 * mu_xy + c1) / (mu_xx + mu_yy + c1)
    return luminance, cs


def ssim(x: jax.Array, y: jax.Array, data_range: float = 1.0) -> jax.Array:
    k1d = jnp.asarray(_gaussian_kernel())
    luminance, cs = _ssim_terms(x, y, k1d, data_range)
    return jnp.mean(luminance * cs)


def ms_ssim(x: jax.Array, y: jax.Array, data_range: float = 1.0) -> jax.Array:
    """Multi-scale SSIM; x, y: [B,H,W,C] with H,W >= 176 for 5 scales
    (same constraint as pytorch_msssim).

    Reduction order matches pytorch_msssim (the reference's implementation
    for both loss and eval): per-scale terms are averaged over SPATIAL dims
    only, the weighted cross-scale product is taken per (image, channel),
    and the batch/channel mean comes last."""
    k1d = jnp.asarray(_gaussian_kernel())
    weights = jnp.asarray(_MSSSIM_WEIGHTS)
    cs_vals = []  # each [B, C]
    lum = None
    for i in range(len(_MSSSIM_WEIGHTS)):
        luminance, cs = _ssim_terms(x, y, k1d, data_range)
        cs_vals.append(jnp.mean(jax.nn.relu(cs), axis=(1, 2)))
        lum = jnp.mean(jax.nn.relu(luminance * cs), axis=(1, 2))
        if i < len(_MSSSIM_WEIGHTS) - 1:
            x = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) / 4.0
            y = jax.lax.reduce_window(
                y, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) / 4.0
    terms = jnp.stack(cs_vals[:-1] + [lum])  # [scales, B, C]
    return jnp.mean(jnp.prod(terms ** weights[:, None, None], axis=0))


def compute_metrics(a: jax.Array, b: jax.Array, data_range: float = 1.0):
    """(PSNR, MS-SSIM) on clamped images (reference utils/metrics.py:8-16)."""
    a = jnp.clip(a, 0, data_range)
    b = jnp.clip(b, 0, data_range)
    return float(psnr(a, b, data_range)), float(ms_ssim(a, b, data_range))


class AverageMeter:
    """Running average (reference utils/metrics.py:17-31)."""

    def __init__(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)
