"""Rate-distortion losses (reference utils/rd_loss.py).

  - single-modal (:9-37): lambda * 255^2 * MSE + bpp   (or MS-SSIM form)
  - united (:40-129): rgb term + depth term; depth distortion switches from
    MSE to the composite d_loss (0.5*(1 - msssim) + edge-gradient L1 +
    0.1 * L1), scaled by lambda * 255^2 * 0.01, after a warmup step count;
    fractional quality "2.5_2.5" averages adjacent lambda-table entries.
"""

import math

import jax
import jax.numpy as jnp

from ..eval.metrics import ms_ssim

LAMBDAS = (0.0018, 0.0035, 0.0067, 0.013, 0.025, 0.0483, 0.0932, 0.18)


def lambda_from_quality(q) -> float:
    return LAMBDAS[int(q)]


def lambdas_from_fraction_q(quality: str) -> tuple[float, float]:
    """'r_d' pair, each possibly fractional: mean of floor/ceil entries."""
    rgb_q, depth_q = quality.split("_")

    def get(qs):
        q = float(qs)
        return (LAMBDAS[math.ceil(q)] + LAMBDAS[math.floor(q)]) / 2

    return get(rgb_q), get(depth_q)


def _bpp(likelihoods: dict, num_pixels) -> jax.Array:
    total = 0.0
    for lik in likelihoods.values():
        total += jnp.sum(jnp.log(lik)) / (-math.log(2) * num_pixels)
    return total


def rate_distortion_loss_single(output, target, lmbda: float, metric: str = "mse"):
    """output: {'x_hat', 'likelihoods'}; target: [B,H,W,C] in [0,1]."""
    b, h, w, _ = target.shape
    num_pixels = b * h * w
    out = {"bpp_loss": _bpp(output["likelihoods"], num_pixels)}
    if metric == "mse":
        out["mse_loss"] = jnp.mean(jnp.square(output["x_hat"] - target))
        out["loss"] = lmbda * 255**2 * out["mse_loss"] + out["bpp_loss"]
    elif metric == "ms-ssim":
        out["ms_ssim_loss"] = 1.0 - ms_ssim(output["x_hat"], target)
        out["loss"] = lmbda * out["ms_ssim_loss"] + out["bpp_loss"]
    else:
        raise ValueError(metric)
    return out


def _gradient_edge_loss(d, depth):
    """L1 on horizontal+vertical forward differences (rd_loss.py:84-101)."""
    dx_out = jnp.abs(d[:, :, 1:, :] - d[:, :, :-1, :])
    dx_tgt = jnp.abs(depth[:, :, 1:, :] - depth[:, :, :-1, :])
    dy_out = jnp.abs(d[:, 1:, :, :] - d[:, :-1, :, :])
    dy_tgt = jnp.abs(depth[:, 1:, :, :] - depth[:, :-1, :, :])
    # mean over the same H*W grid the reference uses (zeros on last row/col)
    n = d.shape[0] * d.shape[1] * d.shape[2] * d.shape[3]
    return (
        jnp.sum(jnp.abs(dx_out - dx_tgt)) + jnp.sum(jnp.abs(dy_out - dy_tgt))
    ) / n


def depth_composite_loss(d, depth):
    """The reference's d_loss (rd_loss.py:79-104)."""
    l1 = jnp.mean(jnp.abs(d - depth))
    edge = _gradient_edge_loss(d, depth)
    ssim_term = jnp.clip((1.0 - ms_ssim(d, depth)) * 0.5, 0.0, 1.0)
    return ssim_term + edge + 0.1 * l1


def rate_distortion_loss_united(
    output,
    rgb,
    depth,
    rgb_lmbda: float,
    depth_lmbda: float,
    use_depth_composite: bool = False,
):
    """output: {'x_hat': {'r','d'}, 'r_likelihoods', 'd_likelihoods'}."""
    b, h, w, _ = rgb.shape
    num_pixels = b * h * w
    loss = {}
    r = output["x_hat"]["r"]
    loss["r_bpp_loss"] = _bpp(output["r_likelihoods"], num_pixels)
    loss["r_mse_loss"] = jnp.mean(jnp.square(r - rgb))
    loss["rgb_loss"] = rgb_lmbda * 255**2 * loss["r_mse_loss"] + loss["r_bpp_loss"]

    d = output["x_hat"]["d"]
    loss["d_bpp_loss"] = _bpp(output["d_likelihoods"], num_pixels)
    if use_depth_composite:
        loss["d_loss"] = depth_composite_loss(d, depth)
        loss["depth_loss"] = (
            depth_lmbda * 255**2 * 0.01 * loss["d_loss"] + loss["d_bpp_loss"]
        )
        loss["d_mse_loss"] = loss["d_loss"]
    else:
        loss["d_mse_loss"] = jnp.mean(jnp.square(d - depth))
        loss["depth_loss"] = (
            depth_lmbda * 255**2 * loss["d_mse_loss"] + loss["d_bpp_loss"]
        )
    loss["loss"] = loss["rgb_loss"] + loss["depth_loss"]
    return loss
