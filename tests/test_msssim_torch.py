"""MS-SSIM numerical cross-validation against a faithful torch port of
pytorch_msssim — the implementation the reference uses for both the united
training loss and all reported quality numbers (reference
utils/metrics.py:5-14, utils/rd_loss.py:6,34,101).

pytorch_msssim is not installed in this image, but torch is; the ~60 lines
below re-derive its exact computation (VGG-free Wang et al. 2003: 11-tap
gaussian window sigma 1.5, valid conv, per-(image,channel) spatial means,
relu'd cs terms, weighted cross-scale product, batch/channel mean last) so
`rgbdc_tpu.eval.metrics.ms_ssim` is pinned to <= 1e-6 of the reference
numerics on random and fixture images, batch > 1, C in {1, 3}.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from rgbdc_tpu.eval.metrics import ms_ssim

WEIGHTS = [0.0448, 0.2856, 0.3001, 0.2363, 0.1333]


def _fspecial_gauss_1d(size=11, sigma=1.5):
    coords = torch.arange(size, dtype=torch.float64) - (size - 1) / 2.0
    g = torch.exp(-(coords**2) / (2 * sigma**2))
    return (g / g.sum()).to(torch.float32).reshape(1, 1, 1, size)


def _gaussian_filter(x, win):
    # separable valid conv, groups=C (pytorch_msssim gaussian_filter)
    c = x.shape[1]
    out = F.conv2d(x, win.expand(c, 1, 1, -1), groups=c)
    out = F.conv2d(out, win.transpose(2, 3).expand(c, 1, -1, 1), groups=c)
    return out


def _ssim_torch(x, y, win, data_range=1.0, k=(0.01, 0.03)):
    c1 = (k[0] * data_range) ** 2
    c2 = (k[1] * data_range) ** 2
    mu1 = _gaussian_filter(x, win)
    mu2 = _gaussian_filter(y, win)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _gaussian_filter(x * x, win) - mu1_sq
    sigma2_sq = _gaussian_filter(y * y, win) - mu2_sq
    sigma12 = _gaussian_filter(x * y, win) - mu1_mu2
    cs_map = (2 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
    return ssim_map.flatten(2).mean(-1), cs_map.flatten(2).mean(-1)  # [B,C]


def ms_ssim_torch(x, y, data_range=1.0):
    """pytorch_msssim.ms_ssim with size_average=True (its defaults)."""
    win = _fspecial_gauss_1d()
    levels = len(WEIGHTS)
    mcs = []
    ssim_pc = None
    for i in range(levels):
        ssim_pc, cs = _ssim_torch(x, y, win, data_range)
        if i < levels - 1:
            mcs.append(torch.relu(cs))
            padding = [s % 2 for s in x.shape[2:]]
            x = F.avg_pool2d(x, kernel_size=2, padding=padding)
            y = F.avg_pool2d(y, kernel_size=2, padding=padding)
    ssim_pc = torch.relu(ssim_pc)
    stack = torch.stack(mcs + [ssim_pc], dim=0)  # [levels, B, C]
    w = torch.tensor(WEIGHTS, dtype=stack.dtype).view(-1, 1, 1)
    return (stack**w).prod(dim=0).mean().item()


def _pair(shape, seed, noise):
    rng = np.random.default_rng(seed)
    a = rng.random(shape, dtype=np.float32)
    b = np.clip(a + rng.normal(0, noise, shape).astype(np.float32), 0, 1)
    return a, b


@pytest.mark.parametrize("c", [1, 3])
@pytest.mark.parametrize("noise", [0.02, 0.2])
def test_ms_ssim_matches_pytorch_msssim_random(c, noise):
    a, b = _pair((2, 192, 192, c), seed=c * 7 + 1, noise=noise)
    ours = float(ms_ssim(a, b))
    ref = ms_ssim_torch(
        torch.from_numpy(a).permute(0, 3, 1, 2),
        torch.from_numpy(b).permute(0, 3, 1, 2),
    )
    assert ours == pytest.approx(ref, abs=1e-6)


def test_ms_ssim_matches_on_fixture_images():
    from PIL import Image

    root = "tests/fixtures/rgbd/rgb"
    imgs = [
        np.asarray(Image.open(f"{root}/000{i}.png").convert("RGB"), np.float32)
        / 255.0
        for i in (1, 2)
    ]
    a = np.stack(imgs)
    rng = np.random.default_rng(0)
    b = np.clip(a + rng.normal(0, 0.03, a.shape).astype(np.float32), 0, 1)
    ours = float(ms_ssim(a, b))
    ref = ms_ssim_torch(
        torch.from_numpy(a).permute(0, 3, 1, 2),
        torch.from_numpy(b).permute(0, 3, 1, 2),
    )
    assert ours == pytest.approx(ref, abs=1e-6)


def test_ms_ssim_identity_is_one():
    a = np.random.default_rng(3).random((1, 192, 192, 3), dtype=np.float32)
    assert float(ms_ssim(a, a.copy())) == pytest.approx(1.0, abs=1e-6)
