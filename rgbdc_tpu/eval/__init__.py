from .metrics import psnr, ms_ssim, compute_metrics, AverageMeter
from .padding import pad_to_multiple, crop_to

__all__ = ["psnr", "ms_ssim", "compute_metrics", "AverageMeter", "pad_to_multiple", "crop_to"]
