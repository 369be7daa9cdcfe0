from vfidkr_tpu.utils.metrics import interpolation_error, psnr, ssim
from vfidkr_tpu.utils.meters import AverageMeter
from vfidkr_tpu.utils.padding import pad_to_multiple, unpad

__all__ = ["interpolation_error", "psnr", "ssim", "AverageMeter",
           "pad_to_multiple", "unpad"]
