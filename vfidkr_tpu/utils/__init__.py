from vfidkr_tpu.utils.compcache import enable_persistent_cache
from vfidkr_tpu.utils.metrics import (interpolation_error, psnr,
                                      psnr_per_image, ssim, ssim_per_image)
from vfidkr_tpu.utils.meters import AverageMeter
from vfidkr_tpu.utils.padding import pad_to_multiple, unpad
from vfidkr_tpu.utils.profiling import Timer, device_time, trace

__all__ = ["interpolation_error", "psnr", "psnr_per_image", "ssim",
           "ssim_per_image", "AverageMeter",
           "pad_to_multiple", "unpad", "Timer", "device_time", "trace",
           "enable_persistent_cache"]
