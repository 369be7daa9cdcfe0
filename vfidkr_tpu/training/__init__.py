from vfidkr_tpu.training.loss import (
    charbonnier_loss,
    gra_adap_tv_loss,
    motion_sym_loss,
    neg_psnr_loss,
    part_loss,
    psnr_from_diff,
    smooth_loss,
    total_loss,
    tv_loss,
)
from vfidkr_tpu.training.lr_schedule import PlateauState, plateau_init, plateau_step
from vfidkr_tpu.training.train_state import (
    TrainConfig,
    TrainState,
    create_train_state,
    eval_step,
    make_optimizer,
    train_step,
)

__all__ = [
    "charbonnier_loss", "neg_psnr_loss", "tv_loss", "gra_adap_tv_loss",
    "smooth_loss", "motion_sym_loss", "part_loss", "total_loss",
    "psnr_from_diff", "PlateauState", "plateau_init", "plateau_step",
    "TrainConfig", "TrainState", "create_train_state", "train_step",
    "eval_step", "make_optimizer",
]
