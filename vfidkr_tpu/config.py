"""Explicit configuration — the equivalent of the reference's global argparse
namespace (``my_args.py:13-74``) as side-effect-free dataclasses.

The reference's config module creates directories, truncates log files and
flips cudnn flags at *import* time (``my_args.py:80-124``, called out in
SURVEY.md §1 as a pattern not to replicate).  Here configuration is plain
data; drivers in ``apps/`` own all I/O.

Defaults mirror ``my_args.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

from vfidkr_tpu.training.train_state import TrainConfig  # re-export


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """netName / channels / filter_size / time_step (my_args.py:14-38)."""
    net_name: str = "DAIN"
    channels: int = 3
    filter_size: int = 4
    time_step: float = 0.5
    # TPU-specific: implementation of the core warp op
    filter_impl: str = "block"

    def build(self):
        from vfidkr_tpu.models import build_model
        kwargs = dict(channel=self.channels, filter_size=self.filter_size,
                      timestep=self.time_step, filter_impl=self.filter_impl)
        return build_model(self.net_name, **kwargs)


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """datasetName / datasetPath / batch_size / workers (my_args.py:18-31)."""
    dataset_name: str = "Vimeo_90K_interp"
    dataset_path: str = ""
    batch_size: int = 3
    crop_hw: Tuple[int, int] = (256, 448)
    augment_train: bool = True
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """save_which + padding policy (my_args.py:40; demo_MiddleBury.py:294)."""
    save_which: int = 1            # 0: blended, 1: rectified
    pad_multiple: int = 128
    min_pad: int = 32


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = ModelConfig()
    data: DataConfig = DataConfig()
    train: TrainConfig = TrainConfig()
    eval: EvalConfig = EvalConfig()


__all__ = ["Config", "ModelConfig", "DataConfig", "TrainConfig", "EvalConfig"]
