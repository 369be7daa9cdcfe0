"""Model registry — equivalent of ``networks/__init__.py:1-6`` (name-keyed
model lookup) without the reference's import-time CUDA side effects."""

from vfidkr_tpu.models.dain import DAIN, DAINSlowMotion
from vfidkr_tpu.models.megadepth import MegaDepthHourglass
from vfidkr_tpu.models.mononet import BranchHead, DeconvField, MonoNet5, OccNet
from vfidkr_tpu.models.pwcnet import PWCDCNet
from vfidkr_tpu.models.resblock import MultipleBasicBlock, multiple_basic_block_4
from vfidkr_tpu.models.s2df import S2DF, s2df_3dense

MODEL_REGISTRY = {
    "DAIN": DAIN,
    "DAIN_slowmotion": DAINSlowMotion,
}


def build_model(name: str, **kwargs):
    """Mirror of ``networks.__dict__[name](channel, filter_size, timestep,
    training)`` (train.py:29-32)."""
    return MODEL_REGISTRY[name](**kwargs)


__all__ = [
    "DAIN", "DAINSlowMotion", "MegaDepthHourglass", "MonoNet5", "BranchHead",
    "OccNet", "DeconvField", "PWCDCNet", "MultipleBasicBlock",
    "multiple_basic_block_4", "S2DF", "s2df_3dense", "MODEL_REGISTRY",
    "build_model",
]
