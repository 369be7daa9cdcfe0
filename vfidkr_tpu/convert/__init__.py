from vfidkr_tpu.convert.inverse import invert_dain_state_dict
from vfidkr_tpu.convert.torch_loader import (
    convert_dain_state_dict,
    convert_megadepth,
    convert_mononet_trunk,
    convert_pwcnet,
    convert_resblock,
    convert_s2df,
    load_torch_state_dict,
)

__all__ = [
    "load_torch_state_dict", "convert_pwcnet", "convert_mononet_trunk",
    "convert_s2df", "convert_resblock", "convert_megadepth",
    "convert_dain_state_dict", "invert_dain_state_dict",
]
