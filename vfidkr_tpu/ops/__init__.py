"""TPU-native op library — JAX/Pallas equivalents of the reference's nine
hand-written CUDA extensions (``my_package/*`` and the PWC-Net correlation
package).  All ops are pure functions over NHWC arrays, vmap/jit/shard_map
compatible, with reference-exact forward and backward semantics.
"""

from vfidkr_tpu.ops.filter_interpolation import (
    filter_interpolate,
    filter_interpolate_deformable,
    filter_interpolate_nofilter_deformable,
)
from vfidkr_tpu.ops.flow_projection import (
    depth_flow_project,
    fill_holes,
    flow_project,
    min_depth_flow_project,
)
from vfidkr_tpu.ops.warp import interpolate_bilinear, pwc_warp
from vfidkr_tpu.ops.correlation import correlation_cost_volume
from vfidkr_tpu.ops.separable_conv import separable_conv, separable_conv_flow

__all__ = [
    "filter_interpolate",
    "filter_interpolate_deformable",
    "filter_interpolate_nofilter_deformable",
    "flow_project",
    "depth_flow_project",
    "min_depth_flow_project",
    "fill_holes",
    "interpolate_bilinear",
    "pwc_warp",
    "correlation_cost_volume",
    "separable_conv",
    "separable_conv_flow",
]
