"""MonoNet5 kernel-prediction U-Net, OccNet and DeconvField — flax re-designs
of ``networks/DAIN.py:394-527``.

MonoNet5 (:394-471): conv_relu(6,16) then five conv_relu_maxpool stages
(16->32->64->128->256->512), a mid conv_relu(512,512), then five
conv_relu_unpool stages back to 16 ch.  The reference runs the flattened layer
list with a push/pop stack (``forward_singlePath``, :314-343): the activation
*before* each MaxPool is pushed, and *added* to the output of each bilinear
x2 Upsample (align_corners=False).  Here that implicit structure is explicit.

Two branch heads conv_relu_conv(16 -> filter_size**2) produce the raw
(un-normalised) per-pixel interpolation kernels for each direction (:465-468).

OccNet (:474-501) and DeconvField (:506-527) are constructed by the reference
but never called in DAIN.forward — their weights exist in reference
checkpoints, so they are provided for checkpoint interop and ablations.
Init for all three: xavier_uniform, zero bias (DAIN._initialize_weights,
:77-98).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from vfidkr_tpu.models.layers import (
    Conv,
    avg_pool_2x2,
    max_pool_2x2,
    upsample_bilinear,
    upsample_bilinear_align_corners,
)
from vfidkr_tpu.models.phasepack import (
    ConvParams,
    ConvReLUParams,
    pack2,
    packed_conv3,
    packed_maxpool,
    packed_upsample2,
    unpack2,
)


class ConvReLU(nn.Module):
    features: int
    kernel_size: int = 3
    padding: int = 1

    @nn.compact
    def __call__(self, x):
        return nn.relu(Conv(self.features, self.kernel_size, 1, self.padding,
                            name="conv")(x))


class MonoNet5(nn.Module):
    """Trunk of the kernel-prediction net. Input (B,H,W,6) with H,W divisible
    by 32; output (B,H,W,16) — or its ``pack2`` form when ``impl='packed'``.

    ``impl``:
      * ``"chained"`` (default): plain convs, the reference evaluation shape.
      * ``"packed"``: the full- and half-resolution stages (16/32/64-channel
        convs whose MXU lane padding wastes up to 8x — see
        models/phasepack.py) run phase-packed; identical parameters, same
        values to f32 rounding.  The trunk is RETURNED packed
        (B, H/2, W/2, 64) so the branch heads can stay packed too; callers
        unpack once after the heads.
    """
    impl: str = "chained"

    @nn.compact
    def __call__(self, x):
        if self.impl == "packed":
            # pack2 needs even H/W (holds for the /32-divisible contract;
            # halo-extended shard blocks could be odd — callers pass
            # impl="chained" there, both paths share the param tree)
            assert x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0, x.shape
            return self._packed(x)
        h = ConvReLU(16, name="in_conv")(x)
        skips = []
        for i, ch in enumerate([32, 64, 128, 256, 512]):
            h = ConvReLU(ch, name=f"down{i + 1}")(h)
            skips.append(h)                       # pushed before the pool
            h = max_pool_2x2(h)
        h = ConvReLU(512, name="mid")(h)
        for i, ch in enumerate([256, 128, 64, 32, 16]):
            h = upsample_bilinear(h, 2) + skips.pop()   # add after Upsample
            h = ConvReLU(ch, name=f"up{i + 1}")(h)
        return h

    def _packed(self, x):
        def pconv(name, ch_in, ch_out, xp):
            k, b = ConvReLUParams(ch_out, ch_in, name=name)()
            return nn.relu(packed_conv3(xp, k, b))

        hp = pconv("in_conv", x.shape[-1], 16, pack2(x))
        skip1 = pconv("down1", 16, 32, hp)            # packed @ full res
        h = packed_maxpool(skip1)                     # unpacked half res
        skip2 = pconv("down2", 32, 64, pack2(h))      # packed @ half res
        h = packed_maxpool(skip2)                     # unpacked quarter res

        skips = []
        for i, ch in enumerate([128, 256, 512]):
            h = ConvReLU(ch, name=f"down{i + 3}")(h)
            skips.append(h)
            h = max_pool_2x2(h)
        h = ConvReLU(512, name="mid")(h)
        for i, ch in enumerate([256, 128, 64]):
            h = upsample_bilinear(h, 2) + skips.pop()
            h = ConvReLU(ch, name=f"up{i + 1}")(h)

        hp = packed_upsample2(h) + skip2              # packed @ half res
        hp = pconv("up4", 64, 32, hp)
        hp = packed_upsample2(unpack2(hp)) + skip1    # packed @ full res
        return pconv("up5", 32, 16, hp)


class BranchHead(nn.Module):
    """conv_relu_conv(16, out) (DAIN.py:577-590): conv(16,16)+ReLU+conv(16,out).

    ``impl='packed'`` consumes/produces ``pack2`` maps (see MonoNet5)."""
    out_features: int = 16
    impl: str = "chained"

    @nn.compact
    def __call__(self, x):
        if self.impl == "packed":
            k1, b1 = ConvParams(16, x.shape[-1] // 4, name="conv1")()
            h = nn.relu(packed_conv3(x, k1, b1))
            k2, b2 = ConvParams(self.out_features, 16, name="conv2")()
            return packed_conv3(h, k2, b2)
        h = nn.relu(Conv(16, 3, 1, 1, name="conv1")(x))
        return Conv(self.out_features, 3, 1, 1, name="conv2")(h)


class OccNet(nn.Module):
    """U-Net with sigmoid 1-ch output (DAIN.py:474-501, forward at :358-391).
    Vestigial in the reference forward; kept for checkpoint/ablation parity."""

    @nn.compact
    def __call__(self, x):
        def basic(h, ch, name):
            h = nn.relu(Conv(ch, 3, 1, 1, name=f"{name}_conv1")(h))
            return nn.relu(Conv(ch, 3, 1, 1, name=f"{name}_conv2")(h))

        skips = []
        h = basic(x, 32, "b1")
        for i, ch in enumerate([64, 128, 256, 512]):
            h = avg_pool_2x2(h)
            h = basic(h, ch, f"b{i + 2}")
            skips.append(h)
        h = avg_pool_2x2(h)
        h = basic(h, 512, "b6")
        # decoder pattern per forward_occlusion (:365-389): Up -> +skip -> Basic
        for i, (up_ch, basic_ch) in enumerate([(512, 256), (256, 128),
                                               (128, 64), (64, None)]):
            h = upsample_bilinear_align_corners(h, 2)
            h = nn.relu(Conv(up_ch, 3, 1, 1, name=f"up{i + 1}_conv")(h))
            h = h + skips.pop()
            if basic_ch is not None:
                h = basic(h, basic_ch, f"b{i + 7}")
        h = upsample_bilinear_align_corners(h, 2)
        h = Conv(1, 3, 1, 1, name="out_conv")(h)
        return nn.sigmoid(h)


class DeconvField(nn.Module):
    """Per-pixel deformable-offset field net (DAIN.py:506-527): three plain
    convs 3->64->128->2*fs*fs; used by the compiled-but-inactive deformable
    FilterInterpolation variants."""
    out_features: int = 32

    @nn.compact
    def __call__(self, x):
        h = nn.relu(Conv(64, 3, 1, 1, name="conv1")(x))
        h = nn.relu(Conv(128, 3, 1, 1, name="conv2")(h))
        return Conv(self.out_features, 3, 1, 1, name="conv3")(h)
