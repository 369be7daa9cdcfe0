"""Structural converter parity for the nets whose reference module lives in an
unimportable file (networks/DAIN.py pulls in the CUDA extensions): rebuild the
same flattened torch layer lists (get_MonoNet5 / get_OccNet / get_deconvField
per networks/DAIN.py:394-527) in torch here, run them with the reference's
stack/skip logic, and require our flax modules + converter mappings to match.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from vfidkr_tpu.convert.torch_loader import (  # noqa: E402
    convert_branch_head,
    convert_deconv_field,
    convert_mononet_trunk,
    convert_occnet,
)
from vfidkr_tpu.models import BranchHead, DeconvField, MonoNet5, OccNet  # noqa: E402

pytestmark = pytest.mark.parity


def _conv_relu(cin, cout):
    return [tnn.Conv2d(cin, cout, 3, 1, 1), tnn.ReLU()]


def _conv_relu_maxpool(cin, cout):
    return _conv_relu(cin, cout) + [tnn.MaxPool2d((2, 2))]


def _conv_relu_unpool(cin, cout):
    return [tnn.Upsample(scale_factor=2, mode="bilinear"),
            tnn.Conv2d(cin, cout, 3, 1, 1), tnn.ReLU()]


def _mononet5_torch():
    layers = _conv_relu(6, 16)
    for cin, cout in [(16, 32), (32, 64), (64, 128), (128, 256), (256, 512)]:
        layers += _conv_relu_maxpool(cin, cout)
    layers += _conv_relu(512, 512)
    for cin, cout in [(512, 256), (256, 128), (128, 64), (64, 32), (32, 16)]:
        layers += _conv_relu_unpool(cin, cout)
    return tnn.ModuleList(layers)


def _forward_single_path(modulelist, x):
    """Reference forward_singlePath (networks/DAIN.py:314-343)."""
    stack = []
    temp = None
    for k, layer in enumerate(modulelist):
        if k == 0:
            temp = layer(x)
            continue
        if isinstance(layer, (tnn.AvgPool2d, tnn.MaxPool2d)):
            stack.append(temp)
        temp = layer(temp)
        if isinstance(layer, tnn.Upsample):
            temp = temp + stack.pop()
    return temp


def _randomize(mod, seed=0, scale=0.1):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in mod.parameters():
            p.copy_((torch.rand(p.shape, generator=g) - 0.5) * scale)
    return mod


def _state_np(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def test_mononet5_structural_parity(rng):
    ref = _randomize(_mononet5_torch())
    x = rng.rand(1, 6, 64, 96).astype(np.float32)
    with torch.no_grad():
        want = _forward_single_path(ref, torch.from_numpy(x))
    want = want.numpy().transpose(0, 2, 3, 1)

    params = convert_mononet_trunk(_state_np(ref))
    got = MonoNet5().apply({"params": params},
                           jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_branch_head_structural_parity(rng):
    ref = _randomize(tnn.ModuleList(
        [tnn.Conv2d(16, 16, 3, 1, 1), tnn.ReLU(), tnn.Conv2d(16, 16, 3, 1, 1)]))
    x = rng.rand(1, 16, 16, 24).astype(np.float32)
    with torch.no_grad():
        t = torch.from_numpy(x)
        for layer in ref:
            t = layer(t)
    want = t.numpy().transpose(0, 2, 3, 1)
    params = convert_branch_head(_state_np(ref))
    got = BranchHead(16).apply({"params": params},
                               jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def _occnet_torch():
    def basic(cin, cout):
        return [tnn.Conv2d(cin, cout, 3, 1, 1), tnn.ReLU(),
                tnn.Conv2d(cout, cout, 3, 1, 1), tnn.ReLU()]

    def up(ch):
        return [tnn.Upsample(scale_factor=2, mode="bilinear",
                             align_corners=True),
                tnn.Conv2d(ch, ch, 3, 1, 1), tnn.ReLU()]

    layers = basic(6, 32) + [tnn.AvgPool2d(2, 2)]
    layers += basic(32, 64) + [tnn.AvgPool2d(2, 2)]
    layers += basic(64, 128) + [tnn.AvgPool2d(2, 2)]
    layers += basic(128, 256) + [tnn.AvgPool2d(2, 2)]
    layers += basic(256, 512) + [tnn.AvgPool2d(2, 2)]
    layers += basic(512, 512)
    layers += up(512) + basic(512, 256)
    layers += up(256) + basic(256, 128)
    layers += up(128) + basic(128, 64)
    layers += up(64)
    layers += [tnn.Upsample(scale_factor=2, mode="bilinear",
                            align_corners=True),
               tnn.Conv2d(64, 1, 3, 1, 1), tnn.Sigmoid()]
    return tnn.ModuleList(layers)


def _forward_occlusion(modulelist, x):
    """Reference forward_occlusion (networks/DAIN.py:358-391)."""
    saved = {}
    out = x
    for count, layer in enumerate(modulelist):
        out = layer(out)
        if count in (8, 13, 18, 23):
            saved[count] = out
        if count == 31:
            out = out + saved[23]
        if count == 38:
            out = out + saved[18]
        if count == 45:
            out = out + saved[13]
        if count == 52:
            out = out + saved[8]
    return out


def test_occnet_structural_parity(rng):
    ref = _randomize(_occnet_torch())
    x = rng.rand(1, 6, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = _forward_occlusion(ref, torch.from_numpy(x))
    want = want.numpy().transpose(0, 2, 3, 1)

    params = convert_occnet(_state_np(ref))
    got = OccNet().apply({"params": params},
                         jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_deconv_field_structural_parity(rng):
    ref = _randomize(tnn.ModuleList(
        [tnn.Conv2d(3, 64, 3, 1, 1), tnn.ReLU(),
         tnn.Conv2d(64, 128, 3, 1, 1), tnn.ReLU(),
         tnn.Conv2d(128, 32, 3, 1, 1)]))
    x = rng.rand(1, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        t = torch.from_numpy(x)
        for layer in ref:
            t = layer(t)
    want = t.numpy().transpose(0, 2, 3, 1)
    params = convert_deconv_field(_state_np(ref))
    got = DeconvField(32).apply({"params": params},
                                jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
