"""PyTorch checkpoint -> flax pytree converter.

Lets reference-trained weights (``best.pth`` of train.py, ``pwc_net.pth.tar``,
MegaDepth ``best_generalization_net_G.pth``) drive parity tests and inference
in this framework.  Reproduces the reference's loading quirks:

- accepts raw state_dicts or ``{'state_dict': ...}`` wrappers
  (PWCNet/PWCNet.py:559-568);
- strips DataParallel ``module.`` prefixes (MegaDepth/models/HG_model.py:39);
- partial/filtered restore semantics live in
  ``vfidkr_tpu.training.checkpoint.filtered_partial_load``.

Layout notes: torch convs are OIHW -> flax HWIO; torch ConvTranspose2d
weights are (in, out, kh, kw) -> our ConvTranspose stores HWIO with I=in.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch
    data = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(data, dict) and "state_dict" in data:
        data = data["state_dict"]
    out = {}
    for k, v in data.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v.numpy() if hasattr(v, "numpy") else np.asarray(v)
    return out


def conv_w(t: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(t, (2, 3, 1, 0))


def deconv_w(t: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (I,O,kh,kw) -> HWIO with I in third position."""
    return np.transpose(t, (2, 3, 0, 1))


def _sd(sd, prefix):
    """Sub-dict view with prefix stripped."""
    p = prefix + "." if prefix else ""
    return {k[len(p):]: v for k, v in sd.items() if k.startswith(p)}


def _conv_entry(sd, torch_key, bias=True):
    entry = {"kernel": conv_w(sd[f"{torch_key}.weight"])}
    if bias and f"{torch_key}.bias" in sd:
        entry["bias"] = sd[f"{torch_key}.bias"]
    return {"Conv_0": entry}


# ---------------------------------------------------------------------------
# PWC-Net (torch keys: conv1a.0.weight ... per PWCNet.py:53-134)
# ---------------------------------------------------------------------------

def convert_pwcnet(sd: Dict[str, np.ndarray]) -> dict:
    out = {}
    pyramid = [f"conv{l}{s}" for l in range(1, 6) for s in ("a", "aa", "b")]
    pyramid += ["conv6aa", "conv6a", "conv6b"]
    dense = [f"conv{l}_{i}" for l in (2, 3, 4, 5, 6) for i in range(5)]
    dc = [f"dc_conv{i}" for i in range(1, 7)]
    for name in pyramid + dense + dc:
        out[name] = {"conv": _conv_entry(sd, f"{name}.0")}
    for lvl in (2, 3, 4, 5, 6):
        out[f"predict_flow{lvl}"] = {"conv": _conv_entry(sd, f"predict_flow{lvl}")}
        out[f"deconv{lvl}"] = {"deconv": {
            "kernel": deconv_w(sd[f"deconv{lvl}.weight"]),
            "bias": sd[f"deconv{lvl}.bias"]}}
        if lvl > 2:
            out[f"upfeat{lvl}"] = {"deconv": {
                "kernel": deconv_w(sd[f"upfeat{lvl}.weight"]),
                "bias": sd[f"upfeat{lvl}.bias"]}}
    out["dc_conv7"] = {"conv": _conv_entry(sd, "dc_conv7")}
    return out


# ---------------------------------------------------------------------------
# MonoNet5 trunk + heads (flattened ModuleList indices, see
# networks/DAIN.py:394-471 and SURVEY.md §2.2)
# ---------------------------------------------------------------------------

_MONONET_IDX = [(0, "in_conv"), (2, "down1"), (5, "down2"), (8, "down3"),
                (11, "down4"), (14, "down5"), (17, "mid"), (20, "up1"),
                (23, "up2"), (26, "up3"), (29, "up4"), (32, "up5")]


def convert_mononet_trunk(sd: Dict[str, np.ndarray]) -> dict:
    return {name: {"conv": _conv_entry(sd, str(idx))}
            for idx, name in _MONONET_IDX}


def convert_branch_head(sd: Dict[str, np.ndarray]) -> dict:
    return {"conv1": _conv_entry(sd, "0"), "conv2": _conv_entry(sd, "2")}


# ---------------------------------------------------------------------------
# S2DF / rectifier (torch keys: block1.0.weight, block2.conv1.weight, ...)
# ---------------------------------------------------------------------------

def _res_block(sd, name):
    return {"conv1": _conv_entry(sd, f"{name}.conv1"),
            "conv2": _conv_entry(sd, f"{name}.conv2")}


def convert_s2df(sd: Dict[str, np.ndarray], num_blocks: int = 3) -> dict:
    out = {"block1_conv": _conv_entry(sd, "block1.0")}
    for i in range(2, num_blocks + 1):
        out[f"block{i}"] = _res_block(sd, f"block{i}")
    return out


def convert_resblock(sd: Dict[str, np.ndarray], num_blocks: int = 4) -> dict:
    out = {"block1_conv": _conv_entry(sd, "block1.0")}
    for i in range(2, num_blocks + 1):
        out[f"block{i}"] = _res_block(sd, f"block{i}")
    out["block5_conv"] = _conv_entry(sd, "block5.0")
    return out


# ---------------------------------------------------------------------------
# OccNet / DeconvField (flattened indices, networks/DAIN.py:474-527)
# ---------------------------------------------------------------------------

_OCCNET_IDX = [(0, "b1_conv1"), (2, "b1_conv2"), (5, "b2_conv1"), (7, "b2_conv2"),
               (10, "b3_conv1"), (12, "b3_conv2"), (15, "b4_conv1"), (17, "b4_conv2"),
               (20, "b5_conv1"), (22, "b5_conv2"), (25, "b6_conv1"), (27, "b6_conv2"),
               (30, "up1_conv"), (32, "b7_conv1"), (34, "b7_conv2"),
               (37, "up2_conv"), (39, "b8_conv1"), (41, "b8_conv2"),
               (44, "up3_conv"), (46, "b9_conv1"), (48, "b9_conv2"),
               (51, "up4_conv"), (54, "out_conv")]


def convert_occnet(sd: Dict[str, np.ndarray]) -> dict:
    return {name: _conv_entry(sd, str(idx)) for idx, name in _OCCNET_IDX}


def convert_deconv_field(sd: Dict[str, np.ndarray]) -> dict:
    return {"conv1": _conv_entry(sd, "0"), "conv2": _conv_entry(sd, "2"),
            "conv3": _conv_entry(sd, "4")}


# ---------------------------------------------------------------------------
# MegaDepth hourglass: torch nested-Sequential indices ARE the spec traversal
# path ("3.0.1.2.weight" <-> param "n_3_0_1_2"), see megadepth.py.
# ---------------------------------------------------------------------------

def convert_megadepth(sd: Dict[str, np.ndarray]) -> Tuple[dict, dict]:
    """Returns (params, batch_stats)."""
    params: dict = {}
    stats: dict = {}
    for key, val in sd.items():
        *idx, leaf = key.split(".")
        name = "n_" + "_".join(idx)
        if leaf == "weight" and val.ndim == 4:
            params.setdefault(name, {})["kernel"] = conv_w(val)
        elif leaf == "weight":                      # BN affine scale
            params.setdefault(name, {})["scale"] = val
        elif leaf == "bias":                        # conv or BN bias: same key
            params.setdefault(name, {})["bias"] = val
        elif leaf == "running_mean":
            stats.setdefault(name, {})["mean"] = val
        elif leaf == "running_var":
            stats.setdefault(name, {})["var"] = val
        elif leaf == "num_batches_tracked":
            pass
        else:
            raise KeyError(f"unmapped MegaDepth key {key}")
    return params, stats


# ---------------------------------------------------------------------------
# Full DAIN / DAIN_slowmotion checkpoints (train.py state_dicts)
# ---------------------------------------------------------------------------

def convert_dain_state_dict(sd: Dict[str, np.ndarray]) -> dict:
    """Map a reference DAIN(.slowmotion) state_dict onto our variable tree.
    Missing sections are simply absent (use filtered_partial_load)."""
    params: dict = {}
    stats: dict = {}

    def has(prefix):
        return any(k.startswith(prefix + ".") for k in sd)

    if has("initScaleNets_filter"):
        params["filter_net"] = convert_mononet_trunk(_sd(sd, "initScaleNets_filter"))
    if has("initScaleNets_filter1"):
        params["filter_head1"] = convert_branch_head(_sd(sd, "initScaleNets_filter1"))
    if has("initScaleNets_filter2"):
        params["filter_head2"] = convert_branch_head(_sd(sd, "initScaleNets_filter2"))
    if has("flownets"):
        params["flownets"] = convert_pwcnet(_sd(sd, "flownets"))
    if has("rectifyNet"):
        params["rectify_net"] = convert_resblock(_sd(sd, "rectifyNet"))
    if has("ctxNet"):
        params["ctx_net"] = convert_s2df(_sd(sd, "ctxNet"))
    if has("initOcclusion"):
        params["occ_net"] = convert_occnet(_sd(sd, "initOcclusion"))
    if has("initDeconv_field"):
        params["deconv_field"] = convert_deconv_field(_sd(sd, "initDeconv_field"))
    if has("depthNet"):
        dp, ds = convert_megadepth(_sd(sd, "depthNet"))
        params["depth_net"] = dp
        stats["depth_net"] = ds
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out
