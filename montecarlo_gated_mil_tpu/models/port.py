"""Weight porting: torch/torchvision state_dicts -> flax parameter pytrees.

The reference initializes its backbone from torchvision ImageNet weights
(``/root/reference/model.py:41-50``).  This environment has no torchvision,
so porting works from any saved ``state_dict`` (a ``.pth`` file or an
in-memory dict of numpy arrays) whose keys follow torchvision naming
(``conv1.weight``, ``layer1.0.bn2.bias``, ...), optionally under the
reference's ``feature_extractor.`` prefix.

Layout conversions (torch NCHW / (out,in) conventions -> TPU-native):
  Conv2d weight  (O, I, kh, kw) -> (kh, kw, I, O)
  Linear weight  (O, I)         -> (I, O)
  BatchNorm weight/bias         -> MaskedBatchStatsNorm scale/bias (running
  stats, if present, are dropped — the models use batch statistics always,
  matching the reference's deactivated BN).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

Params = dict[str, Any]

_STAGES = {"r18": (2, 2, 2, 2), "r34": (3, 4, 6, 3), "r50": (3, 4, 6, 3)}
_BOTTLENECK = {"r18": False, "r34": False, "r50": True}


def load_state_dict(path: str) -> dict[str, np.ndarray]:
    """Load a torch ``.pth`` state_dict into numpy arrays (CPU, no grad)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.detach().numpy() for k, v in sd.items() if hasattr(v, "detach")}


def _np(sd: Mapping[str, Any], key: str) -> np.ndarray:
    if key not in sd:
        raise KeyError(f"missing weight {key!r} in state_dict")
    v = sd[key]
    return v if isinstance(v, np.ndarray) else np.asarray(v)


def _conv_w(sd, key) -> np.ndarray:
    return _np(sd, key).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def _linear_w(sd, key) -> np.ndarray:
    return _np(sd, key).T  # (O, I) -> (I, O)


def _bn(sd, prefix) -> Params:
    return {"scale": _np(sd, prefix + ".weight"), "bias": _np(sd, prefix + ".bias")}


def port_backbone(
    sd: Mapping[str, Any], backbone: str = "r18", prefix: str = ""
) -> Params:
    """torchvision ResNet state_dict -> ``ResNetFeatures`` params.

    ``prefix`` strips a leading module path (the reference saves the backbone
    under ``feature_extractor.``).  The classifier ``fc`` weights, if present,
    are ignored (the reference replaces fc with identity, ``model.py:54``).
    """
    if backbone not in _STAGES:
        raise ValueError(f"unknown backbone {backbone!r}")
    p = prefix
    out: Params = {
        "conv1": {"kernel": _conv_w(sd, p + "conv1.weight")},
        "bn1": _bn(sd, p + "bn1"),
    }
    bottleneck = _BOTTLENECK[backbone]
    for stage, blocks in enumerate(_STAGES[backbone], start=1):
        for b in range(blocks):
            tp = f"{p}layer{stage}.{b}."
            blk: Params = {
                "conv1": {"kernel": _conv_w(sd, tp + "conv1.weight")},
                "bn1": _bn(sd, tp + "bn1"),
                "conv2": {"kernel": _conv_w(sd, tp + "conv2.weight")},
                "bn2": _bn(sd, tp + "bn2"),
            }
            if bottleneck:
                blk["conv3"] = {"kernel": _conv_w(sd, tp + "conv3.weight")}
                blk["bn3"] = _bn(sd, tp + "bn3")
            if tp + "downsample.0.weight" in sd:
                blk["downsample_conv"] = {
                    "kernel": _conv_w(sd, tp + "downsample.0.weight")
                }
                blk["downsample_bn"] = _bn(sd, tp + "downsample.1")
            out[f"layer{stage}_{b}"] = blk
    return out


def load_backbone_params(path: str, backbone: str = "r18") -> Params:
    """Load a ``.pth`` state_dict and port just the backbone weights.

    Accepts either bare torchvision keys (``conv1.weight``, ...) or the
    reference's full-model dicts where the backbone lives under
    ``feature_extractor.`` (``/root/reference/model.py:41-54``).
    """
    sd = load_state_dict(path)
    prefix = (
        "feature_extractor."
        if any(k.startswith("feature_extractor.") for k in sd)
        else ""
    )
    return port_backbone(sd, backbone, prefix=prefix)


def port_multihead_gamil(
    sd: Mapping[str, Any],
    backbone: str = "r18",
    num_classes: int = 2,
    shared_attention: bool = True,
) -> Params:
    """Reference ``MultiHeadGatedAttentionMIL`` state_dict -> flax params.

    Key schema per ``/root/reference/model.py:182-203``: shared gates are
    ``attention_V.0.{weight,bias}``; separate gates are per-class ModuleLists
    ``attention_V.{i}.0.*``; attention-weight heads ``attention_weights.{i}.*``
    and bias-free classifiers ``classifiers.{i}.weight``.
    """
    params: Params = {
        "features": port_backbone(sd, backbone, prefix="feature_extractor.")
    }
    if shared_attention:
        params["w_V"] = _linear_w(sd, "attention_V.0.weight")
        params["b_V"] = _np(sd, "attention_V.0.bias")
        params["w_U"] = _linear_w(sd, "attention_U.0.weight")
        params["b_U"] = _np(sd, "attention_U.0.bias")
    else:
        params["w_V"] = np.stack(
            [_linear_w(sd, f"attention_V.{i}.0.weight") for i in range(num_classes)]
        )
        params["b_V"] = np.stack(
            [_np(sd, f"attention_V.{i}.0.bias") for i in range(num_classes)]
        )
        params["w_U"] = np.stack(
            [_linear_w(sd, f"attention_U.{i}.0.weight") for i in range(num_classes)]
        )
        params["b_U"] = np.stack(
            [_np(sd, f"attention_U.{i}.0.bias") for i in range(num_classes)]
        )
    params["w_att"] = np.stack(
        [_linear_w(sd, f"attention_weights.{i}.weight") for i in range(num_classes)]
    )  # (C, D, 1)
    params["b_att"] = np.stack(
        [_np(sd, f"attention_weights.{i}.bias") for i in range(num_classes)]
    )  # (C, 1)
    params["w_cls"] = np.stack(
        [_linear_w(sd, f"classifiers.{i}.weight") for i in range(num_classes)]
    )  # (C, L, 1)
    return {"params": params}


def port_singlehead_gamil(sd: Mapping[str, Any], backbone: str = "r18") -> Params:
    """Reference ``GatedAttentionMIL`` state_dict -> flax params
    (key schema per ``/root/reference/model.py:56-70``)."""
    params: Params = {
        "features": port_backbone(sd, backbone, prefix="feature_extractor.")
    }
    params["w_V"] = _linear_w(sd, "attention_V.0.weight")
    params["b_V"] = _np(sd, "attention_V.0.bias")
    params["w_U"] = _linear_w(sd, "attention_U.0.weight")
    params["b_U"] = _np(sd, "attention_U.0.bias")
    params["w_att"] = _linear_w(sd, "attention_weights.weight")
    params["b_att"] = _np(sd, "attention_weights.bias")
    params["w_cls"] = _linear_w(sd, "classifier.0.weight")
    params["b_cls"] = _np(sd, "classifier.0.bias")
    return {"params": params}
