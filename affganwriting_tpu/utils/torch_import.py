"""Torch state_dict -> flax params conversion with first-conv surgery.

The reference loads torchvision ImageNet checkpoints and rewrites the first
conv to accept the 50-channel style stack: RGB kernels copied, channel-0
kernel tiled across channels 3..49 (GAN_word/modules_tro.py:487-491,
inception.py:41-50).  This module does the same for our flax modules, keyed
on torchvision's standard parameter names.  Weights are read with torch
(CPU) when a local ``.pth`` exists; nothing is downloaded.

Conventions: torch conv weight (O, I, KH, KW) -> flax kernel (KH, KW, I, O);
torch linear weight (O, I) -> flax kernel (I, O); BatchNorm maps
weight/bias -> scale/bias and running_mean/var -> batch_stats mean/var.
"""

from __future__ import annotations

from typing import Any

import numpy as np


def conv_w(t: np.ndarray) -> np.ndarray:
    return np.transpose(t, (2, 3, 1, 0))


def linear_w(t: np.ndarray) -> np.ndarray:
    return np.transpose(t, (1, 0))


def expand_first_conv(weight_oihw: np.ndarray, in_channels: int) -> np.ndarray:
    """(O, 3, KH, KW) -> (O, in_channels, KH, KW): copy RGB, tile channel 0
    (modules_tro.py:487-491)."""
    o, i, kh, kw = weight_oihw.shape
    assert i == 3, f"expected RGB first conv, got {i} channels"
    out = np.zeros((o, in_channels, kh, kw), weight_oihw.dtype)
    out[:, :3] = weight_oihw
    if in_channels > 3:
        out[:, 3:] = np.repeat(
            weight_oihw[:, :1], in_channels - 3, axis=1)
    return out


def load_state_dict(path: str) -> dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k.replace("module.", ""): v.numpy() for k, v in sd.items()}


def _bn(sd, prefix):
    return (
        {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]},
        {"mean": sd[f"{prefix}.running_mean"],
         "var": sd[f"{prefix}.running_var"]},
    )


def resnet50_to_flax(sd: dict[str, np.ndarray], in_channels: int = 50,
                     ) -> tuple[dict, dict]:
    """torchvision resnet50 state_dict -> (params, batch_stats) matching
    ``_ResNetStyleEncoder`` (models/style_encoders/resnet.py).  The 1x1
    reducer convs have no torch counterpart and keep their init."""
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}

    params["conv1"] = {
        "kernel": conv_w(expand_first_conv(sd["conv1.weight"], in_channels))}
    p, s = _bn(sd, "bn1")
    params["bn1"], stats["bn1"] = p, s

    stage_sizes = {"layer1": 3, "layer2": 4, "layer3": 6, "layer4": 3}
    for li, (layer, n) in enumerate(stage_sizes.items(), start=1):
        for bi in range(n):
            name = f"layer{li}_{bi}"
            blk_p: dict[str, Any] = {}
            blk_s: dict[str, Any] = {}
            for ci in (1, 2, 3):
                blk_p[f"conv{ci}"] = {
                    "kernel": conv_w(sd[f"{layer}.{bi}.conv{ci}.weight"])}
                p, s = _bn(sd, f"{layer}.{bi}.bn{ci}")
                blk_p[f"bn{ci}"], blk_s[f"bn{ci}"] = p, s
            dkey = f"{layer}.{bi}.downsample"
            if f"{dkey}.0.weight" in sd:
                blk_p["down_conv"] = {
                    "kernel": conv_w(sd[f"{dkey}.0.weight"])}
                p, s = _bn(sd, f"{dkey}.1")
                blk_p["down_bn"], blk_s["down_bn"] = p, s
            params[name] = blk_p
            stats[name] = blk_s
    return params, stats


def inception_v3_to_flax(sd: dict[str, np.ndarray]) -> tuple[dict, dict]:
    """torchvision inception_v3 state_dict -> (params, batch_stats) matching
    ``InceptionV3Pool3`` (eval/inception_v3.py).  Aux-classifier and fc
    entries are ignored."""
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}
    modules: dict[str, dict] = {}
    for key in sd:
        if key.startswith(("AuxLogits", "fc.")):
            continue
        parts = key.split(".")
        # e.g. Mixed_5b.branch1x1.conv.weight / Conv2d_1a_3x3.bn.weight
        if parts[-2] == "conv":
            mod = ".".join(parts[:-2])
            modules.setdefault(mod, {})["conv"] = sd[key]
        elif parts[-2] == "bn":
            mod = ".".join(parts[:-2])
            modules.setdefault(mod, {})[f"bn.{parts[-1]}"] = sd[key]

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    for mod, tensors in modules.items():
        path = mod.split(".")
        put(params, path + ["conv"], {"kernel": conv_w(tensors["conv"])})
        put(params, path + ["bn"], {
            "scale": tensors["bn.weight"], "bias": tensors["bn.bias"]})
        put(stats, path + ["bn"], {
            "mean": tensors["bn.running_mean"],
            "var": tensors["bn.running_var"]})
    return params, stats


def merge_pretrained(init_variables: dict, params: dict, stats: dict) -> dict:
    """Overlay imported tensors onto an init()'d variables dict, keeping
    entries with no torch counterpart (reducers, heads)."""
    import jax

    def overlay(dst, src):
        out = dict(dst)
        for k, v in src.items():
            if k in out and isinstance(v, dict) and isinstance(out[k], dict):
                out[k] = overlay(out[k], v)
            else:
                out[k] = v
        return out

    merged = {
        "params": overlay(dict(init_variables["params"]), params),
        "batch_stats": overlay(
            dict(init_variables.get("batch_stats", {})), stats),
    }

    # shape check
    def check(path, a, b):
        assert np.shape(a) == np.shape(b), (path, np.shape(a), np.shape(b))

    jax.tree.map(
        lambda a, b: check("", a, b),
        init_variables["params"], merged["params"])
    return merged
