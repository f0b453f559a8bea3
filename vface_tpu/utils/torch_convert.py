"""PyTorch checkpoint → Flax param-tree converters.

The reference ships all weights as torch checkpoints (SD-v1-4 9-channel
surgery `scripts/modify_checkpoints.py`, ArcFace
`Other_dependencies/arcface/model_ir_se50.pth`, BiSeNet
`Other_dependencies/face_parsing/79999_iter.pth`, CLIP via HF, RAFT via
torchvision). These converters map torch ``state_dict``s onto the Flax module
trees of `vface_tpu.models` (torch is CPU-only in this image; conversion is a
one-time host step).

Layout rules:
* torch Conv2d weight (O, I, kH, kW) → flax ``kernel`` (kH, kW, I, O)
* torch Linear weight (O, I)         → flax ``kernel`` (I, O)
* torch norm weight/bias             → flax ``scale`` / ``bias``
* torch BN running_mean/var          → FrozenBN ``mean`` / ``var``

Each converter returns a nested dict matching ``Model.init(...)["params"]``.
Use :func:`verify_tree` to check shapes against an init tree before saving.
"""

from __future__ import annotations

from typing import Callable, Dict, Mapping

import numpy as np


def _t(x) -> np.ndarray:
    """torch tensor → numpy (works on torch or numpy inputs)."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def conv_kernel(w) -> np.ndarray:
    return _t(w).transpose(2, 3, 1, 0)


def linear_kernel(w) -> np.ndarray:
    return _t(w).transpose(1, 0)


def set_path(tree: Dict, path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def convert_frozen_bn(sd: Mapping, prefix: str, tree: Dict, out_prefix: str) -> None:
    set_path(tree, f"{out_prefix}/scale", _t(sd[f"{prefix}.weight"]))
    set_path(tree, f"{out_prefix}/bias", _t(sd[f"{prefix}.bias"]))
    set_path(tree, f"{out_prefix}/mean", _t(sd[f"{prefix}.running_mean"]))
    set_path(tree, f"{out_prefix}/var", _t(sd[f"{prefix}.running_var"]))


def convert_conv(sd: Mapping, prefix: str, tree: Dict, out_prefix: str, bias=True) -> None:
    set_path(tree, f"{out_prefix}/kernel", conv_kernel(sd[f"{prefix}.weight"]))
    if bias and f"{prefix}.bias" in sd:
        set_path(tree, f"{out_prefix}/bias", _t(sd[f"{prefix}.bias"]))


def convert_linear(sd: Mapping, prefix: str, tree: Dict, out_prefix: str, bias=True) -> None:
    set_path(tree, f"{out_prefix}/kernel", linear_kernel(sd[f"{prefix}.weight"]))
    if bias and f"{prefix}.bias" in sd:
        set_path(tree, f"{out_prefix}/bias", _t(sd[f"{prefix}.bias"]))


def convert_groupnorm(sd: Mapping, prefix: str, tree: Dict, out_prefix: str) -> None:
    set_path(tree, f"{out_prefix}/GroupNorm_0/scale", _t(sd[f"{prefix}.weight"]))
    set_path(tree, f"{out_prefix}/GroupNorm_0/bias", _t(sd[f"{prefix}.bias"]))


def convert_layernorm(sd: Mapping, prefix: str, tree: Dict, out_prefix: str) -> None:
    set_path(tree, f"{out_prefix}/LayerNorm_0/scale", _t(sd[f"{prefix}.weight"]))
    set_path(tree, f"{out_prefix}/LayerNorm_0/bias", _t(sd[f"{prefix}.bias"]))


# --------------------------------------------------------------------- ArcFace


def convert_arcface(sd: Mapping) -> Dict:
    """model_ir_se50.pth → IRSE50 param tree.

    torch layout (model_irse.py): input_layer.{0 conv,1 bn,2 prelu},
    body.{i}.{res_layer.{0 bn,1 conv,2 prelu,3 conv,4 bn,5 se},
    shortcut_layer.{0 conv,1 bn}}, output_layer.{0 bn,3 linear,4 bn1d}.
    """
    tree: Dict = {}
    convert_conv(sd, "input_layer.0", tree, "input_conv", bias=False)
    convert_frozen_bn(sd, "input_layer.1", tree, "input_bn")
    set_path(tree, "input_prelu/alpha", _t(sd["input_layer.2.weight"]))
    i = 0
    while f"body.{i}.res_layer.1.weight" in sd:
        p = f"body.{i}"
        o = f"block_{i}"
        convert_frozen_bn(sd, f"{p}.res_layer.0", tree, f"{o}/bn1")
        convert_conv(sd, f"{p}.res_layer.1", tree, f"{o}/conv1", bias=False)
        set_path(tree, f"{o}/prelu/alpha", _t(sd[f"{p}.res_layer.2.weight"]))
        convert_conv(sd, f"{p}.res_layer.3", tree, f"{o}/conv2", bias=False)
        convert_frozen_bn(sd, f"{p}.res_layer.4", tree, f"{o}/bn2")
        convert_conv(sd, f"{p}.res_layer.5.fc1", tree, f"{o}/se/fc1", bias=False)
        convert_conv(sd, f"{p}.res_layer.5.fc2", tree, f"{o}/se/fc2", bias=False)
        if f"{p}.shortcut_layer.0.weight" in sd:
            convert_conv(sd, f"{p}.shortcut_layer.0", tree, f"{o}/shortcut_conv", bias=False)
            convert_frozen_bn(sd, f"{p}.shortcut_layer.1", tree, f"{o}/shortcut_bn")
        i += 1
    convert_frozen_bn(sd, "output_layer.0", tree, "out_bn")
    convert_linear(sd, "output_layer.3", tree, "out_fc")
    convert_frozen_bn(sd, "output_layer.4", tree, "out_feat_bn")
    return tree


# --------------------------------------------------------------------- BiSeNet


def convert_bisenet(sd: Mapping) -> Dict:
    """79999_iter.pth → BiSeNet param tree (zllrunning face-parsing layout)."""
    tree: Dict = {}

    def cbr(p, o):  # ConvBNReLU
        convert_conv(sd, f"{p}.conv", tree, f"{o}/conv", bias=False)
        convert_frozen_bn(sd, f"{p}.bn", tree, f"{o}/bn")

    # resnet trunk
    convert_conv(sd, "cp.resnet.conv1", tree, "cp/resnet/conv1", bias=False)
    convert_frozen_bn(sd, "cp.resnet.bn1", tree, "cp/resnet/bn1")
    for li, layer in enumerate(["layer1", "layer2", "layer3", "layer4"]):
        for b in range(2):
            p = f"cp.resnet.{layer}.{b}"
            o = f"cp/resnet/{layer}_{b}"
            convert_conv(sd, f"{p}.conv1", tree, f"{o}/conv1", bias=False)
            convert_frozen_bn(sd, f"{p}.bn1", tree, f"{o}/bn1")
            convert_conv(sd, f"{p}.conv2", tree, f"{o}/conv2", bias=False)
            convert_frozen_bn(sd, f"{p}.bn2", tree, f"{o}/bn2")
            if f"{p}.downsample.0.weight" in sd:
                convert_conv(sd, f"{p}.downsample.0", tree, f"{o}/down_conv", bias=False)
                convert_frozen_bn(sd, f"{p}.downsample.1", tree, f"{o}/down_bn")
    # context path
    for arm, o in [("cp.arm16", "cp/arm16"), ("cp.arm32", "cp/arm32")]:
        cbr(f"{arm}.conv", f"{o}/conv")
        convert_conv(sd, f"{arm}.conv_atten", tree, f"{o}/conv_atten", bias=False)
        convert_frozen_bn(sd, f"{arm}.bn_atten", tree, f"{o}/bn_atten")
    cbr("cp.conv_avg", "cp/conv_avg")
    cbr("cp.conv_head32", "cp/conv_head32")
    cbr("cp.conv_head16", "cp/conv_head16")
    # ffm
    cbr("ffm.convblk", "ffm/convblk")
    convert_conv(sd, "ffm.conv1", tree, "ffm/conv1", bias=False)
    convert_conv(sd, "ffm.conv2", tree, "ffm/conv2", bias=False)
    # output head
    cbr("conv_out.conv", "conv_out/conv")
    convert_conv(sd, "conv_out.conv_out", tree, "conv_out/conv_out", bias=False)
    return tree


# ------------------------------------------------------------------ validation


def verify_tree(converted: Dict, init_tree: Dict, path: str = "") -> list:
    """Return a list of (path, problem) mismatches vs an init tree."""
    problems = []
    for k, v in init_tree.items():
        p = f"{path}/{k}" if path else k
        if k not in converted:
            problems.append((p, "missing"))
        elif isinstance(v, dict):
            problems.extend(verify_tree(converted.get(k, {}), v, p))
        else:
            cv = converted[k]
            if tuple(np.shape(cv)) != tuple(v.shape):
                problems.append((p, f"shape {np.shape(cv)} != {tuple(v.shape)}"))
    for k in converted:
        p = f"{path}/{k}" if path else k
        if k not in init_tree:
            problems.append((p, "unexpected"))
    return problems
