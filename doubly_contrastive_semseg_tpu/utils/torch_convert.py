"""Torch checkpoint → Flax pytree conversion.

Two sources, both loaded with ``torch.load`` (CPU) and mapped into this
framework's NHWC/flax naming:

1. **torchvision ImageNet ResNet-18/34 state dicts** — the reference
   initializes the SwiftNet trunk from these (``resnet_pyramid.py:397-405``),
   fanning the single pretrained ``bn1`` out to the per-pyramid-level stem
   BNs ``bn1_0/1/2`` (``resnet_pyramid.py:388-393``). Zero-egress image:
   the .pth must already be on disk (``--pretrained <path>``).

2. **Reference WeatherNet checkpoints** (``model_state`` inside a trainer
   .pth, ``trainer.py:407-421``) — full-model import so users of the
   reference can bring their trained weights across.

Conventions: torch conv weight (O, I, kH, kW) → flax kernel (kH, kW, I, O);
torch Linear (O, I) → flax (I, O); BN weight/bias → scale/bias params,
running_mean/var → batch_stats.
"""

from __future__ import annotations

import logging
import re
from typing import Any, Dict, Tuple


def _conv_kernel(w) -> Any:
    import numpy as np

    return np.transpose(np.asarray(w, dtype=np.float32), (2, 3, 1, 0))


def _dense_kernel(w) -> Any:
    import numpy as np

    return np.transpose(np.asarray(w, dtype=np.float32), (1, 0))


def _set(tree: Dict, path, value) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _bn_entries(sd: Dict, torch_prefix: str, params: Dict, stats: Dict, path) -> bool:
    import numpy as np

    w = sd.get(torch_prefix + ".weight")
    if w is None:
        return False
    _set(params, path + ("scale",), np.asarray(w, np.float32))
    _set(params, path + ("bias",), np.asarray(sd[torch_prefix + ".bias"], np.float32))
    _set(stats, path + ("mean",), np.asarray(sd[torch_prefix + ".running_mean"], np.float32))
    _set(stats, path + ("var",), np.asarray(sd[torch_prefix + ".running_var"], np.float32))
    return True


def convert_torchvision_resnet(state_dict: Dict) -> Tuple[Dict, Dict]:
    """torchvision resnet18/34 state dict → (params, batch_stats) subtree for
    ``PyramidResNet`` (keys relative to the feature_extractor)."""
    from ..ops.input_pipeline import stem_s2d_kernel_from_dense

    params: Dict = {}
    stats: Dict = {}
    sd = {k: v for k, v in state_dict.items()}

    # stem: dense 7×7/s2 weights → the model's s2d(2) 4×4/s1 form (bit-exact
    # rearrangement, see ops/input_pipeline.py)
    _set(params, ("conv1", "kernel"),
         stem_s2d_kernel_from_dense(_conv_kernel(sd["conv1.weight"])))
    for lvl in range(3):  # bn1 fan-out (resnet_pyramid.py:388-393)
        _bn_entries(sd, "bn1", params, stats, (f"bn1_{lvl}",))

    block_re = re.compile(r"^layer(\d)\.(\d+)\.")
    seen = set()
    for key in sd:
        m = block_re.match(key)
        if not m:
            continue
        s, b = m.group(1), m.group(2)
        if (s, b) in seen:
            continue
        seen.add((s, b))
        tp = f"layer{s}.{b}"
        fp = f"layer{s}_{b}"
        _set(params, (fp, "conv1", "kernel"), _conv_kernel(sd[f"{tp}.conv1.weight"]))
        _set(params, (fp, "conv2", "kernel"), _conv_kernel(sd[f"{tp}.conv2.weight"]))
        _bn_entries(sd, f"{tp}.bn1", params, stats, (fp, "bn1"))
        _bn_entries(sd, f"{tp}.bn2", params, stats, (fp, "bn2"))
        if f"{tp}.downsample.0.weight" in sd:
            _set(params, (fp, "downsample_conv", "kernel"),
                 _conv_kernel(sd[f"{tp}.downsample.0.weight"]))
            _bn_entries(sd, f"{tp}.downsample.1", params, stats, (fp, "downsample_bn"))
    return params, stats


def convert_reference_weathernet(model_state: Dict) -> Tuple[Dict, Dict]:
    """Reference WeatherNet ``model_state`` → (params, batch_stats) for
    ``DCSSModel``'s ``net`` subtree (feature_extractor + segmentation head)."""
    import numpy as np

    fe_sd = {k[len("feature_extractor."):]: v for k, v in model_state.items()
             if k.startswith("feature_extractor.")}
    params: Dict = {}
    stats: Dict = {}

    # the trunk shares torchvision naming inside feature_extractor
    trunk_p, trunk_s = convert_torchvision_resnet(fe_sd)
    params.update(trunk_p)
    stats.update(trunk_s)
    # per-level stem BNs exist explicitly in WeatherNet checkpoints
    for lvl in range(3):
        _bn_entries(fe_sd, f"bn1_{lvl}", params, stats, (f"bn1_{lvl}",))

    for j in range(1, 5):  # 1×1 skip bottlenecks
        key = f"upsample_bottlenecks{j}.weight"
        if key in fe_sd:
            _set(params, (f"upsample_bottlenecks{j}", "kernel"), _conv_kernel(fe_sd[key]))
    for i in range(1, 6):  # blend convs (_BNReluConv: norm + conv)
        pre = f"upsample_blends{i}.blend_conv"
        if f"{pre}.conv.weight" in fe_sd:
            _set(params, (f"upsample_blends{i}", "blend_conv", "conv", "kernel"),
                 _conv_kernel(fe_sd[f"{pre}.conv.weight"]))
            _bn_entries(fe_sd, f"{pre}.norm", params, stats,
                        (f"upsample_blends{i}", "blend_conv", "norm"))

    net_params = {"feature_extractor": params}
    net_stats = {"feature_extractor": stats}

    if "segmentation.conv.weight" in model_state:
        seg_p: Dict = {}
        seg_s: Dict = {}
        _set(seg_p, ("conv", "kernel"), _conv_kernel(model_state["segmentation.conv.weight"]))
        if "segmentation.conv.bias" in model_state:
            _set(seg_p, ("conv", "bias"),
                 np.asarray(model_state["segmentation.conv.bias"], np.float32))
        _bn_entries(model_state, "segmentation.norm", seg_p, seg_s, ("norm",))
        net_params["segmentation"] = seg_p
        net_stats["segmentation"] = seg_s

    return net_params, net_stats


def _tconv_kernel(w) -> Any:
    """torch ConvTranspose2d weight (I, O, kH, kW) → flax ConvTranspose
    kernel (kH, kW, I, O) **with spatial flip**: flax/lax ``conv_transpose``
    runs a true convolution (flipped taps) over the lhs-dilated input while
    torch's formulation reduces to correlation with the stored weight —
    permute + flip both spatial axes makes them bit-equal (verified
    numerically in test_reference_parity's ENet oracle)."""
    import numpy as np

    k = np.transpose(np.asarray(w, dtype=np.float32), (2, 3, 0, 1))
    return np.ascontiguousarray(k[::-1, ::-1])


def convert_reference_enet(model_state: Dict) -> Tuple[Dict, Dict]:
    """Reference ENet ``model_state`` (``network/enet.py:466-641``, saved by
    ``trainer.py:407-421``) → (params, batch_stats) for ``ENetDCSS``'s ``net``
    subtree. Maps the torch ``Sequential`` indices onto this module's named
    layers (``models/enet.py``), including PReLU slopes (``.weight`` of
    ``nn.PReLU`` → ``Act``'s ``alpha``) and both transposed convs."""
    import numpy as np

    params: Dict = {}
    stats: Dict = {}
    sd = model_state

    def conv(tp, path):
        if f"{tp}.weight" in sd:
            _set(params, path + ("kernel",), _conv_kernel(sd[f"{tp}.weight"]))
            if f"{tp}.bias" in sd:
                _set(params, path + ("bias",), np.asarray(sd[f"{tp}.bias"], np.float32))

    def act(tp, path):
        # PReLU carries a slope parameter; ReLU entries simply have no key
        if f"{tp}.weight" in sd:
            _set(params, path + ("alpha",),
                 np.asarray(sd[f"{tp}.weight"], np.float32))

    # initial block
    conv("initial_block.main_branch", ("initial_block", "main"))
    _bn_entries(sd, "initial_block.batch_norm", params, stats, ("initial_block", "bn"))
    act("initial_block.out_activation", ("initial_block", "act"))

    blocks = sorted({k.split(".")[0] for k in sd
                     if k.split(".")[0] not in ("initial_block", "transposed_conv")})
    for b in blocks:
        fp = (b,)
        if b.startswith("downsample") or b.startswith("regular") \
                or b.startswith("dilated") or b.startswith("asymmetric"):
            conv(f"{b}.ext_conv1.0", fp + ("ext_conv1",))
            _bn_entries(sd, f"{b}.ext_conv1.1", params, stats, fp + ("ext_bn1",))
            act(f"{b}.ext_conv1.2", fp + ("ext_act1",))
            if f"{b}.ext_conv2.3.weight" in sd:  # asymmetric 5x1 + 1x5 pair
                conv(f"{b}.ext_conv2.0", fp + ("ext_conv2a",))
                _bn_entries(sd, f"{b}.ext_conv2.1", params, stats, fp + ("ext_bn2a",))
                act(f"{b}.ext_conv2.2", fp + ("ext_act2a",))
                conv(f"{b}.ext_conv2.3", fp + ("ext_conv2b",))
                _bn_entries(sd, f"{b}.ext_conv2.4", params, stats, fp + ("ext_bn2",))
                act(f"{b}.ext_conv2.5", fp + ("ext_act2",))
            else:
                conv(f"{b}.ext_conv2.0", fp + ("ext_conv2",))
                _bn_entries(sd, f"{b}.ext_conv2.1", params, stats, fp + ("ext_bn2",))
                act(f"{b}.ext_conv2.2", fp + ("ext_act2",))
            conv(f"{b}.ext_conv3.0", fp + ("ext_conv3",))
            _bn_entries(sd, f"{b}.ext_conv3.1", params, stats, fp + ("ext_bn3",))
            act(f"{b}.ext_conv3.2", fp + ("ext_act3",))
            act(f"{b}.out_activation", fp + ("out_act",))
        elif b.startswith("upsample"):
            conv(f"{b}.main_conv1.0", fp + ("main_conv",))
            _bn_entries(sd, f"{b}.main_conv1.1", params, stats, fp + ("main_bn",))
            conv(f"{b}.ext_conv1.0", fp + ("ext_conv1",))
            _bn_entries(sd, f"{b}.ext_conv1.1", params, stats, fp + ("ext_bn1",))
            act(f"{b}.ext_conv1.2", fp + ("ext_act1",))
            if f"{b}.ext_tconv1.weight" in sd:
                _set(params, fp + ("ext_tconv", "kernel"),
                     _tconv_kernel(sd[f"{b}.ext_tconv1.weight"]))
            _bn_entries(sd, f"{b}.ext_tconv1_bnorm", params, stats, fp + ("ext_bn2",))
            act(f"{b}.ext_tconv1_activation", fp + ("ext_act2",))
            conv(f"{b}.ext_conv2.0", fp + ("ext_conv2",))
            _bn_entries(sd, f"{b}.ext_conv2.1", params, stats, fp + ("ext_bn3",))
            act(f"{b}.out_activation", fp + ("out_act",))

    if "transposed_conv.weight" in sd:
        _set(params, ("transposed_conv", "kernel"),
             _tconv_kernel(sd["transposed_conv.weight"]))
    return params, stats


def convert_reference_deeplab(model_state: Dict) -> Tuple[Dict, Dict]:
    """Reference DeepLabV3/V3+ ``model_state`` (``modeling.deeplabv3*_resnet*``,
    saved by ``trainer.py:407-421``) → (params, batch_stats) for
    ``DeepLabDCSS``. Covers the torchvision-style dilated-ResNet backbone
    (bottleneck blocks) and both heads. Import with
    ``DeepLabDCSS(normalize_input=False)`` — the reference's deeplab path
    feeds raw pixels (``network/utils.py:166-194``)."""
    import numpy as np

    params: Dict = {}
    stats: Dict = {}
    sd = model_state

    # ---- backbone: torchvision resnet naming under 'backbone.'
    _set(params, ("backbone", "conv1", "kernel"), _conv_kernel(sd["backbone.conv1.weight"]))
    _bn_entries(sd, "backbone.bn1", params, stats, ("backbone", "bn1"))
    block_re = re.compile(r"^backbone\.layer(\d)\.(\d+)\.conv1\.weight$")
    for key in list(sd):
        m = block_re.match(key)
        if not m:
            continue
        s, b = m.group(1), m.group(2)
        tp, fp = f"backbone.layer{s}.{b}", ("backbone", f"layer{s}_{b}")
        for j in (1, 2, 3):  # bottleneck convs (resnet50/101)
            wkey = f"{tp}.conv{j}.weight"
            if wkey in sd:
                _set(params, fp + (f"conv{j}", "kernel"), _conv_kernel(sd[wkey]))
                _bn_entries(sd, f"{tp}.bn{j}", params, stats, fp + (f"bn{j}",))
        if f"{tp}.downsample.0.weight" in sd:
            _set(params, fp + ("downsample_conv", "kernel"),
                 _conv_kernel(sd[f"{tp}.downsample.0.weight"]))
            _bn_entries(sd, f"{tp}.downsample.1", params, stats,
                        fp + ("downsample_bn",))

    # ---- head. V3+: classifier.{project,aspp,classifier}; V3: classifier.0
    # is the ASPP, then Sequential conv/bn/relu/conv (reference _deeplab.py)
    def conv_bn(tp_conv: str, tp_bn: str, path) -> None:
        if tp_conv in sd:
            _set(params, path + ("conv", "kernel"), _conv_kernel(sd[tp_conv]))
            _bn_entries(sd, tp_bn, params, stats, path + ("bn",))

    is_v3plus = "classifier.project.0.weight" in sd
    aspp_prefix = "classifier.aspp" if is_v3plus else "classifier.0"
    cls = ("classifier",)
    conv_bn(f"{aspp_prefix}.convs.0.0.weight", f"{aspp_prefix}.convs.0.1",
            cls + ("aspp", "conv1x1"))
    for i in (1, 2, 3):
        conv_bn(f"{aspp_prefix}.convs.{i}.0.weight", f"{aspp_prefix}.convs.{i}.1",
                cls + ("aspp", f"aspp_conv{i - 1}"))
    conv_bn(f"{aspp_prefix}.convs.4.1.weight", f"{aspp_prefix}.convs.4.2",
            cls + ("aspp", "image_pool"))
    conv_bn(f"{aspp_prefix}.project.0.weight", f"{aspp_prefix}.project.1",
            cls + ("aspp", "project"))

    if is_v3plus:
        conv_bn("classifier.project.0.weight", "classifier.project.1",
                cls + ("project",))
        conv_bn("classifier.classifier.0.weight", "classifier.classifier.1",
                cls + ("fuse",))
        fkey = "classifier.classifier.3"
    else:
        conv_bn("classifier.1.weight", "classifier.2", cls + ("fuse",))
        fkey = "classifier.4"
    if f"{fkey}.weight" in sd:
        _set(params, cls + ("classifier", "kernel"), _conv_kernel(sd[f"{fkey}.weight"]))
        if f"{fkey}.bias" in sd:
            _set(params, cls + ("classifier", "bias"),
                 np.asarray(sd[f"{fkey}.bias"], np.float32))
    return params, stats


def _merge(dst: Dict, src: Dict, path="") -> int:
    """Copy src leaves into dst where path+shape match; returns #loaded."""
    import numpy as np

    n = 0
    for k, v in src.items():
        if k not in dst:
            logging.debug("convert: skipping unknown key %s/%s", path, k)
            continue
        if isinstance(v, dict):
            n += _merge(dst[k], v, f"{path}/{k}")
        else:
            cur = dst[k]
            if tuple(np.shape(cur)) == tuple(np.shape(v)):
                dst[k] = np.asarray(v, np.float32).astype(np.asarray(cur).dtype)
                n += 1
            else:
                logging.warning("convert: shape mismatch at %s/%s: %s vs %s",
                                path, k, np.shape(cur), np.shape(v))
    return n


def load_pretrained(params: Dict, batch_stats: Dict, path: str) -> Tuple[Dict, Dict, int]:
    """Load a torch .pth (torchvision resnet OR reference trainer checkpoint)
    into (params, batch_stats) copies; partial-load tolerant like the
    reference's ``strict=False`` (``init_trainer.py:258-281``)."""
    import copy

    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "model_state" in blob:
        sd = {k: v.numpy() for k, v in blob["model_state"].items()}
        if any(k.startswith("backbone.") for k in sd):  # deeplab family
            p_new, s_new = convert_reference_deeplab(sd)
        elif any(k.startswith("initial_block.") for k in sd):  # ENet
            p_new, s_new = convert_reference_enet(sd)
            p_new, s_new = {"net": p_new}, {"net": s_new}
        else:
            p_new, s_new = convert_reference_weathernet(sd)
            p_new, s_new = {"net": p_new}, {"net": s_new}
    else:
        sd = {k: v.numpy() for k, v in blob.items() if hasattr(v, "numpy")}
        p_new, s_new = convert_torchvision_resnet(sd)
        p_new = {"net": {"feature_extractor": p_new}}
        s_new = {"net": {"feature_extractor": s_new}}

    params = copy.deepcopy(jax_to_py(params))
    batch_stats = copy.deepcopy(jax_to_py(batch_stats))
    n = _merge(params, p_new)
    n += _merge(batch_stats, s_new)
    logging.info("loaded %d tensors from %s", n, path)
    return params, batch_stats, n


def jax_to_py(tree):
    """Unfreeze/normalize a (possibly frozen) flax tree to plain dicts."""
    import numpy as np

    if isinstance(tree, dict) or hasattr(tree, "items"):
        return {k: jax_to_py(v) for k, v in tree.items()}
    return np.asarray(tree)
