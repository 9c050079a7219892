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

    if "spp.spp.spp_bn.conv.weight" in fe_sd:
        # single-scale SwiftNet trio (resnet18_single/rgbd/hourglass):
        # SPP-based decoder instead of the pyramid's blend ladder
        params, stats = convert_reference_swiftnet_single(fe_sd)
        return _wrap_weathernet_head(model_state, params, stats)

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

    return _wrap_weathernet_head(model_state, params, stats)


def _wrap_weathernet_head(model_state: Dict, params: Dict, stats: Dict) -> Tuple[Dict, Dict]:
    """Nest converted feature-extractor trees under ``feature_extractor`` and
    attach WeatherNet's segmentation head if the checkpoint carries one."""
    import numpy as np

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

    if "backbone.low_level_features.0.0.weight" in sd:
        # ---- MobileNetV2 backbone (modeling.py:77-104): the factory slices
        # features[0:4]/features[4:-1] into low/high_level_features — torch
        # Sequential slicing PRESERVES the original indices, so keys are
        # low_level_features.{0..3} and high_level_features.{4..17}
        _set(params, ("backbone", "stem", "conv", "kernel"),
             _conv_kernel(sd["backbone.low_level_features.0.0.weight"]))
        _bn_entries(sd, "backbone.low_level_features.0.1", params, stats,
                    ("backbone", "stem", "bn"))
        for i in range(1, 18):
            sect = "low_level_features" if i < 4 else "high_level_features"
            tp = f"backbone.{sect}.{i}.conv"
            path = ("backbone", f"block{i}")
            if f"{tp}.3.weight" in sd:  # expand_ratio != 1: 4-entry Sequential
                _set(params, path + ("expand", "conv", "kernel"),
                     _conv_kernel(sd[f"{tp}.0.0.weight"]))
                _bn_entries(sd, f"{tp}.0.1", params, stats,
                            path + ("expand", "bn"))
                dw, dwbn, pj, pjbn = "1.0", "1.1", "2", "3"
            else:  # block1: dw → project
                dw, dwbn, pj, pjbn = "0.0", "0.1", "1", "2"
            _set(params, path + ("depthwise", "conv", "kernel"),
                 _conv_kernel(sd[f"{tp}.{dw}.weight"]))
            _bn_entries(sd, f"{tp}.{dwbn}", params, stats,
                        path + ("depthwise", "bn"))
            _set(params, path + ("project", "kernel"),
                 _conv_kernel(sd[f"{tp}.{pj}.weight"]))
            _bn_entries(sd, f"{tp}.{pjbn}", params, stats,
                        path + ("project_bn",))
        _deeplab_head_entries(sd, params, stats)
        return params, stats

    if "backbone.transition1.0.0.weight" in sd:
        # ---- HRNetV2 backbone (modeling.py:11-33 — NOTE the reference's own
        # hrnet factories crash: IntermediateLayerGetter doesn't accept the
        # hrnet_flag it is passed; this mapping targets the FIXED upstream
        # wiring, which the oracle test reproduces torch-side). Keys follow
        # network/backbone/hrnetv2.py: stem conv1/bn1/conv2/bn2; layer1 = 4
        # Bottlenecks; transition1 = ModuleList[Sequential, Sequential(
        # Sequential)]; transition{2,3} = Sequential(conv, bn, relu);
        # stage{s}.{m}.branches.{i}.{b} BasicBlocks and
        # stage{s}.{m}.fuse_layers.{i}.{j} (1×1+BN+nearest-up for j>i,
        # stride-2 conv chains for j<i).
        _set(params, ("backbone", "stem_conv0", "kernel"),
             _conv_kernel(sd["backbone.conv1.weight"]))
        _bn_entries(sd, "backbone.bn1", params, stats, ("backbone", "stem_bn0"))
        _set(params, ("backbone", "stem_conv1", "kernel"),
             _conv_kernel(sd["backbone.conv2.weight"]))
        _bn_entries(sd, "backbone.bn2", params, stats, ("backbone", "stem_bn1"))
        for b in range(4):
            tp = f"backbone.layer1.{b}"
            path = ("backbone", f"layer1_{b}")
            for cn in ("conv1", "conv2", "conv3"):
                _set(params, path + (cn, "kernel"),
                     _conv_kernel(sd[f"{tp}.{cn}.weight"]))
                _bn_entries(sd, f"{tp}.bn{cn[-1]}", params, stats,
                            path + (f"bn{cn[-1]}",))
            if f"{tp}.downsample.0.weight" in sd:
                _set(params, path + ("downsample_conv", "kernel"),
                     _conv_kernel(sd[f"{tp}.downsample.0.weight"]))
                _bn_entries(sd, f"{tp}.downsample.1", params, stats,
                            path + ("downsample_bn",))
        _set(params, ("backbone", "trans0", "kernel"),
             _conv_kernel(sd["backbone.transition1.0.0.weight"]))
        _bn_entries(sd, "backbone.transition1.0.1", params, stats,
                    ("backbone", "trans0_bn"))
        _set(params, ("backbone", "trans1", "kernel"),
             _conv_kernel(sd["backbone.transition1.1.0.0.weight"]))
        _bn_entries(sd, "backbone.transition1.1.0.1", params, stats,
                    ("backbone", "trans1_bn"))
        for t, s in ((2, 3), (3, 4)):  # transition{t} → our trans_s{s}
            _set(params, ("backbone", f"trans_s{s}", "kernel"),
                 _conv_kernel(sd[f"backbone.transition{t}.0.weight"]))
            _bn_entries(sd, f"backbone.transition{t}.1", params, stats,
                        ("backbone", f"trans_s{s}_bn"))
        for stage in (2, 3, 4):
            m = 0
            while f"backbone.stage{stage}.{m}.branches.0.0.conv1.weight" in sd:
                sp = f"backbone.stage{stage}.{m}"
                for i in range(stage):
                    for b in range(4):
                        tp = f"{sp}.branches.{i}.{b}"
                        path = ("backbone", f"s{stage}_m{m}_b{i}_blk{b}")
                        for cn in ("conv1", "conv2"):
                            _set(params, path + (cn, "kernel"),
                                 _conv_kernel(sd[f"{tp}.{cn}.weight"]))
                            _bn_entries(sd, f"{tp}.bn{cn[-1]}", params, stats,
                                        path + (f"bn{cn[-1]}",))
                    for j in range(stage):
                        fp = f"{sp}.fuse_layers.{i}.{j}"
                        fpath = ("backbone", f"s{stage}_m{m}_fuse")
                        if j > i:  # 1×1 conv + BN (+ nearest upsample)
                            _set(params, fpath + (f"up{j}to{i}", "kernel"),
                                 _conv_kernel(sd[f"{fp}.0.weight"]))
                            _bn_entries(sd, f"{fp}.1", params, stats,
                                        fpath + (f"up{j}to{i}_bn",))
                        elif j < i:  # chain of stride-2 conv+BN(+relu)
                            for k in range(i - j):
                                _set(params,
                                     fpath + (f"down{j}to{i}_{k}", "kernel"),
                                     _conv_kernel(sd[f"{fp}.{k}.0.weight"]))
                                _bn_entries(sd, f"{fp}.{k}.1", params, stats,
                                            fpath + (f"down{j}to{i}_{k}_bn",))
                m += 1
        _deeplab_head_entries(sd, params, stats)
        return params, stats

    if "backbone.block1.rep.0.conv1.weight" in sd:
        # ---- AlignedXception backbone (modeling.py:105-127): NOT wrapped in
        # IntermediateLayerGetter (the wrap is commented out in the
        # reference), so keys are the raw module names. Each Block's
        # ``rep`` Sequential interleaves parameter-free ReLUs, so the k-th
        # SeparableConv2d sits at a block-dependent index — scan for
        # ``rep.{k}.conv1.weight`` in order instead of computing offsets.
        # A SeparableConv2d is dw-conv → BN → pointwise; the Sequential puts
        # the OUTER BN at rep index k+1 → our SepConvBN's bn_pw.
        _set(params, ("backbone", "conv1", "kernel"),
             _conv_kernel(sd["backbone.conv1.weight"]))
        _bn_entries(sd, "backbone.bn1", params, stats, ("backbone", "bn1"))
        _set(params, ("backbone", "conv2", "kernel"),
             _conv_kernel(sd["backbone.conv2.weight"]))
        _bn_entries(sd, "backbone.bn2", params, stats, ("backbone", "bn2"))
        for n in range(1, 21):
            bp = f"backbone.block{n}"
            ks = sorted(int(m.group(1)) for key in sd
                        if (m := re.match(rf"^{re.escape(bp)}\.rep\.(\d+)\."
                                          r"conv1\.weight$", key)))
            for j, k in enumerate(ks):
                path = ("backbone", f"block{n}", f"sep{j}")
                _set(params, path + ("depthwise", "kernel"),
                     _conv_kernel(sd[f"{bp}.rep.{k}.conv1.weight"]))
                _bn_entries(sd, f"{bp}.rep.{k}.bn", params, stats,
                            path + ("bn_dw",))
                _set(params, path + ("pointwise", "kernel"),
                     _conv_kernel(sd[f"{bp}.rep.{k}.pointwise.weight"]))
                _bn_entries(sd, f"{bp}.rep.{k + 1}", params, stats,
                            path + ("bn_pw",))
            if f"{bp}.skip.weight" in sd:
                _set(params, ("backbone", f"block{n}", "skip_conv", "kernel"),
                     _conv_kernel(sd[f"{bp}.skip.weight"]))
                _bn_entries(sd, f"{bp}.skipbn", params, stats,
                            ("backbone", f"block{n}", "skip_bn"))
        for n in (3, 4, 5):  # exit flow: Sep conv + EXTERNAL bn{n} → bn_pw
            path = ("backbone", f"conv{n}")
            _set(params, path + ("depthwise", "kernel"),
                 _conv_kernel(sd[f"backbone.conv{n}.conv1.weight"]))
            _bn_entries(sd, f"backbone.conv{n}.bn", params, stats,
                        path + ("bn_dw",))
            _set(params, path + ("pointwise", "kernel"),
                 _conv_kernel(sd[f"backbone.conv{n}.pointwise.weight"]))
            _bn_entries(sd, f"backbone.bn{n}", params, stats,
                        path + ("bn_pw",))
        _deeplab_head_entries(sd, params, stats)
        return params, stats

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
    _deeplab_head_entries(sd, params, stats)
    return params, stats


def _deeplab_head_entries(sd: Dict, params: Dict, stats: Dict) -> None:
    """DeepLabHead / DeepLabHeadV3Plus mapping (reference ``_deeplab.py``),
    shared by every deeplab backbone branch."""
    import numpy as np

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


def _deform_conv2d_entries(sd: Dict, tp: str, params: Dict, path) -> None:
    """Reference ``network/deform.py::DeformConv2d`` (offset_conv +
    ModulatedDeformConv/DeformConv) → our ``ops/deform_conv.py::DeformConv2d``
    (offset_conv Conv + kernel/bias). Channel layouts agree verbatim — the
    wrapper's global offset/mask split is reproduced on our side."""
    import numpy as np

    _set(params, path + ("offset_conv", "kernel"),
         _conv_kernel(sd[f"{tp}.offset_conv.weight"]))
    _set(params, path + ("offset_conv", "bias"),
         np.asarray(sd[f"{tp}.offset_conv.bias"], np.float32))
    _set(params, path + ("kernel",), _conv_kernel(sd[f"{tp}.deform_conv.weight"]))
    if f"{tp}.deform_conv.bias" in sd and sd[f"{tp}.deform_conv.bias"] is not None:
        _set(params, path + ("bias",),
             np.asarray(sd[f"{tp}.deform_conv.bias"], np.float32))


def _bottleneck_entries(sd: Dict, tp: str, params: Dict, stats: Dict, path) -> None:
    """(Deform)SimpleBottleneck (``network/deform.py:137-231``): conv1/bn1,
    conv2|mdconv/bn2, conv3/bn3."""
    _set(params, path + ("conv1", "kernel"), _conv_kernel(sd[f"{tp}.conv1.weight"]))
    _bn_entries(sd, f"{tp}.bn1", params, stats, path + ("bn1",))
    if f"{tp}.conv2.weight" in sd:  # SimpleBottleneck
        _set(params, path + ("conv2", "kernel"), _conv_kernel(sd[f"{tp}.conv2.weight"]))
    else:  # DeformSimpleBottleneck
        _deform_conv2d_entries(sd, f"{tp}.conv2", params, path + ("mdconv",))
    _bn_entries(sd, f"{tp}.bn2", params, stats, path + ("bn2",))
    _set(params, path + ("conv3", "kernel"), _conv_kernel(sd[f"{tp}.conv3.weight"]))
    _bn_entries(sd, f"{tp}.bn3", params, stats, path + ("bn3",))


def convert_reference_adaptive_aggregation(model_state: Dict) -> Tuple[Dict, Dict]:
    """Reference ``network/aggregation.py::AdaptiveAggregation`` state dict →
    (params, batch_stats) for ``models/stereo.py::AdaptiveAggregation``
    (layer-for-layer; oracle-checked in ``tests/test_stereo_oracle.py``)."""
    import numpy as np

    params: Dict = {}
    stats: Dict = {}
    sd = model_state

    bot_re = re.compile(r"^fusions\.(\d+)\.branches\.(\d+)\.(\d+)\.conv1\.weight$")
    for key in list(sd):
        m = bot_re.match(key)
        if m:
            f, i, b = m.groups()
            _bottleneck_entries(sd, f"fusions.{f}.branches.{i}.{b}",
                                params, stats,
                                (f"fusion{f}", f"branch{i}_{b}"))

    # fuse i<j: Sequential(conv1x1, bn) — keys .0.weight / .1.*
    up_re = re.compile(r"^fusions\.(\d+)\.fuse_layers\.(\d+)\.(\d+)\.0\.weight$")
    # fuse i>j: Sequential of Sequentials — keys .k.0.weight / .k.1.*
    down_re = re.compile(
        r"^fusions\.(\d+)\.fuse_layers\.(\d+)\.(\d+)\.(\d+)\.0\.weight$")
    for key in list(sd):
        m = down_re.match(key)
        if m:
            f, i, j, k = m.groups()
            tp = f"fusions.{f}.fuse_layers.{i}.{j}.{k}"
            fp = (f"fusion{f}",)
            _set(params, fp + (f"fuse{i}_{j}_conv{k}", "kernel"),
                 _conv_kernel(sd[f"{tp}.0.weight"]))
            _bn_entries(sd, f"{tp}.1", params, stats, fp + (f"fuse{i}_{j}_bn{k}",))
            continue
        m = up_re.match(key)
        if m:
            f, i, j = m.groups()
            tp = f"fusions.{f}.fuse_layers.{i}.{j}"
            fp = (f"fusion{f}",)
            _set(params, fp + (f"fuse{i}_{j}_conv0", "kernel"),
                 _conv_kernel(sd[f"{tp}.0.weight"]))
            _bn_entries(sd, f"{tp}.1", params, stats, fp + (f"fuse{i}_{j}_bn0",))

    fc_re = re.compile(r"^final_conv\.(\d+)\.weight$")
    for key in list(sd):
        m = fc_re.match(key)
        if m:
            i = m.group(1)
            _set(params, (f"final_conv{i}", "kernel"), _conv_kernel(sd[key]))
            _set(params, (f"final_conv{i}", "bias"),
                 np.asarray(sd[f"final_conv.{i}.bias"], np.float32))
    return params, stats


def _basic_conv_entries(sd: Dict, tp: str, params: Dict, stats: Dict, path) -> None:
    """GANet ``BasicConv`` (feature.py:988-1006): conv|deconv + BN. The
    transposed flavor is recognized by its 4×4 kernel (every Conv2x deconv
    uses k=4, every plain one k=3)."""
    w = sd[f"{tp}.conv.weight"]
    k = _tconv_kernel(w) if w.shape[-1] == 4 else _conv_kernel(w)
    _set(params, path + ("conv", "kernel"), k)
    _bn_entries(sd, f"{tp}.bn", params, stats, path + ("bn",))


def convert_reference_refinement(model_state: Dict) -> Tuple[Dict, Dict]:
    """Reference refinement-head state dict (``Refine_New*``,
    ``Refine_disp_sem``, ``HourglassRefinement`` — ``refinement.py:111-1093``)
    → (params, batch_stats) for ``models/stereo_extras.py::SemRefine`` /
    ``HourglassRefinement``. Oracle-checked in ``tests/test_stereo_oracle.py``."""
    import numpy as np

    sd = model_state
    params: Dict = {}
    stats: Dict = {}
    hourglass = "final_conv.weight" in sd

    if "conv0.weight" in sd:  # SemRefine stem
        _set(params, ("conv0", "kernel"), _conv_kernel(sd["conv0.weight"]))
        _bn_entries(sd, "bn", params, stats, ("bn0",))

    # input encoders conv1/conv2/conv3 = Sequential(conv, bn, leaky)
    enc_map = {"conv1": "conv1", "conv2": "conv2"} if hourglass else \
        {"conv1": "enc_img", "conv2": "enc_disp", "conv3": "enc_sem"}
    for tk, fk in enc_map.items():
        if f"{tk}.0.weight" in sd:
            _set(params, (fk, "conv", "kernel"), _conv_kernel(sd[f"{tk}.0.weight"]))
            _bn_entries(sd, f"{tk}.1", params, stats, (fk, "bn"))

    # channel-attention gates (New9/New12): pool → 1×1 conv → sigmoid;
    # the 1×1 conv over pooled features is a Dense on our side
    for tk, fk in (("sem_attention", "sem_att"), ("disp_attention", "disp_att")):
        if f"{tk}.1.weight" in sd:
            w = np.asarray(sd[f"{tk}.1.weight"], np.float32)[:, :, 0, 0]
            _set(params, (fk, "kernel"), np.ascontiguousarray(w.T))
            _set(params, (fk, "bias"), np.asarray(sd[f"{tk}.1.bias"], np.float32))

    # conv_start + encoder/decoder ladder
    for name in ["conv_start", "conv1a", "conv2a", "conv3a", "conv4a"]:
        if f"{name}.conv.weight" in sd:  # BasicConv
            _basic_conv_entries(sd, name, params, stats, (name,))
        elif f"{name}.deform_conv.weight" in sd:  # DeformConv2d (hourglass)
            _deform_conv2d_entries(sd, name, params, (name,))
    for name in ["deconv4a", "deconv3a", "deconv2a", "deconv1a",
                 "conv1b", "conv2b", "conv3b", "conv4b",
                 "deconv4b", "deconv3b", "deconv2b", "deconv1b"]:
        if f"{name}.conv1.conv.weight" in sd:  # Conv2x
            _basic_conv_entries(sd, f"{name}.conv1", params, stats, (name, "conv1"))
            _basic_conv_entries(sd, f"{name}.conv2", params, stats, (name, "conv2"))

    # bare ×2 transposed convs of the disp/sem heads (no bn/relu)
    for name in ["deconv1", "deconv2", "deconv1_sem", "deconv2_sem"]:
        if f"{name}.weight" in sd:
            _set(params, (name, "kernel"), _tconv_kernel(sd[f"{name}.weight"]))

    for tk, fk in (("final_conv_disp", "final_disp"),
                   ("final_conv_sem", "final_sem"), ("final_conv", "final")):
        if f"{tk}.weight" in sd:
            _set(params, (fk, "kernel"), _conv_kernel(sd[f"{tk}.weight"]))
            _set(params, (fk, "bias"), np.asarray(sd[f"{tk}.bias"], np.float32))
    return params, stats


def _bnreluconv_entries(sd: Dict, tp: str, params: Dict, stats: Dict, path) -> None:
    """Reference ``_BNReluConv`` (utils.py:35-49: modules 'norm', 'conv') →
    ``models/blocks.py::BNReluConv`` ('norm', 'conv')."""
    _set(params, path + ("conv", "kernel"), _conv_kernel(sd[f"{tp}.conv.weight"]))
    _bn_entries(sd, f"{tp}.norm", params, stats, path + ("norm",))


def convert_reference_swiftnet_single(fe_sd: Dict) -> Tuple[Dict, Dict]:
    """Reference single-scale SwiftNet trio state dict (``ResNet_swift`` /
    RGB-D ``ResNet`` / ``ResNet_hourglass``, ``resnet_18.py:206-809``) →
    (params, batch_stats) for ``models/swiftnet_single.py``. Keys are relative
    to the feature extractor. ``conv_final`` is skipped on purpose: the
    reference constructs it but never calls it (``resnet_18.py:641``).
    Oracle-checked in ``tests/test_backbone_oracles.py``."""
    import numpy as np

    sd = fe_sd
    params: Dict = {}
    stats: Dict = {}

    # stem(s): conv1/bn1 (+ the depth branch's conv1_d/bn1_d)
    for sfx, fp in (("", "stem"), ("_d", "stem_d")):
        if f"conv1{sfx}.weight" in sd:
            _set(params, (fp, "conv1", "kernel"), _conv_kernel(sd[f"conv1{sfx}.weight"]))
            _bn_entries(sd, f"bn1{sfx}", params, stats, (fp, "bn1"))

    # trunks: layer{1..4}[_d].{0,1} → trunk[_d].layer{s}_{b}
    for sfx, trunk in (("", "trunk"), ("_d", "trunk_d")):
        for s in range(1, 5):
            for b in range(4):
                tp = f"layer{s}{sfx}.{b}"
                if f"{tp}.conv1.weight" not in sd:
                    continue
                fp = (trunk, f"layer{s}_{b}")
                _set(params, fp + ("conv1", "kernel"), _conv_kernel(sd[f"{tp}.conv1.weight"]))
                _set(params, fp + ("conv2", "kernel"), _conv_kernel(sd[f"{tp}.conv2.weight"]))
                _bn_entries(sd, f"{tp}.bn1", params, stats, fp + ("bn1",))
                _bn_entries(sd, f"{tp}.bn2", params, stats, fp + ("bn2",))
                if f"{tp}.downsample.0.weight" in sd:
                    _set(params, fp + ("downsample_conv", "kernel"),
                         _conv_kernel(sd[f"{tp}.downsample.0.weight"]))
                    _bn_entries(sd, f"{tp}.downsample.1", params, stats,
                                fp + ("downsample_bn",))

    # RGB-D channel-attention gates: Sequential(pool, conv1×1, sigmoid) —
    # module index 1 is the conv (resnet_18.py:319-324)
    for i in range(1, 5):
        for sfx in ("", "_d"):
            tk = f"attention_{i}{sfx}.1"
            if f"{tk}.weight" in sd:
                _set(params, (f"attention_{i}{sfx}", "kernel"),
                     _conv_kernel(sd[f"{tk}.weight"]))
                _set(params, (f"attention_{i}{sfx}", "bias"),
                     np.asarray(sd[f"{tk}.bias"], np.float32))

    # SPP: spp.spp.{spp_bn, spp0.., spp_fuse} (utils.py:120-131)
    for name in ["spp_bn", "spp0", "spp1", "spp2", "spp3", "spp_fuse"]:
        if f"spp.spp.{name}.conv.weight" in sd:
            _bnreluconv_entries(sd, f"spp.spp.{name}", params, stats, ("spp", name))

    # decoder: upsample.{i}.{bottleneck, blend_conv} (utils.py:52-77)
    for i in range(4):
        tp = f"upsample.{i}"
        if f"{tp}.bottleneck.conv.weight" not in sd:
            continue
        _bnreluconv_entries(sd, f"{tp}.bottleneck", params, stats,
                            (f"upsample{i}", "bottleneck"))
        _bnreluconv_entries(sd, f"{tp}.blend_conv", params, stats,
                            (f"upsample{i}", "blend_conv"))

    # hourglass disparity extractor: conv4a + the Conv2x ladder
    # (resnet_18.py:499-516); same module shapes as the GANet refinement
    if "conv4a.conv.weight" in sd:
        _basic_conv_entries(sd, "conv4a", params, stats, ("conv4a",))
    for name in ["deconv4a", "deconv3a", "deconv2a", "deconv1a",
                 "conv1b", "conv2b", "conv3b", "conv4b",
                 "deconv4b", "deconv3b", "deconv2b", "deconv1b"]:
        if f"{name}.conv1.conv.weight" in sd:
            _basic_conv_entries(sd, f"{name}.conv1", params, stats, (name, "conv1"))
            _basic_conv_entries(sd, f"{name}.conv2", params, stats, (name, "conv2"))

    return params, stats


def _conv3d_kernel(w) -> Any:
    import numpy as np

    # torch Conv3d (O, I, kD, kH, kW) → flax (kD, kH, kW, I, O)
    return np.transpose(np.asarray(w, dtype=np.float32), (2, 3, 4, 1, 0))


def _tconv3d_kernel(w) -> Any:
    """torch ConvTranspose3d (I, O, kD, kH, kW) → flax ConvTranspose
    (kD, kH, kW, I, O) with all three spatial axes flipped (same
    correlation-vs-convolution fix as ``_tconv_kernel``)."""
    import numpy as np

    k = np.transpose(np.asarray(w, dtype=np.float32), (2, 3, 4, 0, 1))
    return np.ascontiguousarray(k[::-1, ::-1, ::-1])


def convert_reference_psmnet_hg(model_state: Dict) -> Tuple[Dict, Dict]:
    """Reference ``PSMNetHGAggregation`` (``aggregation.py:194-258``) →
    (params, batch_stats) for ``models/stereo_extras.py::PSMNetHGAggregation``
    (channels-last 3-D convs). Oracle-checked in ``tests/test_stereo_oracle.py``."""
    sd = model_state
    params: Dict = {}
    stats: Dict = {}

    def convbn(tp: str, path) -> None:
        _set(params, path + ("conv", "kernel"), _conv3d_kernel(sd[f"{tp}.0.weight"]))
        _bn_entries(sd, f"{tp}.1", params, stats, path + ("bn",))

    convbn("dres0.0", ("dres0_0",))
    convbn("dres0.2", ("dres0_1",))
    convbn("dres1.0", ("dres1_0",))
    convbn("dres1.2", ("dres1_1",))
    for t, f in (("dres2", "hg1"), ("dres3", "hg2"), ("dres4", "hg3")):
        convbn(f"{t}.conv1.0", (f, "conv1"))
        convbn(f"{t}.conv2", (f, "conv2"))
        convbn(f"{t}.conv3.0", (f, "conv3"))
        convbn(f"{t}.conv4.0", (f, "conv4"))
        for tc in ("conv5", "conv6"):  # ConvTranspose3d + BN
            _set(params, (f, tc, "conv", "kernel"),
                 _tconv3d_kernel(sd[f"{t}.{tc}.0.weight"]))
            _bn_entries(sd, f"{t}.{tc}.1", params, stats, (f, tc, "bn"))
    for i in (1, 2, 3):
        convbn(f"classif{i}.0", (f"classif{i}_0",))
        _set(params, (f"classif{i}_1", "kernel"),
             _conv3d_kernel(sd[f"classif{i}.2.weight"]))
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
        # shared frozen heads the reference keeps OUTSIDE model_state
        # (SupCon projection inside the criterion, utils/loss.py:104-109;
        # WeatherClassifier as a separate module) — exported alongside by
        # scripts/_ab_ref_driver.py::make_init
        if "supcon_projection" in blob:
            ps = {k: v.numpy() for k, v in blob["supcon_projection"].items()}
            p_new["projection"] = {
                "fc1": {"kernel": _dense_kernel(ps["0.weight"]),
                        "bias": ps["0.bias"].astype("float32")},
                "fc2": {"kernel": _dense_kernel(ps["2.weight"]),
                        "bias": ps["2.bias"].astype("float32")},
            }
        if "weather_clf" in blob:
            ws = {k: v.numpy() for k, v in blob["weather_clf"].items()}
            p_new["weather_clf"] = {
                "fc": {"kernel": _dense_kernel(ws["fc.weight"]),
                       "bias": ws["fc.bias"].astype("float32")}}
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
