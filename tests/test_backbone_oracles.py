"""Checkpoint-import oracles for the secondary model families (VERDICT r3
item #5): deeplabv3plus_mobilenet, hrnetv2, xception, and the SwiftNet
single-scale / RGB-D / hourglass trio.

Same recipe as the rn18/rn34/rn50/ENet oracles (``test_reference_parity.py``):
build the REFERENCE model (torch CPU, random init), run a couple of train-mode
batches so BN running stats move off their init, save a trainer-format
checkpoint, import through ``utils/torch_convert.py``, and demand <2e-4
relative logit parity + 100% argmax agreement.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo/tests")
from test_reference_parity import REFERENCE, _install_torchvision_stubs  # noqa: E402


def _reference_modeling():
    _install_torchvision_stubs()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from network import modeling
    return modeling


def _warm_bn(model, n=2, hw=128, scale=255.0):
    model.train()
    with torch.no_grad():
        for i in range(n):
            g = torch.Generator().manual_seed(200 + i)
            model(torch.rand((2, 3, hw, hw), generator=g) * scale)
    model.eval()


def _check_deeplab(model, backbone, tmp_path, min_tensors, hw=128,
                   output_stride=16):
    ckpt = str(tmp_path / f"deeplab_{backbone}.pth")
    torch.save({"model_state": model.state_dict()}, ckpt)
    g = torch.Generator().manual_seed(5)
    x = torch.rand((1, 3, hw, hw), generator=g) * 255.0
    with torch.no_grad():
        seg_ref, *_ = model(x)

    from doubly_contrastive_semseg_tpu.models.deeplab import DeepLabDCSS
    from doubly_contrastive_semseg_tpu.utils.torch_convert import load_pretrained

    m = DeepLabDCSS(arch="deeplabv3plus", backbone=backbone, num_classes=19,
                    output_stride=output_stride, normalize_input=False,
                    dtype=jnp.float32)
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    v = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, xj, train=False)
    params, stats, n = load_pretrained(v["params"], v["batch_stats"], ckpt)
    assert n >= min_tensors, f"only {n} tensors imported"
    with jax.default_matmul_precision("highest"):
        out = m.apply({"params": params, "batch_stats": stats}, xj, train=False)
    seg = np.transpose(np.asarray(out["seg"]), (0, 3, 1, 2))
    want = seg_ref.numpy()
    scale = max(np.abs(want).max(), 1.0)
    rel = np.abs(seg - want).max() / scale
    assert rel < 2e-4, rel
    assert (seg.argmax(1) == want.argmax(1)).mean() == 1.0


def test_deeplab_xception_forward_parity(tmp_path):
    """deeplabv3plus_xception71 (modeling.py:105-127): AlignedXception is NOT
    wrapped in IntermediateLayerGetter (the wrap is commented out) — the
    backbone's own forward supplies {'out', 'low_level'} with low_level =
    relu(block1) (xception.py:192-195). output_stride=8 (the factory default)
    exercises the dilated middle/exit flows incl. the is_last conv's
    dilation-1 quirk (xception.py:67,72)."""
    modeling = _reference_modeling()
    torch.manual_seed(4)
    model = modeling.deeplabv3plus_xception71(
        types.SimpleNamespace(), num_classes=19, output_stride=8,
        pretrained_backbone=False)
    _warm_bn(model, hw=64)
    _check_deeplab(model, "xception", tmp_path, min_tensors=400, hw=64,
                   output_stride=8)


def test_deeplab_hrnetv2_forward_parity(tmp_path):
    """deeplabv3plus_hrnetv2_32 against the FIXED wiring (VERDICT r3 #5).

    The reference's own hrnet factories crash: modeling.py:30 passes
    ``hrnet_flag=True`` to an IntermediateLayerGetter whose signature
    (network/utils.py:227) doesn't accept it, and even without the flag the
    getter would drive the stem children linearly, silently dropping the
    relu between bn1 and conv2 that HRNet.forward applies
    (hrnetv2.py:248-256). The documented fix (upstream
    VainF/DeepLabV3Plus-Pytorch behavior): transitions get their
    list-plumbing, stage4's four branches are bilinear-upsampled to branch 0
    and concatenated, and the stem runs with HRNet.forward's own relu
    placement. This test builds exactly that composition from the
    REFERENCE's own modules and demands our HRNetV2 match it on imported
    weights."""
    _install_torchvision_stubs()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import torch.nn.functional as F
    from network import _deeplab
    from network.backbone import hrnetv2 as ref_hrnet

    torch.manual_seed(6)
    hr = ref_hrnet.hrnetv2_32(pretrained=False)

    class FixedHRNetBackbone(torch.nn.Module):
        def __init__(self, hr):
            super().__init__()
            # adopt the reference modules under the getter's key names
            self.conv1, self.bn1 = hr.conv1, hr.bn1
            self.conv2, self.bn2 = hr.conv2, hr.bn2
            self.layer1 = hr.layer1
            self.transition1 = hr.transition1
            self.stage2, self.transition2 = hr.stage2, hr.transition2
            self.stage3, self.transition3 = hr.stage3, hr.transition3
            self.stage4 = hr.stage4

        def forward(self, x):
            x = torch.relu(self.bn1(self.conv1(x)))
            x = torch.relu(self.bn2(self.conv2(x)))
            low = self.layer1(x)
            xs = [trans(low) for trans in self.transition1]
            xs = self.stage2(xs)
            xs.append(self.transition2(xs[-1]))
            xs = self.stage3(xs)
            xs.append(self.transition3(xs[-1]))
            xs = self.stage4(xs)
            hw = xs[0].shape[-2:]
            ups = [xs[0]] + [F.interpolate(v, size=hw, mode="bilinear",
                                           align_corners=False)
                             for v in xs[1:]]
            return {"low_level": low, "out": torch.cat(ups, dim=1)}

    inplanes = sum(32 * 2 ** i for i in range(4))
    model = _deeplab.DeepLabV3(
        FixedHRNetBackbone(hr),
        _deeplab.DeepLabHeadV3Plus(inplanes, 256, 19, [12, 24, 36]))
    _warm_bn(model, hw=64)
    _check_deeplab(model, "hrnetv2_32", tmp_path, min_tensors=500, hw=64)


def test_deeplab_mobilenet_forward_parity(tmp_path):
    """deeplabv3plus_mobilenet (modeling.py:77-104): the VainF MobileNetV2
    fork with its pad-the-block-INPUT quirk (backbone/mobilenetv2.py:52-82 —
    the 1x1 expand + BN run on the padded map, so the depthwise conv sees
    BN-shifted borders, a different function from pad-at-depthwise)."""
    modeling = _reference_modeling()
    torch.manual_seed(3)
    model = modeling.deeplabv3plus_mobilenet(
        types.SimpleNamespace(), num_classes=19, output_stride=16,
        pretrained_backbone=False)
    _warm_bn(model)
    _check_deeplab(model, "mobilenetv2", tmp_path, min_tensors=150)


# ---------------------------------------------------------------------------
# SwiftNet single-scale trio (resnet_18.py:206-809)
# ---------------------------------------------------------------------------

def _reference_resnet18():
    _install_torchvision_stubs()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from network.backbone import resnet_18
    return resnet_18


def _import_swift(model, flax_model, init_args, min_tensors):
    """state_dict → convert_reference_swiftnet_single → flax apply trees."""
    from doubly_contrastive_semseg_tpu.utils.torch_convert import (
        _merge, convert_reference_swiftnet_single, jax_to_py)

    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    p_new, s_new = convert_reference_swiftnet_single(sd)
    v = flax_model.init(jax.random.PRNGKey(0), *init_args, train=False)
    params = jax_to_py(v["params"])
    stats = jax_to_py(v["batch_stats"])
    n = _merge(params, p_new) + _merge(stats, s_new)
    assert n >= min_tensors, f"only {n} tensors imported"
    return {"params": params, "batch_stats": stats}


def _rel_err(got, want_nchw):
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    want = want_nchw.numpy()
    return np.abs(got - want).max() / max(np.abs(want).max(), 1.0)


def test_swiftnet_single_forward_parity():
    """ResNet_swift (resnet_18.py:653-795): post-relu skips (the in-place
    relu aliases the block's "pre-relu" return), the class's own
    mean/std buffers, SPP at 1/32 with bn_momentum 0.01/2, and the 3-step
    _Upsample ladder."""
    r18 = _reference_resnet18()
    torch.manual_seed(11)
    model = r18.ResNet_swift(r18.BasicBlock, [2, 2, 2, 2], efficient=False)
    model.train()
    with torch.no_grad():
        for i in range(2):
            g = torch.Generator().manual_seed(300 + i)
            model(torch.rand((2, 3, 256, 256), generator=g) * 255.0)
    model.eval()

    g = torch.Generator().manual_seed(7)
    x = torch.rand((1, 3, 256, 256), generator=g) * 255.0
    with torch.no_grad():
        want, _ = model(x.clone())  # forward_down normalizes in place

    from doubly_contrastive_semseg_tpu.models.swiftnet_single import SingleScaleSwiftNet

    m = SingleScaleSwiftNet(dtype=jnp.float32)
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    variables = _import_swift(model, m, (xj,), min_tensors=120)
    with jax.default_matmul_precision("highest"):
        got, _ = m.apply(variables, xj, train=False)
    assert got.shape == (1, 64, 64, 128)
    rel = _rel_err(got, want)
    assert rel < 2e-4, rel


def test_swiftnet_rgbd_forward_parity():
    """RGB-D ResNet (resnet_18.py:206-447, forward_down_fusion): both streams
    attenuated each stage, decoder skips = pre-attention RGB stage outputs, SPP over the fused layer-4 sum, no input normalization."""
    r18 = _reference_resnet18()
    torch.manual_seed(12)
    model = r18.ResNet(r18.BasicBlock, [2, 2, 2, 2], efficient=False)
    model.train()
    with torch.no_grad():
        for i in range(2):
            g = torch.Generator().manual_seed(310 + i)
            rgb = torch.rand((2, 3, 256, 256), generator=g)
            d = torch.rand((2, 256, 256), generator=g) * 80.0
            model(rgb, d)
    model.eval()

    g = torch.Generator().manual_seed(8)
    x = torch.rand((1, 3, 256, 256), generator=g)
    d = torch.rand((1, 256, 256), generator=g) * 80.0
    with torch.no_grad():
        want, _ = model(x, d)

    from doubly_contrastive_semseg_tpu.models.swiftnet_single import RGBDSwiftNet

    m = RGBDSwiftNet(dtype=jnp.float32)
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    dj = jnp.asarray(d.numpy())
    variables = _import_swift(model, m, (xj, dj), min_tensors=240)
    with jax.default_matmul_precision("highest"):
        got, _ = m.apply(variables, xj, dj, train=False)
    assert got.shape == (1, 64, 64, 128)
    rel = _rel_err(got, want)
    assert rel < 2e-4, rel


def test_swiftnet_hourglass_forward_parity():
    """ResNet_hourglass (resnet_18.py:449-651, forward_up_for_disp): the
    semantic upsample ladder plus the conv4a→deconv1b two-pass disparity
    hourglass over the (post-relu) stage outputs; conv_final exists but is never
    called, so it's deliberately not imported."""
    r18 = _reference_resnet18()
    torch.manual_seed(13)
    model = r18.ResNet_hourglass(r18.BasicBlock, [2, 2, 2, 2], efficient=False)
    model.train()
    with torch.no_grad():
        for i in range(2):
            g = torch.Generator().manual_seed(320 + i)
            model(torch.rand((2, 3, 256, 256), generator=g))
    model.eval()

    g = torch.Generator().manual_seed(9)
    x = torch.rand((1, 3, 256, 256), generator=g)
    with torch.no_grad():
        want_sem, want_disp, _ = model(x)

    from doubly_contrastive_semseg_tpu.models.swiftnet_single import HourglassSwiftNet

    m = HourglassSwiftNet(dtype=jnp.float32)
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    variables = _import_swift(model, m, (xj,), min_tensors=280)  # the full tree
    with jax.default_matmul_precision("highest"):
        got_sem, extra = m.apply(variables, xj, train=False)
    assert got_sem.shape == (1, 64, 64, 128)
    rel = _rel_err(got_sem, want_sem)
    assert rel < 2e-4, f"sem {rel}"
    rel = _rel_err(extra["disp_feat"], want_disp)
    assert rel < 2e-4, f"disp {rel}"


def test_efficientnet_trunk_matches_vendored_reference():
    """VERDICT r4 item 4: the EfficientNet-B0 MBConv trunk vs the reference's
    vendored ``efficientnet_pytorch`` (which runs standalone even though the
    reference's pyramid WIRING crashes, weathernet.py:68-70). Imports the
    torch blocks' weights into our MBConv stages and demands <2e-4 relative
    parity at EVERY stage boundary — covering swish, SE, TF-same asymmetric
    stride-2 padding (k=3 and k=5), and the BN eps=1e-3 semantics."""
    if "/root/reference/network" not in sys.path:
        sys.path.insert(0, "/root/reference/network")
    from efficientnet_pytorch import EfficientNet as TorchEffNet

    from doubly_contrastive_semseg_tpu.models.efficientnet_pyramid import (
        B0_BLOCKS, MBConv)

    torch.manual_seed(11)
    tm = TorchEffNet.from_name("efficientnet-b0")
    tm.eval()
    # BN running stats off init so the eval-mode normalization is non-trivial
    tm.train()
    with torch.no_grad():
        for i in range(2):
            g = torch.Generator().manual_seed(50 + i)
            x = torch.randn((2, 32, 112, 112), generator=g)
            for blk in tm._blocks:
                x = blk(x, drop_connect_rate=None)
    tm.eval()

    import flax.linen as nn

    class Trunk(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            outs = []
            total = sum(n for (_, _, n, _, _) in B0_BLOCKS)
            gidx = 0
            for si, (t, c, n, s, k) in enumerate(B0_BLOCKS):
                for bi in range(n):
                    x = MBConv(c, t, kernel=k, stride=(s if bi == 0 else 1),
                               drop_connect=0.2 * gidx / total,
                               name=f"stage{si}_{bi}")(x, train)
                    gidx += 1
                outs.append(x)
            return outs

    # weight import: torch _blocks[g] -> stage{si}_{bi}
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, stats = {}, {}

    def conv(tp, path, bias=False, depthwise=False):
        w = sd[tp + ".weight"]
        k = np.transpose(w, (2, 3, 1, 0))
        params_path = path + ("kernel",)
        node = params
        for kk in params_path[:-1]:
            node = node.setdefault(kk, {})
        node[params_path[-1]] = jnp.asarray(k)
        if bias:
            node["bias"] = jnp.asarray(sd[tp + ".bias"])

    def bn(tp, path):
        node_p, node_s = params, stats
        for kk in path[:-1]:
            node_p = node_p.setdefault(kk, {})
            node_s = node_s.setdefault(kk, {})
        node_p[path[-1]] = {"scale": jnp.asarray(sd[tp + ".weight"]),
                            "bias": jnp.asarray(sd[tp + ".bias"])}
        node_s[path[-1]] = {"mean": jnp.asarray(sd[tp + ".running_mean"]),
                            "var": jnp.asarray(sd[tp + ".running_var"])}

    gidx = 0
    for si, (t, c, n, s, k) in enumerate(B0_BLOCKS):
        for bi in range(n):
            name = f"stage{si}_{bi}"
            tp = f"_blocks.{gidx}"
            if t != 1:
                conv(tp + "._expand_conv", (name, "expand_conv"))
                bn(tp + "._bn0", (name, "bn0"))
            conv(tp + "._depthwise_conv", (name, "depthwise_conv"))
            bn(tp + "._bn1", (name, "bn1"))
            conv(tp + "._se_reduce", (name, "se_reduce"), bias=True)
            conv(tp + "._se_expand", (name, "se_expand"), bias=True)
            conv(tp + "._project_conv", (name, "project_conv"))
            bn(tp + "._bn2", (name, "bn2"))
            gidx += 1

    g = torch.Generator().manual_seed(77)
    x_t = torch.randn((1, 32, 112, 112), generator=g)
    with torch.no_grad():
        want, xt = [], x_t
        gi = 0
        for si, (t, c, n, s, k) in enumerate(B0_BLOCKS):
            for bi in range(n):
                xt = tm._blocks[gi](xt, drop_connect_rate=None)
                gi += 1
            want.append(xt.numpy())

    got = Trunk().apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(np.transpose(x_t.numpy(), (0, 2, 3, 1))), train=False)
    for si, (w, g_out) in enumerate(zip(want, got)):
        g_nchw = np.transpose(np.asarray(g_out), (0, 3, 1, 2))
        denom = max(np.abs(w).max(), 1e-6)
        rel = np.abs(g_nchw - w).max() / denom
        assert rel < 2e-4, f"stage {si}: rel diff {rel:.2e}"
