"""Torch-oracle parity for the stereo families (VERDICT r3 item #4).

The reference's stereo stack (``network/aggregation.py``,
``network/refinement.py``, ``network/feature.py``) was re-designed
channels-last — these tests import REFERENCE modules (torch CPU), randomize
every parameter (offset convs included, so the deformable path is exercised
OFF its zero-init), convert the state dict, and demand <2e-4 relative output
parity.

The reference's CUDA deform conv cannot run here; ``_install_deform_stub``
provides a naive-CPU ``network.deform_conv`` with the documented DCNv2
semantics (zero padding outside, per-group bilinear sampling, mask
modulation — ``deform_conv_torch1.10/src/deform_conv_cuda_kernel.cu``).
Both sides implement that spec independently, so this is a genuine
cross-check of our gather formulation, not a self-comparison.
"""

import math
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "network")),
    reason="reference repo not available")


# ---------------------------------------------------------------- stub

def _bilinear_zero_pad(x, ys, xs):
    """x (B, C, H, W) sampled at fractional (ys, xs) of (B, Ho, Wo) →
    (B, C, Ho, Wo); corners outside the image contribute 0."""
    b, c, h, w = x.shape
    y0, x0 = ys.floor(), xs.floor()
    wy, wx = ys - y0, xs - x0
    flat = x.reshape(b, c, h * w)
    out = torch.zeros(b, c, *ys.shape[1:], dtype=x.dtype)
    for dy in (0, 1):
        for dx in (0, 1):
            yy, xx = y0 + dy, x0 + dx
            wgt = ((1 - wy) if dy == 0 else wy) * ((1 - wx) if dx == 0 else wx)
            valid = (yy >= 0) & (yy <= h - 1) & (xx >= 0) & (xx <= w - 1)
            idx = (yy.clamp(0, h - 1) * w + xx.clamp(0, w - 1)).long()
            idx = idx.reshape(b, 1, -1).expand(b, c, idx[0].numel())
            vals = torch.gather(flat, 2, idx).reshape(b, c, *ys.shape[1:])
            out = out + torch.where(valid, wgt, torch.zeros(()))[:, None] * vals
    return out


def _naive_mdconv(x, offset, mask, weight, bias, stride, padding, dilation,
                  groups, deformable_groups):
    """DCNv2 forward on CPU, channel layout per the CUDA kernel: offset
    channel ``g*2K + 2k`` = Δy of group g tap k, ``+1`` = Δx; mask channel
    ``g*K + k``."""
    assert groups == 1
    b, c, h, w = x.shape
    out_c, _, kh, kw = weight.shape
    s, p, d = stride, padding, dilation
    ho = (h + 2 * p - d * (kh - 1) - 1) // s + 1
    wo = (w + 2 * p - d * (kw - 1) - 1) // s + 1
    k_total = kh * kw
    dg = deformable_groups
    cg = c // dg
    oy = (torch.arange(ho) * s - p).float().view(1, -1, 1)
    ox = (torch.arange(wo) * s - p).float().view(1, 1, -1)

    cols = torch.zeros(b, c, k_total, ho, wo, dtype=x.dtype)
    for g in range(dg):
        for ki in range(kh):
            for kj in range(kw):
                k = ki * kw + kj
                dy = offset[:, g * 2 * k_total + 2 * k]
                dx = offset[:, g * 2 * k_total + 2 * k + 1]
                ys = oy + ki * d + dy
                xs = ox + kj * d + dx
                v = _bilinear_zero_pad(x[:, g * cg:(g + 1) * cg], ys, xs)
                if mask is not None:
                    v = v * mask[:, g * k_total + k][:, None]
                cols[:, g * cg:(g + 1) * cg, k] = v
    out = torch.einsum("bckhw,ock->bohw", cols, weight.reshape(out_c, c, k_total))
    if bias is not None:
        out = out + bias.view(1, -1, 1, 1)
    return out


def _install_deform_stub():
    """``network/deform.py`` imports ``network.deform_conv`` — a package name
    that only exists as the CUDA source tree (``deform_conv_torch1.10``).
    Provide the two module classes with the reference's parameter names and
    init (``deform_conv_torch1.10/deform_conv.py:191-333``)."""
    if "network.deform_conv" in sys.modules:
        return
    import torch.nn as tnn

    mod = types.ModuleType("network.deform_conv")

    class ModulatedDeformConv(tnn.Module):
        def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                     padding=0, dilation=1, groups=1, deformable_groups=1,
                     bias=True):
            super().__init__()
            self.stride, self.padding, self.dilation = stride, padding, dilation
            self.groups, self.deformable_groups = groups, deformable_groups
            ks = (kernel_size, kernel_size) if isinstance(kernel_size, int) \
                else kernel_size
            self.weight = tnn.Parameter(
                torch.Tensor(out_channels, in_channels // groups, *ks))
            if bias:
                self.bias = tnn.Parameter(torch.Tensor(out_channels))
            else:
                self.register_parameter("bias", None)
            n = in_channels * ks[0] * ks[1]
            stdv = 1.0 / math.sqrt(n)
            self.weight.data.uniform_(-stdv, stdv)
            if self.bias is not None:
                self.bias.data.zero_()

        def forward(self, x, offset, mask):
            return _naive_mdconv(x, offset, mask, self.weight, self.bias,
                                 self.stride, self.padding, self.dilation,
                                 self.groups, self.deformable_groups)

    class DeformConv(ModulatedDeformConv):
        def __init__(self, *a, **kw):
            kw.setdefault("bias", False)
            super().__init__(*a, **kw)

        def forward(self, x, offset):
            return _naive_mdconv(x, offset, None, self.weight, self.bias,
                                 self.stride, self.padding, self.dilation,
                                 self.groups, self.deformable_groups)

    mod.ModulatedDeformConv = ModulatedDeformConv
    mod.DeformConv = DeformConv
    sys.modules["network.deform_conv"] = mod


def _reference_modules():
    from test_reference_parity import _install_torchvision_stubs

    _install_torchvision_stubs()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import network  # noqa: F401  (registers the package)

    _install_deform_stub()
    # refinement.py:9 imports a git submodule that is absent from the
    # reference checkout itself; only Refine_New3 instantiates it
    # (refinement.py:509) — stub the import, never construct New3 here
    if "network.nystrom_attention" not in sys.modules:
        leaf = types.ModuleType(
            "network.nystrom_attention.nystrom_attention.nystrom_attention")

        class NystromAttention:  # pragma: no cover - import-time only
            def __init__(self, *a, **k):
                raise RuntimeError("nystrom submodule absent from reference")

        leaf.NystromAttention = NystromAttention
        pkg = types.ModuleType("network.nystrom_attention")
        sub = types.ModuleType("network.nystrom_attention.nystrom_attention")
        sub.nystrom_attention = leaf
        pkg.nystrom_attention = sub
        sys.modules["network.nystrom_attention"] = pkg
        sys.modules["network.nystrom_attention.nystrom_attention"] = sub
        sys.modules[
            "network.nystrom_attention.nystrom_attention.nystrom_attention"] = leaf
    import network.aggregation as agg
    import network.refinement as refine
    return agg, refine


def _randomize(model: "torch.nn.Module", seed: int, offset_scale=0.3):
    """Random params everywhere — incl. offset convs (zero-init in the
    reference, deliberately perturbed here so deform sampling is off-grid)
    and BN running stats."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "offset_conv" in name:
                p.copy_(torch.randn(p.shape, generator=g) * offset_scale /
                        max(1.0, float(np.prod(p.shape[1:]))) ** 0.5)
            else:
                p.copy_(torch.randn(p.shape, generator=g) * 0.1)
        for name, s_ in model.named_buffers():
            if "running_mean" in name:
                s_.copy_(torch.randn(s_.shape, generator=g) * 0.05)
            elif "running_var" in name:
                s_.copy_(1.0 + 0.2 * torch.rand(s_.shape, generator=g))
    model.eval()
    return model


def _rel_err(a, b):
    return float(np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-6))


# ---------------------------------------------------------------- tests

def test_deform_conv2d_wrapper_oracle():
    """The full DeformConv2d wrapper (grouped offset conv → global 2/3 split
    → sigmoid ×2 mask → DCNv2) vs the reference wrapper on random weights."""
    agg, _ = _reference_modules()
    from network.deform import DeformConv2d as RefDeformConv2d

    from doubly_contrastive_semseg_tpu.ops.deform_conv import DeformConv2d
    from doubly_contrastive_semseg_tpu.utils.torch_convert import (
        _deform_conv2d_entries)

    torch.manual_seed(0)
    ref = RefDeformConv2d(8, 8, kernel_size=3, stride=1, padding=2,
                          dilation=2, deformable_groups=2, modulation=True,
                          double_mask=True, bias=False)
    _randomize(ref, 1)

    x = torch.randn(2, 8, 13, 17, generator=torch.Generator().manual_seed(2))
    want = ref(x).detach().numpy()

    ours = DeformConv2d(8, kernel_size=3, stride=1, padding=2, dilation=2,
                        deformable_groups=2, impl="gather")
    xn = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    ours.init(jax.random.PRNGKey(0), xn)
    sd = {f"m.{k}": v_.detach() for k, v_ in ref.state_dict().items()}
    params2 = {}
    _deform_conv2d_entries(sd, "m", params2, ())
    got = ours.apply({"params": params2}, xn)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert _rel_err(got, want) < 2e-4, _rel_err(got, want)


@pytest.mark.parametrize("num_scales,intermediate", [(3, True), (1, True)])
def test_adaptive_aggregation_oracle(num_scales, intermediate):
    """AdaptiveAggregation (aggregation.py:406-467): ISA simple+deform
    bottlenecks, CSA up/down fuse chains, final convs — imported weights,
    <2e-4 on every output scale."""
    agg, _ = _reference_modules()
    from doubly_contrastive_semseg_tpu.models.stereo import AdaptiveAggregation
    from doubly_contrastive_semseg_tpu.utils.torch_convert import (
        convert_reference_adaptive_aggregation)

    max_disp, b, h, w = 16, 2, 16, 24
    torch.manual_seed(0)
    ref = agg.AdaptiveAggregation(
        max_disp=max_disp, num_scales=num_scales, num_fusions=3,
        num_stage_blocks=1, num_deform_blocks=1,
        intermediate_supervision=intermediate,
        deformable_groups=2, mdconv_dilation=2)
    _randomize(ref, 3)

    g = torch.Generator().manual_seed(4)
    vols_t = [torch.randn(b, max_disp // 2 ** i, h // 2 ** i, w // 2 ** i,
                          generator=g) for i in range(num_scales)]
    want = [o.detach().numpy() for o in ref([v.clone() for v in vols_t])]

    ours = AdaptiveAggregation(
        num_scales=num_scales, num_fusions=3, num_stage_blocks=1,
        num_deform_blocks=1, intermediate_supervision=intermediate,
        deformable_groups=2, mdconv_dilation=2, deform_impl="gather")
    vols_j = [jnp.asarray(v.numpy().transpose(0, 2, 3, 1)) for v in vols_t]
    variables = ours.init(jax.random.PRNGKey(0), vols_j, False)
    sd = {k: v_.detach() for k, v_ in ref.state_dict().items()}
    params, stats = convert_reference_adaptive_aggregation(sd)
    got = ours.apply({"params": params, "batch_stats": stats}, vols_j, False)

    assert len(got) == len(want)
    for i, (g_, w_) in enumerate(zip(got, want)):
        g_ = np.asarray(g_).transpose(0, 3, 1, 2)
        assert g_.shape == w_.shape
        assert _rel_err(g_, w_) < 2e-4, f"scale {i}: {_rel_err(g_, w_)}"
    # converted tree covers the init tree exactly (no silently-missing params)
    flat_init = jax.tree_util.tree_leaves(variables["params"])
    flat_conv = jax.tree_util.tree_leaves(params)
    assert len(flat_init) == len(flat_conv)


def _import_and_check(ours, ref, inputs_j, want, seed=7):
    """Init ours, convert ref weights, apply, compare (<2e-4, NCHW basis)."""
    from doubly_contrastive_semseg_tpu.utils.torch_convert import (
        convert_reference_refinement)

    variables = ours.init(jax.random.PRNGKey(0), *inputs_j, False)
    sd = {k: v_.detach() for k, v_ in ref.state_dict().items()}
    params, stats = convert_reference_refinement(sd)
    assert len(jax.tree_util.tree_leaves(params)) == \
        len(jax.tree_util.tree_leaves(variables["params"]))
    got = ours.apply({"params": params, "batch_stats": stats}, *inputs_j, False)
    if not isinstance(got, tuple):
        got = (got,)
    assert len(got) == len(want)
    for i, (g_, w_) in enumerate(zip(got, want)):
        g_ = np.asarray(g_)
        if g_.ndim == 4:  # NHWC → NCHW
            g_ = g_.transpose(0, 3, 1, 2)
        assert g_.shape == w_.shape, (g_.shape, w_.shape)
        assert _rel_err(g_, w_) < 2e-4, f"output {i}: {_rel_err(g_, w_)}"


def test_hourglass_refinement_oracle():
    """HourglassRefinement (refinement.py:111-204): warp-error encoders, the
    deformable conv_start/conv3a/conv4a, the twin Conv2x decoder passes."""
    _, refine = _reference_modules()
    from doubly_contrastive_semseg_tpu.models.stereo_extras import (
        HourglassRefinement)

    torch.manual_seed(0)
    ref = _randomize(refine.HourglassRefinement(device="cpu"), 11)

    b, h, w = 1, 32, 48
    g = torch.Generator().manual_seed(12)
    low = torch.rand(b, h // 4, w // 4, generator=g) * 3
    left = torch.randn(b, 3, h, w, generator=g)
    right = torch.randn(b, 3, h, w, generator=g)
    want = ref(low, left, right).detach().numpy()

    ours = HourglassRefinement()
    inputs = (jnp.asarray(low.numpy()),
              jnp.asarray(left.numpy().transpose(0, 2, 3, 1)),
              jnp.asarray(right.numpy().transpose(0, 2, 3, 1)))
    _import_and_check(ours, ref, inputs, (want,))


@pytest.mark.parametrize("variant", ["new1", "new9"])
def test_refine_new_oracle(variant):
    """Refine_New1 / Refine_New9 (refinement.py:302-403, 765-869) against the
    one parameterized SemRefine skeleton — proves the consolidation claim on
    imported weights: stem, conv/bn/leaky encoders, attention gates (New9),
    Conv2x U-net, bare transposed-conv heads, raw-vs-residual epilogues."""
    _, refine = _reference_modules()
    from doubly_contrastive_semseg_tpu.models.stereo_extras import (
        REFINE_NEW_VARIANTS, SemRefine)

    torch.manual_seed(0)
    cls = {"new1": refine.Refine_New1, "new9": refine.Refine_New9}[variant]
    ref = _randomize(cls(num_class=19), 13)

    b, h, w = 1, 64, 128  # the U-net runs at H/4 with 4 halvings → /64
    g = torch.Generator().manual_seed(14)
    left = torch.randn(b, 3, h, w, generator=g)
    sem = torch.randn(b, 128, h // 4, w // 4, generator=g)
    if variant == "new9":  # disp FEATURES, 48ch (refinement.py:784-786)
        low = torch.randn(b, 48, h // 4, w // 4, generator=g)
        low_j = jnp.asarray(low.numpy().transpose(0, 2, 3, 1))
    else:
        low = torch.rand(b, h // 4, w // 4, generator=g) * 3
        low_j = jnp.asarray(low.numpy())
    disp_t, sem_t = ref(low, left, sem)
    disp_t = disp_t.detach().numpy()
    if disp_t.ndim == 4:  # raw heads return [B, 1, H, W] (never squeezed)
        disp_t = disp_t[:, 0]
    want = (disp_t, sem_t.detach().numpy())

    ours = SemRefine(**REFINE_NEW_VARIANTS[variant])
    inputs = (low_j, jnp.asarray(left.numpy().transpose(0, 2, 3, 1)),
              jnp.asarray(sem.numpy().transpose(0, 2, 3, 1)))
    _import_and_check(ours, ref, inputs, want)


@pytest.mark.parametrize("training", [False, True])
def test_psmnet_hg_aggregation_oracle(training):
    """PSMNetHGAggregation (aggregation.py:194-258): the channels-last 3-D
    conv rewrite — stacked hourglasses with pre/post skip reuse, transposed
    3-D convs, deep-supervision heads, ×4 trilinear volume upsample."""
    agg, _ = _reference_modules()
    from doubly_contrastive_semseg_tpu.models.stereo_extras import (
        PSMNetHGAggregation)
    from doubly_contrastive_semseg_tpu.utils.torch_convert import (
        convert_reference_psmnet_hg)

    torch.manual_seed(0)
    ref = _randomize(agg.PSMNetHGAggregation(max_disp=32), 21)
    ref.train(training)

    b, d4, h4, w4 = 1, 8, 8, 12  # D/4, H/4, W/4 (needs /4 inside)
    g = torch.Generator().manual_seed(22)
    vol = torch.randn(b, 64, d4, h4, w4, generator=g)
    want = [o.detach().numpy() for o in ref(vol.clone())]

    ours = PSMNetHGAggregation()
    vol_j = jnp.asarray(vol.numpy().transpose(0, 2, 3, 4, 1))  # NDHWC
    variables = ours.init(jax.random.PRNGKey(0), vol_j, training)
    sd = {k: v_.detach() for k, v_ in ref.state_dict().items()}
    params, stats = convert_reference_psmnet_hg(sd)
    assert len(jax.tree_util.tree_leaves(params)) == \
        len(jax.tree_util.tree_leaves(variables["params"]))
    # our train flag only switches BN; the reference's .training also gates
    # deep supervision — match eval-mode BN stats by passing train=False and
    # slicing outputs instead when training=False
    got = ours.apply({"params": params, "batch_stats": stats}, vol_j, training,
                     **({"mutable": ["batch_stats"]} if training else {}))
    if training:
        got = got[0]
    assert len(got) == len(want)
    for i, (g_, w_) in enumerate(zip(got, want)):
        g_ = np.asarray(g_).transpose(0, 3, 1, 2)  # (B,H,W,D) → (B,D,H,W)
        assert g_.shape == w_.shape, (g_.shape, w_.shape)
        assert _rel_err(g_, w_) < 2e-4, f"output {i}: {_rel_err(g_, w_)}"
