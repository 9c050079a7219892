"""Legacy stereo surface: 3D-conv aggregation family + refinement family
(reference ``network/aggregation.py:70-311`` and ``refinement.py:62-1093``)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from doubly_contrastive_semseg_tpu.models.stereo_extras import (  # noqa: E402
    REFINE_NEW_VARIANTS,
    GCNetAggregation,
    HourglassRefinement,
    PSMNetBasicAggregation,
    PSMNetHGAggregation,
    SemRefine,
    StereoDRNetRefinement,
    StereoNetAggregation,
    make_aggregation,
    make_refinement,
    volume_to_ndhwc,
)
from doubly_contrastive_semseg_tpu.ops.cost_volume import (  # noqa: E402
    concat_cost_volume,
    difference_cost_volume,
    soft_argmin_disparity,
)


def _vol(rng, b=1, h=8, w=16, d=6, c=8, mode="concat"):
    left = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    right = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    v = (concat_cost_volume if mode == "concat" else difference_cost_volume)(
        left, right, d)
    return volume_to_ndhwc(v)  # (B, D, H, W, C or 2C)


def test_stereonet_aggregation_shape(rng):
    vol = _vol(rng, mode="difference")
    m = StereoNetAggregation(channels=8)
    v = m.init(jax.random.PRNGKey(0), vol, True)
    out = m.apply(v, vol, False, mutable=["batch_stats"])[0]
    assert out.shape == (1, 8, 16, 6)
    assert np.isfinite(np.asarray(out)).all()
    # a (B, H, W, D) volume feeds soft-argmin directly
    disp = soft_argmin_disparity(out)
    assert disp.shape == (1, 8, 16)


def test_psmnet_basic_aggregation_upsamples_4x(rng):
    vol = _vol(rng, c=32, mode="concat")  # 64-ch concat volume (PSMNet)
    m = PSMNetBasicAggregation(channels=8)
    v = m.init(jax.random.PRNGKey(0), vol, True)
    out = m.apply(v, vol, False, mutable=["batch_stats"])[0]
    assert out.shape == (1, 32, 64, 24)  # ×4 in H, W and D
    assert np.isfinite(np.asarray(out)).all()


def test_psmnet_hg_aggregation_deep_supervision(rng):
    vol = _vol(rng, h=8, w=8, d=4, c=32, mode="concat")
    m = PSMNetHGAggregation(channels=8)
    v = m.init(jax.random.PRNGKey(0), vol, True)
    outs_train, _ = m.apply(v, vol, True, mutable=["batch_stats"])
    assert len(outs_train) == 3  # classif1..3 (aggregation.py:236-256)
    outs_eval = m.apply(v, vol, False, mutable=["batch_stats"])[0]
    assert len(outs_eval) == 1
    assert outs_eval[0].shape == (1, 32, 32, 16)


@pytest.mark.slow  # heaviest 3D-conv aggregation; stereonet/psmnet cover the family fast
def test_gcnet_aggregation_doubles_resolution(rng):
    vol = _vol(rng, h=16, w=16, d=32, c=8, mode="concat")
    m = GCNetAggregation()
    v = m.init(jax.random.PRNGKey(0), vol, True)
    out = m.apply(v, vol, False, mutable=["batch_stats"])[0]
    assert out.shape == (1, 32, 32, 64)  # GCNet: half-res volume → full res


@pytest.mark.parametrize("kind", [
    "stereodrnet", pytest.param("hourglass", marks=pytest.mark.slow)])
def test_warp_error_refinements(rng, kind):
    left = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    right = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    disp = jnp.asarray(rng.uniform(0, 4, (1, 8, 8)).astype(np.float32))
    m = make_refinement(kind)
    v = m.init(jax.random.PRNGKey(0), disp, left, right, True)
    out = m.apply(v, disp, left, right, False, mutable=["batch_stats"])[0]
    assert out.shape == (1, 32, 32)
    assert (np.asarray(out) >= 0).all()  # final relu


@pytest.mark.parametrize("kind", [
    k if k in ("disp_sem", "new1") else pytest.param(k, marks=pytest.mark.slow)
    for k in sorted(REFINE_NEW_VARIANTS)])
def test_semantic_refinement_family(rng, kind):
    """Every Refine_disp_sem / Refine_New variant: returns (disp at full res,
    sem features) on a low-res disparity + 128-ch semantic features."""
    cfg = REFINE_NEW_VARIANTS[kind]
    h = w = 64  # stem /4 then a 4-level U-net: needs /16 after the stem
    left = jnp.asarray(rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32))
    sem = jnp.asarray(rng.standard_normal((1, h // 4, w // 4, 128)).astype(np.float32))
    dc = cfg.get("disp_in_channels", 1)
    disp = jnp.asarray(
        rng.uniform(0, 4, (1, h // 4, w // 4, dc)).astype(np.float32))
    m = make_refinement(kind)
    v = m.init(jax.random.PRNGKey(0), disp, left, sem, True)
    (out_disp, out_sem), _ = m.apply(v, disp, left, sem, False,
                                     mutable=["batch_stats"])
    assert out_disp.shape == (1, h, w)
    assert out_sem.shape[-1] == 128
    if cfg.get("raw_disp_head"):
        # New5/9/12 return the raw learned map: the reference comments out
        # the residual+relu+scale epilogue (refinement.py:752-757), so
        # negative values are legitimate there
        assert np.isfinite(np.asarray(out_disp)).all()
    else:
        assert (np.asarray(out_disp) >= 0).all()


@pytest.mark.parametrize("agg", ["stereonet", "psmnet_basic"])
def test_stereo_dcss_with_3dconv_aggregation(rng, agg):
    """StereoDCSS end-to-end with the 3D-conv aggregation paths whose depth
    budget fits a 16-bin test volume (GCNet needs D >= 32 — 5 stride-2
    stages — and is covered standalone above)."""
    from doubly_contrastive_semseg_tpu.models.stereo import StereoDCSS

    left = jnp.asarray(rng.uniform(0, 255, (1, 64, 64, 3)).astype(np.float32))
    right = jnp.asarray(rng.uniform(0, 255, (1, 64, 64, 3)).astype(np.float32))
    m = StereoDCSS(max_disp=16, num_classes=19, aggregation_type=agg,
                   refinement_type="stereonet", train_semantic=False)
    v = m.init(jax.random.PRNGKey(0), left, right, train=False)
    out = m.apply(v, left, right, train=False)
    assert out["disp"].shape == (1, 64, 64)
    assert np.isfinite(np.asarray(out["disp"])).all()


def test_composed_disp_head_equals_chain(rng):
    """The eval-time composed ×4 disparity head (one 3×3 16-phase conv +
    depth-to-space, ``_composed_disp_head``) equals running the literal
    deconv→deconv→3×3 chain — everywhere, including the SAME-crop border
    bands it re-stitches from strip runs."""
    from flax import linen as nn

    from doubly_contrastive_semseg_tpu.models.stereo_extras import (
        _composed_disp_head)

    class Chain(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.ConvTranspose(32, (4, 4), strides=(2, 2), padding="SAME",
                                 use_bias=False, name="d1")(x)
            x = nn.ConvTranspose(32, (4, 4), strides=(2, 2), padding="SAME",
                                 use_bias=False, name="d2")(x)
            return nn.Conv(1, (3, 3), use_bias=True, name="fd")(x)

    mod = Chain()
    v = mod.init(jax.random.PRNGKey(0), jnp.ones((1, 16, 16, 32)))
    leaves, treedef = jax.tree_util.tree_flatten(v)
    leaves = [jax.random.normal(jax.random.PRNGKey(i), l.shape, l.dtype) * 0.2
              for i, l in enumerate(leaves)]
    v = jax.tree_util.tree_unflatten(treedef, leaves)

    x = jnp.asarray(rng.standard_normal((2, 24, 40, 32)).astype(np.float32))
    ref = mod.apply(v, x)
    got = _composed_disp_head(lambda a: mod.apply(v, a), x)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-4, rtol=1e-4)
