"""Legacy stereo feature extractors + RODSNet-era segmentation heads
(reference ``network/feature.py:36-1163``, ``network/segmentation.py:9-457``)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from doubly_contrastive_semseg_tpu.models.stereo_features import (  # noqa: E402
    FeaturePyramid,
    FeaturePyramidNetwork,
    GANetFeature,
    MobileNetV2Feature,
    make_stereo_feature,
)
from doubly_contrastive_semseg_tpu.models.legacy_segmentation import (  # noqa: E402
    DisparityFeature,
    SegmentationBranches,
    SegmentationDeeplabV3,
    SimpleSegmentation,
)


def _img(rng, h=48, w=48):
    return jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32))


def _run(m, *args, **kw):
    v = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, *args, train=True, **kw)
    out = m.apply(v, *args, train=False, **kw)
    return out


@pytest.mark.parametrize("kind,div,ch", [
    ("stereonet", 8, 32), ("psmnet", 4, 32), ("gcnet", 2, 32)])
def test_plain_feature_extractors(rng, kind, div, ch):
    h = w = 64
    out = _run(make_stereo_feature(kind), _img(rng, h, w))
    assert out.shape == (1, h // div, w // div, ch)
    assert np.isfinite(np.asarray(out)).all()


def test_ganet_feature_list(rng):
    # GANet: /3 trunk; 48 divides evenly through the U-net (reference
    # docstring: "Height and width need to be divided by 48")
    out = _run(GANetFeature(), _img(rng, 48, 48))
    assert len(out) == 6  # reference returns the 6-feature list
    assert out[-1].shape == (1, 16, 16, 32)  # 32 ch @ 1/3


def test_feature_pyramids(rng):
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 32)).astype(np.float32))
    outs = _run(FeaturePyramid(), x)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 32), (1, 8, 8, 64), (1, 4, 4, 128)]

    fpn = FeaturePyramidNetwork(out_channels=64)
    outs2 = _run(fpn, outs)
    assert all(o.shape[-1] == 64 for o in outs2)
    assert [o.shape[1] for o in outs2] == [16, 8, 4]


@pytest.mark.slow
def test_mobilenetv2_feature_stages(rng):
    feats = _run(MobileNetV2Feature(), _img(rng, 64, 64))
    # 6-stage list: 16@1, 16/2, 24/4, 32/8, 96/16, 320/16(dilated)
    assert [f.shape[-1] for f in feats] == [16, 16, 24, 32, 96, 320]
    assert feats[0].shape[1] == 64  # input resolution
    assert feats[5].shape[1] == 4  # 64/16

    feats_hg = _run(MobileNetV2Feature(decoder="hourglass"), _img(rng, 64, 64))
    assert feats_hg[-1].shape == (1, 16, 16, 24)  # decoded back to /4


def test_legacy_segmentation_heads(rng):
    feats = _run(MobileNetV2Feature(), _img(rng, 64, 64))
    seg = _run(SegmentationBranches(num_classes=19), feats)
    assert seg.shape == (1, 32, 32, 19)  # classes @ 1/2

    seg3 = _run(SegmentationDeeplabV3(num_classes=19), feats[5], (64, 64))
    assert seg3.shape == (1, 64, 64, 19)

    x32 = jnp.asarray(rng.standard_normal((1, 16, 16, 32)).astype(np.float32))
    for depth in (1, 2, 3):
        s = _run(SimpleSegmentation(num_classes=19, depth=depth), x32)
        assert s.shape == (1, 16, 16, 19)


@pytest.mark.slow  # legacy RODSNet head; plain extractors cover the module fast
def test_disparity_feature_head(rng):
    # needs /48-divisible full-res for the internal GANet U-net after the
    # decoder returns to input resolution
    feats = _run(MobileNetV2Feature(), _img(rng, 96, 96))
    out = _run(DisparityFeature(), feats)
    assert out.shape == (1, 32, 32, 32)  # 32 ch @ 1/3
