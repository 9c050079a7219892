"""Torch→Flax weight conversion: synthetic torchvision-style resnet18 state
dict must land in the pyramid backbone with bn1 fanned out to all 3 stem BNs."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from doubly_contrastive_semseg_tpu.models import DCSSModel  # noqa: E402
from doubly_contrastive_semseg_tpu.utils.torch_convert import load_pretrained  # noqa: E402

RESNET18_BLOCKS = {1: (2, 64, 64), 2: (2, 64, 128), 3: (2, 128, 256), 4: (2, 256, 512)}


def _fake_torchvision_resnet18(seed=0):
    """State dict with torchvision resnet18 key names and shapes."""
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def conv(name, o, i, k):
        sd[name] = torch.randn((o, i, k, k), generator=g)

    def bn(name, c):
        sd[f"{name}.weight"] = torch.randn((c,), generator=g)
        sd[f"{name}.bias"] = torch.randn((c,), generator=g)
        sd[f"{name}.running_mean"] = torch.randn((c,), generator=g)
        sd[f"{name}.running_var"] = torch.rand((c,), generator=g) + 0.5
        sd[f"{name}.num_batches_tracked"] = torch.tensor(0)

    conv("conv1.weight", 64, 3, 7)
    bn("bn1", 64)
    for s, (n, c_in, c_out) in RESNET18_BLOCKS.items():
        for b in range(n):
            i = c_in if b == 0 else c_out
            conv(f"layer{s}.{b}.conv1.weight", c_out, i, 3)
            bn(f"layer{s}.{b}.bn1", c_out)
            conv(f"layer{s}.{b}.conv2.weight", c_out, c_out, 3)
            bn(f"layer{s}.{b}.bn2", c_out)
            if b == 0 and c_in != c_out:
                conv(f"layer{s}.{b}.downsample.0.weight", c_out, c_in, 1)
                bn(f"layer{s}.{b}.downsample.1", c_out)
    sd["fc.weight"] = torch.randn((1000, 512), generator=g)
    sd["fc.bias"] = torch.randn((1000,), generator=g)
    return sd


def test_load_torchvision_resnet18(tmp_path):
    sd = _fake_torchvision_resnet18()
    path = str(tmp_path / "resnet18.pth")
    torch.save(sd, path)

    model = DCSSModel(backbone="resnet18", num_classes=19, weather_num=4,
                      dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=False)

    params, stats, n = load_pretrained(v["params"], v["batch_stats"], path)
    assert n > 80  # all trunk convs + bns landed

    fe = params["net"]["feature_extractor"]
    fe_s = stats["net"]["feature_extractor"]
    # stem: transposed (O,I,7,7) -> (7,7,3,64) -> s2d (4,4,12,64)
    from doubly_contrastive_semseg_tpu.ops.input_pipeline import (
        stem_s2d_kernel_from_dense)

    want = stem_s2d_kernel_from_dense(
        sd["conv1.weight"].numpy().transpose(2, 3, 1, 0))
    np.testing.assert_allclose(np.asarray(fe["conv1"]["kernel"]), want, rtol=1e-6)
    # bn1 fanned out to all three stem BNs (resnet_pyramid.py:388-393)
    for lvl in range(3):
        np.testing.assert_allclose(np.asarray(fe[f"bn1_{lvl}"]["scale"]),
                                   sd["bn1.weight"].numpy(), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(fe_s[f"bn1_{lvl}"]["mean"]),
                                   sd["bn1.running_mean"].numpy(), rtol=1e-6)
    # block weights landed
    np.testing.assert_allclose(
        np.asarray(fe["layer2_0"]["downsample_conv"]["kernel"]),
        sd["layer2.0.downsample.0.weight"].numpy().transpose(2, 3, 1, 0), rtol=1e-6)
    # decoder (random-init parts) untouched: still equal to fresh init
    np.testing.assert_allclose(
        np.asarray(fe["upsample_bottlenecks1"]["kernel"]),
        np.asarray(v["params"]["net"]["feature_extractor"]["upsample_bottlenecks1"]["kernel"]))
    # the model still runs with converted weights
    out = model.apply({"params": params, "batch_stats": stats}, x, train=False)
    assert np.isfinite(np.asarray(out["seg"])).all()
