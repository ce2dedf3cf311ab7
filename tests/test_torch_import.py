"""Weight-surgery tests: synthetic torchvision-layout state dicts are
converted and overlaid onto flax modules, then the module must run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from affganwriting_tpu.models.style_encoders.resnet import ResNet50StyleEncoder
from affganwriting_tpu.utils.torch_import import (
    expand_first_conv,
    merge_pretrained,
    resnet50_to_flax,
)


def _fake_resnet50_sd(rng):
    """State dict with torchvision resnet50 names/shapes (random values)."""
    sd = {}

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = rng.normal(size=(o, i, k, k)).astype(np.float32)

    def bn(name, c):
        sd[f"{name}.weight"] = np.ones(c, np.float32)
        sd[f"{name}.bias"] = np.zeros(c, np.float32)
        sd[f"{name}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{name}.running_var"] = np.ones(c, np.float32)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    spec = [("layer1", 3, 64, 64), ("layer2", 4, 256, 128),
            ("layer3", 6, 512, 256), ("layer4", 3, 1024, 512)]
    for layer, n, cin, w in spec:
        for bi in range(n):
            b_in = cin if bi == 0 else w * 4
            conv(f"{layer}.{bi}.conv1", w, b_in, 1)
            bn(f"{layer}.{bi}.bn1", w)
            conv(f"{layer}.{bi}.conv2", w, w, 3)
            bn(f"{layer}.{bi}.bn2", w)
            conv(f"{layer}.{bi}.conv3", w * 4, w, 1)
            bn(f"{layer}.{bi}.bn3", w * 4)
            if bi == 0:
                conv(f"{layer}.{bi}.downsample.0", w * 4, b_in, 1)
                bn(f"{layer}.{bi}.downsample.1", w * 4)
    return sd


def test_expand_first_conv():
    w = np.arange(2 * 3 * 7 * 7, dtype=np.float32).reshape(2, 3, 7, 7)
    out = expand_first_conv(w, 50)
    assert out.shape == (2, 50, 7, 7)
    np.testing.assert_array_equal(out[:, :3], w)
    np.testing.assert_array_equal(out[:, 10], w[:, 0])


def test_resnet50_conversion_runs():
    rng = np.random.default_rng(0)
    sd = _fake_resnet50_sd(rng)
    params, stats = resnet50_to_flax(sd, in_channels=50)

    enc = ResNet50StyleEncoder(dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(1, 64, 216, 50)), jnp.float32)
    init_vars = enc.init(jax.random.key(0), x)
    merged = merge_pretrained(init_vars, params, stats)
    pyramid = enc.apply(merged, x)
    assert pyramid[-1].shape == (1, 8, 27, 512)
    # the imported conv1 kernel landed (flax layout check)
    got = np.asarray(merged["params"]["conv1"]["kernel"])
    assert got.shape == (7, 7, 50, 64)
    np.testing.assert_allclose(
        got[:, :, :3, :],
        np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))
