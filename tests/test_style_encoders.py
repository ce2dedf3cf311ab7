"""Every registered style backbone must emit a decoder-compatible pyramid:
taps[3] and taps[4] are 512-channel (iAFF skips), last tap is (H/8, W/8, 512).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from affganwriting_tpu.models.style_encoders import available, get_style_encoder

SMALL_HW = (32, 104)  # keeps CPU compile cheap; geometry-generic modules


@pytest.mark.parametrize("name", available())
def test_backbone_pyramid_contract(name):
    enc = get_style_encoder(
        name, dtype=jnp.float32,
        final_hw=(SMALL_HW[0] // 8, SMALL_HW[1] // 8))
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, *SMALL_HW, 50)),
        jnp.float32)
    variables = enc.init(jax.random.key(0), x)
    taps = enc.apply(variables, x)
    assert len(taps) >= 5, name
    assert taps[-1].shape == (1, SMALL_HW[0] // 8, SMALL_HW[1] // 8, 512), name
    assert taps[3].shape[-1] == 512, name
    assert taps[4].shape[-1] == 512, name
    for t in taps:
        assert np.isfinite(np.asarray(t)).all(), name


def test_registry_contents():
    names = available()
    for expected in ("resnet50", "resnet18", "cnn", "vgg19",
                     "dinov2_s", "dinov2_b", "dinov2_l", "inception_v3"):
        assert expected in names
