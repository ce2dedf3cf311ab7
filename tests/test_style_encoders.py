"""Every registered style backbone must emit a decoder-compatible pyramid:
taps[3] and taps[4] are 512-channel (iAFF skips), last tap is (H/8, W/8, 512).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from affganwriting_tpu.models.style_encoders import available, get_style_encoder

SMALL_HW = (32, 104)  # keeps CPU compile cheap; geometry-generic modules

# The deep non-default backbones cost 12-45s of XLA CPU compile each on this
# 1-core box; their pyramid contract is identical in kind to the cheap ones,
# so they run in the full (slow-included) suite only.  The ACTIVE backbone
# (resnet50, modules_tro.py:219) always runs fast.
_HEAVY_COMPILE = {"inception_v3", "efficientnet_v2_l", "dinov2_l", "dinov2_b"}


@pytest.mark.parametrize(
    "name",
    [pytest.param(n, marks=pytest.mark.slow) if n in _HEAVY_COMPILE else n
     for n in available()])
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
                     "dinov2_s", "dinov2_b", "dinov2_l", "dinov2_g",
                     "inception_v3",
                     "efficientnet_v2_l"):
        assert expected in names


@pytest.mark.slow
def test_efficientnet_import_parity_vs_torchvision():
    """Weights imported from torchvision efficientnet_v2_l reproduce its
    tapped stage outputs (the real surgery path, random-init weights)."""
    torch = pytest.importorskip("torch")
    torchvision = pytest.importorskip("torchvision")
    from affganwriting_tpu.models.style_encoders.efficientnet import (
        EfficientNetV2StyleEncoder,
        efficientnet_v2_l_to_flax,
    )

    tm = torchvision.models.efficientnet_v2_l(weights=None)
    tm.eval()
    sd = tm.state_dict()

    in_ch = 50
    params, stats = efficientnet_v2_l_to_flax(sd, in_channels=in_ch)
    enc = EfficientNetV2StyleEncoder(dtype=jnp.float32, final_hw=(4, 13))
    x = np.random.default_rng(0).normal(size=(1, 32, 104, in_ch))
    x = x.astype(np.float32)
    variables = enc.init(jax.random.key(0), jnp.asarray(x))
    # overlay imported trunk weights on the random init (reducers stay)
    merged_p = dict(variables["params"])
    merged_p.update(params)
    merged_s = dict(variables["batch_stats"])
    merged_s.update(stats)
    taps = enc.apply(
        {"params": merged_p, "batch_stats": merged_s}, jnp.asarray(x))

    # torch side: widen first conv with the same surgery, tap stages 1..5
    from affganwriting_tpu.utils.torch_import import expand_first_conv
    w = sd["features.0.0.weight"].numpy()
    new_conv = torch.nn.Conv2d(in_ch, w.shape[0], 3, 2, 1, bias=False)
    with torch.no_grad():
        new_conv.weight.copy_(
            torch.tensor(expand_first_conv(w, in_ch)))
    tm.features[0][0] = new_conv
    tx = torch.tensor(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        h = tx
        torch_taps = []
        for i, block in enumerate(tm.features[:6]):
            h = block(h)
            if i >= 1:
                torch_taps.append(h.numpy().transpose(0, 2, 3, 1))

    # compare pre-reducer trunk activations: re-run flax trunk capturing
    # intermediates via the module's taps before reduction is not exposed,
    # so compare the torch taps against flax by applying the same reducers
    # is impossible — instead check stage-5 output through a fresh 1x1
    # identity: simplest is to compare the *last trunk tap* by disabling
    # reducers: reduce convs are linear, so instead validate on the raw
    # trunk via a private forward
    flax_trunk = _trunk_taps(enc, merged_p, merged_s, x)
    assert len(flax_trunk) == len(torch_taps) == 5
    for i, (a, b) in enumerate(zip(flax_trunk, torch_taps)):
        np.testing.assert_allclose(a, b, atol=2e-3, err_msg=f"stage {i+1}")


def _trunk_taps(enc, params, stats, x):
    """Run the encoder but collect pre-reducer stage outputs."""
    import flax.linen as fnn
    from affganwriting_tpu.models.style_encoders.efficientnet import (
        FusedMBConv, MBConv, _bn,
    )

    class Trunk(fnn.Module):
        stages = enc.stages
        stem_ch = enc.stem_ch

        @fnn.compact
        def __call__(self, x):
            h = fnn.Conv(self.stem_ch, (3, 3), strides=(2, 2),
                         padding=((1, 1), (1, 1)), use_bias=False,
                         dtype=jnp.float32, param_dtype=jnp.float32,
                         name="stem")(x)
            h = fnn.silu(_bn(False, "stem_bn")(h))
            taps = []
            for si, (n, kind, k, s, e, out_ch, se) in enumerate(self.stages):
                for bi in range(n):
                    stride = s if bi == 0 else 1
                    name = f"stage{si + 1}_{bi}"
                    if kind == "fused":
                        h = FusedMBConv(out_ch, k, stride, e,
                                        dtype=jnp.float32, name=name)(h)
                    else:
                        h = MBConv(out_ch, k, stride, e, se_ratio=se,
                                   dtype=jnp.float32, name=name)(h)
                taps.append(h)
            return taps

    taps = Trunk().apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x))
    return [np.asarray(t) for t in taps]
