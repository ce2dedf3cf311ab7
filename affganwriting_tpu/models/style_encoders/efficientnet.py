"""EfficientNetV2-L style encoder over the 50-image style stack.

Rebuild of ``ImageEncoderEfficientNet`` (GAN_word/modules_tro.py:383-458):
torchvision's ``efficientnet_v2_l`` with the first conv widened to 50 input
channels (RGB kernels copied, channel-0 kernel tiled for channels 3..49,
:407-415), tapped after feature stages 1..5, each tap reduced to 512
channels by a 1x1 conv, the last tap bilinearly resized to (8, 27).

TPU-first deviations from the reference:

- the reference constructs the FULL EfficientNetV2-L and its
  ``encode_with_intermediate`` loops over all 9 feature stages even though
  nothing past stage 5 is tapped (modules_tro.py:444-455) — here the trunk
  simply ends at stage 5, saving the (large) stages 6-8 entirely;
- torchvision applies stochastic depth in train mode; this encoder omits it
  (the GAN trains its backbone from scratch or fine-tunes; stochastic depth
  is regularization noise the reference never tuned).

Weight import from a torchvision ``efficientnet_v2_l`` state dict (with the
50-channel surgery) lives in :func:`efficientnet_v2_l_to_flax`, parity-
tested against torchvision at tiny depth.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from affganwriting_tpu.models.style_encoders import register

# EfficientNetV2-L stage spec for the tapped prefix (torchvision
# efficientnet_v2_l: features[1..5]).  Each entry:
# (n_blocks, kind, kernel, stride, expand, out_ch, se_ratio)
_V2L_STAGES: tuple = (
    (4, "fused", 3, 1, 1, 32, None),
    (7, "fused", 3, 2, 4, 64, None),
    (7, "fused", 3, 2, 4, 96, None),
    (10, "mb", 3, 2, 4, 192, 0.25),
    (19, "mb", 3, 1, 6, 224, 0.25),
)
_V2L_STEM = 32


def _bn(train: bool, name: str):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-3, dtype=jnp.float32, name=name)


class FusedMBConv(nn.Module):
    """Fused MBConv: kxk expand conv (+BN+SiLU) then 1x1 project (+BN);
    residual when stride 1 and channels match.  expand==1 collapses to a
    single conv (torchvision FusedMBConv semantics)."""

    out_ch: int
    kernel: int
    stride: int
    expand: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        in_ch = x.shape[-1]
        mid = in_ch * self.expand
        k, s = self.kernel, self.stride
        pad = ((k // 2, k // 2),) * 2
        h = x
        if self.expand != 1:
            h = nn.Conv(mid, (k, k), strides=(s, s), padding=pad,
                        use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="expand")(h)
            h = nn.silu(_bn(train, "expand_bn")(h)).astype(self.dtype)
            h = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="project")(h)
            h = _bn(train, "project_bn")(h).astype(self.dtype)
        else:
            h = nn.Conv(self.out_ch, (k, k), strides=(s, s), padding=pad,
                        use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="project")(h)
            h = nn.silu(_bn(train, "project_bn")(h)).astype(self.dtype)
        if self.stride == 1 and in_ch == self.out_ch:
            h = h + x
        return h


class MBConv(nn.Module):
    """MBConv: 1x1 expand, kxk depthwise, squeeze-excite, 1x1 project."""

    out_ch: int
    kernel: int
    stride: int
    expand: int
    se_ratio: float = 0.25
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        in_ch = x.shape[-1]
        mid = in_ch * self.expand
        k, s = self.kernel, self.stride
        pad = ((k // 2, k // 2),) * 2

        h = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="expand")(x)
        h = nn.silu(_bn(train, "expand_bn")(h)).astype(self.dtype)
        h = nn.Conv(mid, (k, k), strides=(s, s), padding=pad,
                    feature_group_count=mid, use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="dw")(h)
        h = nn.silu(_bn(train, "dw_bn")(h)).astype(self.dtype)

        # squeeze-excite on the *input* channel count (torchvision rounds
        # squeeze channels from in_ch, not mid)
        se_ch = max(1, int(in_ch * self.se_ratio))
        g = jnp.mean(h, axis=(1, 2), keepdims=True)
        g = nn.Conv(se_ch, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name="se_reduce")(g)
        g = nn.silu(g)
        g = nn.Conv(mid, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name="se_expand")(g)
        h = h * jax.nn.sigmoid(g)

        h = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="project")(h)
        h = _bn(train, "project_bn")(h).astype(self.dtype)
        if self.stride == 1 and in_ch == self.out_ch:
            h = h + x
        return h


class EfficientNetV2StyleEncoder(nn.Module):
    """Tapped EfficientNetV2 trunk + 1x1 reducers (reference
    encode_with_intermediate, modules_tro.py:444-455): returns 5 taps of
    ``style_dim`` channels, the last resized to ``final_hw``."""

    stages: Sequence = _V2L_STAGES
    stem_ch: int = _V2L_STEM
    style_dim: int = 512
    final_hw: tuple[int, int] = (8, 27)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = nn.Conv(self.stem_ch, (3, 3), strides=(2, 2),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="stem")(x)
        h = nn.silu(_bn(train, "stem_bn")(h)).astype(self.dtype)

        taps = []
        for si, (n, kind, k, s, e, out_ch, se) in enumerate(self.stages):
            for bi in range(n):
                stride = s if bi == 0 else 1
                name = f"stage{si + 1}_{bi}"
                if kind == "fused":
                    h = FusedMBConv(out_ch, k, stride, e, dtype=self.dtype,
                                    name=name)(h, train=train)
                else:
                    h = MBConv(out_ch, k, stride, e, se_ratio=se,
                               dtype=self.dtype, name=name)(h, train=train)
            taps.append(h)

        results = []
        for i, tap in enumerate(taps):
            results.append(
                nn.Conv(self.style_dim, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"reduce{i}")(tap))
        n, _, _, c = results[-1].shape
        results[-1] = jax.image.resize(
            results[-1].astype(jnp.float32),
            (n, *self.final_hw, c), method="bilinear").astype(self.dtype)
        return results


@register("efficientnet_v2_l")
class EfficientNetV2LStyleEncoder(EfficientNetV2StyleEncoder):
    pass


# --------------------------------------------------------------------------
# torchvision weight import (with 50-channel first-conv surgery)
# --------------------------------------------------------------------------


def efficientnet_v2_l_to_flax(
    sd: dict[str, np.ndarray],
    in_channels: int = 50,
    stages: Sequence = _V2L_STAGES,
) -> tuple[dict, dict]:
    """torchvision ``efficientnet_v2_l().state_dict()`` -> (params, stats)
    for the tapped trunk (stem + stages 1..5; reducers stay random — the
    reference's 1x1 reducers are fresh layers too, modules_tro.py:432-438).

    First-conv surgery: copy RGB kernels, tile channel 0 over channels
    3..in_channels (reference modules_tro.py:407-415).
    """
    from affganwriting_tpu.utils.torch_import import conv_w, expand_first_conv

    def arr(k):
        x = sd[k]
        return x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)

    params: dict = {}
    stats: dict = {}

    def put_bn(flax_name, tv_prefix):
        params[flax_name] = {"scale": arr(tv_prefix + ".weight"),
                             "bias": arr(tv_prefix + ".bias")}
        stats[flax_name] = {"mean": arr(tv_prefix + ".running_mean"),
                            "var": arr(tv_prefix + ".running_var")}

    stem_w = arr("features.0.0.weight")          # (O, 3, 3, 3)
    stem_w = expand_first_conv(stem_w, in_channels)
    params["stem"] = {"kernel": conv_w(stem_w)}
    put_bn("stem_bn", "features.0.1")

    for si, (n, kind, _k, _s, e, _out, se) in enumerate(stages):
        for bi in range(n):
            name = f"stage{si + 1}_{bi}"
            p = f"features.{si + 1}.{bi}.block"
            blk: dict = {}
            if kind == "fused":
                if e != 1:
                    blk["expand"] = {"kernel": conv_w(arr(f"{p}.0.0.weight"))}
                    put_bn(f"{name}/expand_bn", f"{p}.0.1")
                    blk["project"] = {"kernel": conv_w(arr(f"{p}.1.0.weight"))}
                    put_bn(f"{name}/project_bn", f"{p}.1.1")
                else:
                    blk["project"] = {"kernel": conv_w(arr(f"{p}.0.0.weight"))}
                    put_bn(f"{name}/project_bn", f"{p}.0.1")
            else:
                blk["expand"] = {"kernel": conv_w(arr(f"{p}.0.0.weight"))}
                put_bn(f"{name}/expand_bn", f"{p}.0.1")
                blk["dw"] = {"kernel": conv_w(arr(f"{p}.1.0.weight"))}
                put_bn(f"{name}/dw_bn", f"{p}.1.1")
                blk["se_reduce"] = {
                    "kernel": conv_w(arr(f"{p}.2.fc1.weight")),
                    "bias": arr(f"{p}.2.fc1.bias")}
                blk["se_expand"] = {
                    "kernel": conv_w(arr(f"{p}.2.fc2.weight")),
                    "bias": arr(f"{p}.2.fc2.bias")}
                blk["project"] = {"kernel": conv_w(arr(f"{p}.3.0.weight"))}
                put_bn(f"{name}/project_bn", f"{p}.3.1")
            params[name] = blk

    # nest the 'a/b' bn paths
    nested_p: dict = {}
    nested_s: dict = {}

    def put(tree, path, leaf):
        parts = path.split("/")
        for part in parts[:-1]:
            tree = tree.setdefault(part, {})
        tree[parts[-1]] = leaf

    for k, v in params.items():
        put(nested_p, k, v)
    for k, v in stats.items():
        put(nested_s, k, v)
    return nested_p, nested_s
