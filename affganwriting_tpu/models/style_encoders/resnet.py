"""ResNet style encoders over the 50-image style stack.

Rebuild of ``ImageEncoderResNet50`` (GAN_word/modules_tro.py:464-533, the
reference's ACTIVE backbone): a torchvision-layout ResNet whose first conv
takes the 50-channel style stack, tapped at {stem-relu, layer1..layer4}, each
tap reduced to 512 channels by a 1x1 conv, and the last tap bilinearly
resized to (8, 27).  Pretrained torchvision weights can be surgically
imported (RGB kernels copied, channel-0 kernel tiled for channels 3..49,
cf. modules_tro.py:487-491) via utils/torch_import.py.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from affganwriting_tpu.models.style_encoders import register


class Bottleneck(nn.Module):
    features: int           # bottleneck width; out = features * 4
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        def bn(h, name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=jnp.float32, name=name,
            )(h).astype(h.dtype)

        identity = x
        h = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(x)
        h = nn.relu(bn(h, "bn1"))
        h = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv2")(h)
        h = nn.relu(bn(h, "bn2"))
        h = nn.Conv(self.features * 4, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv3")(h)
        h = bn(h, "bn3")
        if self.downsample:
            identity = nn.Conv(
                self.features * 4, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                name="down_conv")(x)
            identity = bn(identity, "down_bn")
        return nn.relu(h + identity)


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        def bn(h, name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=jnp.float32, name=name,
            )(h).astype(h.dtype)

        identity = x
        h = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(x)
        h = nn.relu(bn(h, "bn1"))
        h = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv2")(h)
        h = bn(h, "bn2")
        if self.downsample:
            identity = nn.Conv(
                self.features, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                name="down_conv")(x)
            identity = bn(identity, "down_bn")
        return nn.relu(h + identity)


class _ResNetStyleEncoder(nn.Module):
    """Tapped ResNet trunk + 1x1 reducers to ``style_dim`` per tap."""

    stage_sizes: Sequence[int]
    block_bottleneck: bool
    style_dim: int = 512
    final_hw: tuple[int, int] = (8, 27)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        block = Bottleneck if self.block_bottleneck else BasicBlock
        taps = []

        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn1")(h)
        h = nn.relu(h).astype(self.dtype)
        taps.append(h)                                   # stem relu tap
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        widths = (64, 128, 256, 512)
        for li, (n_blocks, width) in enumerate(zip(self.stage_sizes, widths)):
            for bi in range(n_blocks):
                stride = 2 if (bi == 0 and li > 0) else 1
                first_out = width * (4 if self.block_bottleneck else 1)
                need_down = bi == 0 and (
                    stride != 1 or h.shape[-1] != first_out
                )
                h = block(width, stride=stride, downsample=need_down,
                          dtype=self.dtype, name=f"layer{li + 1}_{bi}")(
                    h, train=train)
            taps.append(h)

        results = []
        for i, tap in enumerate(taps):
            r = nn.Conv(self.style_dim, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"reduce{i}")(tap)
            results.append(r)
        n, _, _, c = results[-1].shape
        results[-1] = jax.image.resize(
            results[-1].astype(jnp.float32),
            (n, *self.final_hw, c), method="bilinear",
        ).astype(self.dtype)
        return results


@register("resnet50")
class ResNet50StyleEncoder(_ResNetStyleEncoder):
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    block_bottleneck: bool = True


@register("resnet18")
class ResNet18StyleEncoder(_ResNetStyleEncoder):
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    block_bottleneck: bool = False
