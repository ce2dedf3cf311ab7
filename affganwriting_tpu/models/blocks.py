"""Conv/linear building blocks (flax linen, NHWC).

TPU-first rewrites of GAN_word/blocks.py: same computational graphs
(reflect-pad convs, act-first residual blocks, instance norm), but NHWC
layout so XLA tiles channels onto the 128-lane axis, f32 accumulation on the
MXU, and no in-place mutation.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

from affganwriting_tpu.ops.norms import instance_norm

_PAD_MODES = {"reflect": "reflect", "replicate": "edge", "zero": "constant"}


def get_group_size(channels: int) -> int:
    """Largest 'nice' group size — 8 (or 4 below 32 channels) when it
    divides, else the closest prime factor (line_generation/utils/util.py
    getGroupSize semantics)."""
    goal = 8 if channels >= 32 else 4
    if channels % goal == 0:
        return goal
    best, best_dist = 1, 10 ** 9
    n = channels
    f = 2
    factors = []
    while f * f <= n:
        while n % f == 0:
            factors.append(f)
            n //= f
        f += 1
    if n > 1:
        factors.append(n)
    for f in factors:
        if abs(f - goal) <= best_dist:
            best_dist = abs(f - goal)
            best = f
    return best


def pad2d(x: jnp.ndarray, padding: int, pad_type: str) -> jnp.ndarray:
    if padding == 0:
        return x
    cfg = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    return jnp.pad(x, cfg, mode=_PAD_MODES[pad_type])


def activation_fn(name: str) -> Optional[Callable]:
    if name == "relu":
        return nn.relu
    if name == "lrelu":
        return lambda x: nn.leaky_relu(x, negative_slope=0.2)
    if name == "tanh":
        return jnp.tanh
    if name == "none":
        return None
    raise ValueError(f"unknown activation {name!r}")


class Conv2dBlock(nn.Module):
    """pad -> conv -> norm -> act (or act-first variant).

    Mirrors GAN_word/blocks.py:106-163.  norm 'adain' is intentionally NOT
    supported here: adaptive norms take external parameters, so the decoder
    applies them explicitly (see models/decoder.py) instead of the
    reference's assign-then-forward mutation trick.
    """

    features: int
    kernel: int | tuple[int, int]
    stride: int | tuple[int, int] = 1
    padding: int = 0
    norm: str = "none"          # none | in | bn
    activation: str = "relu"
    pad_type: str = "zero"
    use_bias: bool = True
    activation_first: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        act = activation_fn(self.activation)
        ks = (
            self.kernel
            if isinstance(self.kernel, tuple)
            else (self.kernel, self.kernel)
        )
        st = (
            self.stride
            if isinstance(self.stride, tuple)
            else (self.stride, self.stride)
        )
        conv = nn.Conv(
            self.features,
            ks,
            strides=st,
            padding="VALID",
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )

        def apply_norm(h):
            if self.norm == "in":
                return instance_norm(h)
            if self.norm == "bn":
                return nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    dtype=jnp.float32,
                )(h).astype(h.dtype)
            if self.norm == "group":
                # torch passes getGroupSize as num_groups
                # (line_generation/model/count_cnn.py:13)
                c = h.shape[-1]
                return nn.GroupNorm(
                    num_groups=get_group_size(c), dtype=jnp.float32,
                )(h).astype(h.dtype)
            return h

        if self.activation_first:
            if act is not None:
                x = act(x)
            x = conv(pad2d(x, self.padding, self.pad_type))
            x = apply_norm(x)
        else:
            x = conv(pad2d(x, self.padding, self.pad_type))
            x = apply_norm(x)
            if act is not None:
                x = act(x)
        return x


class ResBlock(nn.Module):
    """Two 3x3 conv blocks + identity skip (GAN_word/blocks.py:21-39)."""

    dim: int
    norm: str = "in"
    activation: str = "relu"
    pad_type: str = "zero"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = Conv2dBlock(
            self.dim, 3, 1, 1,
            norm=self.norm, activation=self.activation,
            pad_type=self.pad_type, dtype=self.dtype,
        )(x, train=train)
        h = Conv2dBlock(
            self.dim, 3, 1, 1,
            norm=self.norm, activation="none",
            pad_type=self.pad_type, dtype=self.dtype,
        )(h, train=train)
        return x + h


class ActFirstResBlock(nn.Module):
    """Pre-activation residual block (GAN_word/blocks.py:42-65)."""

    fin: int
    fout: int
    fhid: Optional[int] = None
    activation: str = "lrelu"
    norm: str = "none"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        fhid = min(self.fin, self.fout) if self.fhid is None else self.fhid
        dx = Conv2dBlock(
            fhid, 3, 1, 1,
            pad_type="reflect", norm=self.norm,
            activation=self.activation, activation_first=True,
            dtype=self.dtype,
        )(x, train=train)
        dx = Conv2dBlock(
            self.fout, 3, 1, 1,
            pad_type="reflect", norm=self.norm,
            activation=self.activation, activation_first=True,
            dtype=self.dtype,
        )(dx, train=train)
        if self.fin != self.fout:
            x = Conv2dBlock(
                self.fout, 1, 1,
                activation="none", use_bias=False, dtype=self.dtype,
            )(x, train=train)
        return x + dx


class LinearBlock(nn.Module):
    """Dense -> norm -> act (GAN_word/blocks.py:68-103)."""

    features: int
    norm: str = "none"
    activation: str = "relu"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Dense(self.features, dtype=self.dtype, param_dtype=jnp.float32)(x)
        if self.norm == "bn":
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, dtype=jnp.float32
            )(x).astype(x.dtype)
        act = activation_fn(self.activation)
        return act(x) if act is not None else x


def avg_pool_3x3_s2_refpad(x: jnp.ndarray) -> jnp.ndarray:
    """ReflectionPad2d(1) + AvgPool2d(3, stride=2): the D/C downsampler
    (GAN_word/modules_tro.py:133-134)."""
    x = pad2d(x, 1, "reflect")
    return nn.avg_pool(x, (3, 3), strides=(2, 2), padding="VALID")
