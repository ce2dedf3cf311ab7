"""Spaced line generator (StyleGAN-flavored).

Rebuild of ``SpacedGenerator`` + styled-conv machinery
(line_generation/model/pure_gen.py:12-311): a spaced one-hot content map
(B, 1, L, n_class[+style]) grows through 5 StyledConvBlocks — initial
(4,3)-transposed conv, two vertical-only x2 upsamples, two full x2 upsamples
(fused transposed-conv + 3x3 binomial blur) — to a (B, 64, 4L, 1) tanh
image; each block is conv -> noise injection -> lrelu -> AdaIN(style), x2.
The style vector passes PixelNorm + a 6-layer FC before modulating.

Equalized learning rate (EqualLR, pure_gen.py:218-247) is reproduced as
parameters stored at N(0,1) scale and multiplied by sqrt(2/fan_in) at use.
All noise comes from an explicit 'noise' RNG collection — same key, same
image (the determinism contract).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp


class PixelNorm(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x * jax.lax.rsqrt(
            jnp.mean(jnp.square(x), axis=-1, keepdims=True) + 1e-8)


class EqualConv(nn.Module):
    """Conv with weight ~ N(0,1) scaled by sqrt(2/fan_in) at use."""

    features: int
    kernel: tuple[int, int]
    padding: tuple = ((0, 0), (0, 0))
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        cin = x.shape[-1]
        w = self.param("weight", nn.initializers.normal(1.0),
                       (kh, kw, cin, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
        scale = math.sqrt(2.0 / (cin * kh * kw))
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), (w * scale).astype(self.dtype),
            window_strides=(1, 1), padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b.astype(self.dtype)


class NoiseInjection(nn.Module):
    """x + weight * noise; equal-lr'd weight init 0.01 (pure_gen.py:72-78,
    wrapped by equal_lr -> effective scale 0.01*sqrt(2/C))."""

    @nn.compact
    def __call__(self, x, noise):
        c = x.shape[-1]
        w = self.param("weight", nn.initializers.constant(0.01),
                       (c,), jnp.float32)
        scale = math.sqrt(2.0 / c)
        return x + (w * scale).astype(x.dtype) * noise.astype(x.dtype)


class StyleAdaIN(nn.Module):
    """InstanceNorm + per-style affine from Linear(style -> 2C), bias init
    gamma=1 beta=0 (pure_gen.py:53-69)."""

    @nn.compact
    def __call__(self, x, style):
        c = x.shape[-1]

        def bias_init(key, shape, dtype=jnp.float32):
            return jnp.concatenate(
                [jnp.ones((c,), dtype), jnp.zeros((c,), dtype)])

        affine = nn.Dense(2 * c, bias_init=bias_init,
                          param_dtype=jnp.float32, name="style")(
            style.astype(jnp.float32))
        gamma, beta = affine[:, :c], affine[:, c:]
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
        var = jnp.var(x32, axis=(1, 2), keepdims=True)
        normed = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
        out = gamma[:, None, None, :] * normed + beta[:, None, None, :]
        return out.astype(x.dtype)


def blur3x3(x):
    """Depthwise binomial 3x3 blur (pure_gen.py Blur)."""
    k = jnp.asarray([[1., 2., 1.], [2., 4., 2.], [1., 2., 1.]]) / 16.0
    c = x.shape[-1]
    w = jnp.broadcast_to(k[:, :, None, None], (3, 3, 1, c)).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)


class FusedUpsample(nn.Module):
    """Transposed conv x2 whose (k+1) kernel is the 4-shift average of an
    equal-lr'd kxk kernel (pure_gen.py:250-279)."""

    features: int
    kernel: int = 3
    padding: int = 1
    only_vertical: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        cin = x.shape[-1]
        w = self.param("weight", nn.initializers.normal(1.0),
                       (k, k, cin, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
        mult = math.sqrt(2.0 / (cin * k * k))
        wp = jnp.pad(w * mult, ((1, 1), (1, 1), (0, 0), (0, 0)))
        wk = (wp[1:, 1:] + wp[:-1, 1:] + wp[1:, :-1] + wp[:-1, :-1]) / 4.0
        kk = k + 1
        stride = (2, 1) if self.only_vertical else (2, 2)
        # torch conv_transpose2d(stride=s, padding=p) == lhs-dilated conv
        # with flipped kernel and padding (k-1-p)
        pad = kk - 1 - self.padding
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            jnp.flip(wk, (0, 1)).astype(self.dtype),
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            lhs_dilation=stride,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + b.astype(self.dtype)


class InitialConv(nn.Module):
    """ConvTranspose2d((4,3), padding=(0,1)): (B,1,L,C) -> (B,4,L,out)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (4, 3, cin, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype), jnp.flip(w, (0, 1)).astype(self.dtype),
            window_strides=(1, 1),
            padding=((3, 3), (1, 1)),   # (k-1-p): h p=0 -> 3, w p=1 -> 1
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + b.astype(self.dtype)


class StyledConvBlock(nn.Module):
    features: int
    style_dim: int = 128
    initial: bool = False
    upsample: bool = False
    only_vertical: bool = False
    fused: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, style):
        if self.initial:
            out = InitialConv(self.features, self.dtype, name="conv1")(x)
        elif self.upsample:
            if self.fused:
                out = FusedUpsample(
                    self.features, 3, 1, self.only_vertical, self.dtype,
                    name="conv1")(x)
                out = blur3x3(out)
            else:
                n, h, w, c = x.shape
                scale = (2, 1) if self.only_vertical else (2, 2)
                out = jax.image.resize(
                    x, (n, h * scale[0], w * scale[1], c), method="nearest")
                out = nn.Conv(self.features, (3, 3),
                              padding=((1, 1), (1, 1)), dtype=self.dtype,
                              param_dtype=jnp.float32, name="conv1")(out)
                out = blur3x3(out)
        else:
            out = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                          dtype=self.dtype, param_dtype=jnp.float32,
                          name="conv1")(x)

        noise1 = jax.random.normal(self.make_rng("noise"), out.shape)
        out = NoiseInjection(name="noise1")(out, noise1)
        out = nn.leaky_relu(out, 0.2)
        out = StyleAdaIN(name="adain1")(out, style)

        out = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                      dtype=self.dtype, param_dtype=jnp.float32,
                      name="conv2")(out)
        noise2 = jax.random.normal(self.make_rng("noise"), out.shape)
        out = NoiseInjection(name="noise2")(out, noise2)
        out = nn.leaky_relu(out, 0.2)
        out = StyleAdaIN(name="adain2")(out, style)
        return out


class SpacedGenerator(nn.Module):
    n_class: int = 80
    style_size: int = 128
    dim: int = 256
    output_dim: int = 1
    n_style_trans: int = 6
    append_style: bool = True   # active config gen_append_style
    # per-position character-style channels appended to the content when
    # > 0 (the char_style_dim path).  The reference's own generator never
    # wires its per-position styles (hw_with_style.py:357-377 space_style
    # is dead code and pure_gen's style_emb cannot take the tuple); this
    # uses the same input-concat slot its append_style mechanism uses.
    char_style_dim: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, spaced, style, pos_style=None):
        """spaced: (B, L, n_class) one-hot content (batch-major; the torch
        code is (T, B, cls)); style: (B, style_size) -> (B, 64, 4L, 1).
        ``pos_style`` (B, L, char_style_dim): per-position character styles
        (models/line/char_style_multi.py:space_style), required iff
        char_style_dim > 0."""
        b, length, _ = spaced.shape

        s = PixelNorm(name="pixel_norm")(style)
        for i in range(self.n_style_trans):
            s = nn.Dense(self.style_size, param_dtype=jnp.float32,
                         name=f"style_emb{i}")(s)
            s = nn.leaky_relu(s, 0.2)

        content = spaced[:, None, :, :]             # (B, 1, L, cls)
        if self.char_style_dim > 0:
            content = jnp.concatenate(
                [content, pos_style[:, None, :, :].astype(content.dtype)],
                axis=-1)
        if self.append_style:
            app = jnp.broadcast_to(
                s[:, None, None, :], (b, 1, length, self.style_size))
            content = jnp.concatenate(
                [content, app.astype(content.dtype)], axis=-1)

        d = self.dim
        x = StyledConvBlock(d, self.style_size, initial=True,
                            dtype=self.dtype, name="block0")(content, s)
        x = StyledConvBlock(d // 2, self.style_size, upsample=True,
                            only_vertical=True, fused=False,
                            dtype=self.dtype, name="block1")(x, s)
        x = StyledConvBlock(d // 4, self.style_size, upsample=True,
                            only_vertical=True, fused=False,
                            dtype=self.dtype, name="block2")(x, s)
        x = StyledConvBlock(d // 8, self.style_size, upsample=True,
                            fused=True, dtype=self.dtype, name="block3")(x, s)
        x = StyledConvBlock(d // 16, self.style_size, upsample=True,
                            fused=True, dtype=self.dtype, name="block4")(x, s)
        out = EqualConv(self.output_dim, (1, 1), name="out")(x)
        return jnp.tanh(out)
