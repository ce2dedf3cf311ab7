"""InceptionV3 pool3 feature extractor (flax, NHWC) for FID.

Architecture follows torchvision/pytorch-fid's InceptionV3 as wrapped by the
reference (GAN_word/fid_folder/inception.py): stem convs, InceptionA/B/C/D/E
mixed blocks, global average pool -> 2048-d "pool3" activations.  The
pytorch-fid variant's TF-compat details are reproduced: average-pool
branches exclude padding from the count, and the second InceptionE block
uses max pooling in its pool branch.

ImageNet weights are not downloadable in this environment; params can be
imported from a local torch state_dict via
``affganwriting_tpu.utils.torch_import`` when available, else a fixed-seed
random network stands in (the FID *pipeline* — batched activations, Welford
stats, Fréchet distance — is identical either way).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _avg_pool_3x3_same_nocount(x):
    """3x3 stride-1 SAME avg pool, excluding padded cells from the count
    (torch ``count_include_pad=False``)."""
    ones = jnp.ones_like(x[..., :1])
    sum_ = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "SAME")
    cnt = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "SAME")
    return sum_ / cnt


class BasicConv(nn.Module):
    features: int
    kernel: tuple[int, int]
    stride: int = 1
    padding: tuple[tuple[int, int], tuple[int, int]] = ((0, 0), (0, 0))
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel,
                    strides=(self.stride, self.stride),
                    padding=self.padding, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         dtype=jnp.float32, name="bn")(x)
        return nn.relu(x).astype(self.dtype)


class InceptionA(nn.Module):
    pool_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b1 = BasicConv(64, (1, 1), dtype=d, name="branch1x1")(x)
        b5 = BasicConv(48, (1, 1), dtype=d, name="branch5x5_1")(x)
        b5 = BasicConv(64, (5, 5), padding=((2, 2), (2, 2)), dtype=d,
                       name="branch5x5_2")(b5)
        b3 = BasicConv(64, (1, 1), dtype=d, name="branch3x3dbl_1")(x)
        b3 = BasicConv(96, (3, 3), padding=((1, 1), (1, 1)), dtype=d,
                       name="branch3x3dbl_2")(b3)
        b3 = BasicConv(96, (3, 3), padding=((1, 1), (1, 1)), dtype=d,
                       name="branch3x3dbl_3")(b3)
        bp = _avg_pool_3x3_same_nocount(x)
        bp = BasicConv(self.pool_features, (1, 1), dtype=d,
                       name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b3 = BasicConv(384, (3, 3), stride=2, dtype=d, name="branch3x3")(x)
        bd = BasicConv(64, (1, 1), dtype=d, name="branch3x3dbl_1")(x)
        bd = BasicConv(96, (3, 3), padding=((1, 1), (1, 1)), dtype=d,
                       name="branch3x3dbl_2")(bd)
        bd = BasicConv(96, (3, 3), stride=2, dtype=d,
                       name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        p17 = ((0, 0), (3, 3))
        p71 = ((3, 3), (0, 0))
        b1 = BasicConv(192, (1, 1), dtype=d, name="branch1x1")(x)
        b7 = BasicConv(self.c7, (1, 1), dtype=d, name="branch7x7_1")(x)
        b7 = BasicConv(self.c7, (1, 7), padding=p17, dtype=d,
                       name="branch7x7_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=p71, dtype=d,
                       name="branch7x7_3")(b7)
        bd = BasicConv(self.c7, (1, 1), dtype=d, name="branch7x7dbl_1")(x)
        bd = BasicConv(self.c7, (7, 1), padding=p71, dtype=d,
                       name="branch7x7dbl_2")(bd)
        bd = BasicConv(self.c7, (1, 7), padding=p17, dtype=d,
                       name="branch7x7dbl_3")(bd)
        bd = BasicConv(self.c7, (7, 1), padding=p71, dtype=d,
                       name="branch7x7dbl_4")(bd)
        bd = BasicConv(192, (1, 7), padding=p17, dtype=d,
                       name="branch7x7dbl_5")(bd)
        bp = _avg_pool_3x3_same_nocount(x)
        bp = BasicConv(192, (1, 1), dtype=d, name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b3 = BasicConv(192, (1, 1), dtype=d, name="branch3x3_1")(x)
        b3 = BasicConv(320, (3, 3), stride=2, dtype=d, name="branch3x3_2")(b3)
        b7 = BasicConv(192, (1, 1), dtype=d, name="branch7x7x3_1")(x)
        b7 = BasicConv(192, (1, 7), padding=((0, 0), (3, 3)), dtype=d,
                       name="branch7x7x3_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=((3, 3), (0, 0)), dtype=d,
                       name="branch7x7x3_3")(b7)
        b7 = BasicConv(192, (3, 3), stride=2, dtype=d,
                       name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_mode: str = "avg"   # 'avg' (Mixed_7b) | 'max' (Mixed_7c, FID-compat)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b1 = BasicConv(320, (1, 1), dtype=d, name="branch1x1")(x)
        b3 = BasicConv(384, (1, 1), dtype=d, name="branch3x3_1")(x)
        b3a = BasicConv(384, (1, 3), padding=((0, 0), (1, 1)), dtype=d,
                        name="branch3x3_2a")(b3)
        b3b = BasicConv(384, (3, 1), padding=((1, 1), (0, 0)), dtype=d,
                        name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv(448, (1, 1), dtype=d, name="branch3x3dbl_1")(x)
        bd = BasicConv(384, (3, 3), padding=((1, 1), (1, 1)), dtype=d,
                       name="branch3x3dbl_2")(bd)
        bda = BasicConv(384, (1, 3), padding=((0, 0), (1, 1)), dtype=d,
                        name="branch3x3dbl_3a")(bd)
        bdb = BasicConv(384, (3, 1), padding=((1, 1), (0, 0)), dtype=d,
                        name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_mode == "max":
            bp = nn.max_pool(x, (3, 3), strides=(1, 1),
                             padding=((1, 1), (1, 1)))
        else:
            bp = _avg_pool_3x3_same_nocount(x)
        bp = BasicConv(192, (1, 1), dtype=d, name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Pool3(nn.Module):
    """(B, H, W, 3) in [0, 1] -> (B, 2048) pool3 activations.

    ``resize_input``/``normalize_input`` reproduce pytorch-fid's wrapper
    defaults: bilinear resize to 299 and scale to [-1, 1].
    """

    resize_input: bool = True
    normalize_input: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        if self.resize_input:
            n, _, _, c = x.shape
            x = jax.image.resize(x, (n, 299, 299, c), method="bilinear")
        if self.normalize_input:
            x = x * 2.0 - 1.0
        x = x.astype(d)
        x = BasicConv(32, (3, 3), stride=2, dtype=d, name="Conv2d_1a_3x3")(x)
        x = BasicConv(32, (3, 3), dtype=d, name="Conv2d_2a_3x3")(x)
        x = BasicConv(64, (3, 3), padding=((1, 1), (1, 1)), dtype=d,
                      name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv(80, (1, 1), dtype=d, name="Conv2d_3b_1x1")(x)
        x = BasicConv(192, (3, 3), dtype=d, name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, dtype=d, name="Mixed_5b")(x)
        x = InceptionA(64, dtype=d, name="Mixed_5c")(x)
        x = InceptionA(64, dtype=d, name="Mixed_5d")(x)
        x = InceptionB(dtype=d, name="Mixed_6a")(x)
        x = InceptionC(128, dtype=d, name="Mixed_6b")(x)
        x = InceptionC(160, dtype=d, name="Mixed_6c")(x)
        x = InceptionC(160, dtype=d, name="Mixed_6d")(x)
        x = InceptionC(192, dtype=d, name="Mixed_6e")(x)
        x = InceptionD(dtype=d, name="Mixed_7a")(x)
        x = InceptionE("avg", dtype=d, name="Mixed_7b")(x)
        x = InceptionE("max", dtype=d, name="Mixed_7c")(x)
        x = jnp.mean(x, axis=(1, 2))          # global average pool
        return x.astype(jnp.float32)
