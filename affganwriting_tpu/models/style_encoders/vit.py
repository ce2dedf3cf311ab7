"""DINOv2-style ViT style encoder ("dinov2_*" registry keys).

Rebuild of ``ImageEncoderDINOv2`` (GAN_word/dinomodel.py:7-166): a patch-14
ViT whose patch-embedding conv takes the 50-channel style stack, input
padded (replicate) to a patch multiple, tapped at the stem and 4 transformer
blocks; each tap's tokens are reshaped to a spatial map and reduced to 512
channels by a 1x1 conv, last tap resized to ``final_hw``.  DINOv2 pretrained
weights can be overlaid via utils/torch_import when a local checkpoint
exists; otherwise the encoder trains from scratch like any other backbone.

TPU notes: token count for 64x216 at patch 14 is 5x16=80 -> sequence ops pad
nicely to the 128-lane axis at bf16; attention is a single fused
``jax.nn.dot_product_attention``-style einsum chain.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from affganwriting_tpu.models.style_encoders import register

_ARCHS = {
    "s": dict(embed=384, depth=12, heads=6, taps=(2, 5, 8, 11)),
    "b": dict(embed=768, depth=12, heads=12, taps=(2, 5, 8, 11)),
    "l": dict(embed=1024, depth=24, heads=16, taps=(4, 8, 16, 23)),
    # vitg14 (dinomodel.py:23 "vitg14"): 40 blocks, 1536-wide, evenly
    # spaced taps like the reference's default tap spread
    "g": dict(embed=1536, depth=40, heads=24, taps=(9, 19, 29, 39)),
}


class Block(nn.Module):
    dim: int
    heads: int
    mlp_ratio: int = 4
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype,
            param_dtype=jnp.float32, name="attn")(h)
        x = x + h
        h = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        h = nn.Dense(self.dim * self.mlp_ratio, dtype=self.dtype,
                     param_dtype=jnp.float32, name="mlp_fc1")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="mlp_fc2")(h)
        return x + h


class ViTStyleEncoder(nn.Module):
    arch: str = "s"
    patch: int = 14
    style_dim: int = 512
    final_hw: tuple[int, int] = (8, 27)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        spec = _ARCHS[self.arch]
        dim, depth, heads = spec["embed"], spec["depth"], spec["heads"]
        taps = spec["taps"]
        n, h, w, c = x.shape
        p = self.patch
        pad_h = (p - h % p) % p
        pad_w = (p - w % p) % p
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                        mode="edge")
        hp, wp = x.shape[1] // p, x.shape[2] // p

        tokens = nn.Conv(dim, (p, p), strides=(p, p), dtype=self.dtype,
                         param_dtype=jnp.float32, name="patch_embed")(x)
        tokens = tokens.reshape(n, hp * wp, dim)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, hp * wp, dim),
            jnp.float32)
        tokens = tokens + pos.astype(tokens.dtype)

        def to_map(t):
            return t.reshape(n, hp, wp, dim)

        results = [to_map(tokens)]
        for i in range(depth):
            tokens = Block(dim, heads, dtype=self.dtype, name=f"block{i}")(
                tokens)
            if i in taps:
                results.append(to_map(tokens))

        reduced = []
        for i, fmap in enumerate(results):
            reduced.append(
                nn.Conv(self.style_dim, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"reduce{i}")(fmap))
        b, _, _, cc = reduced[-1].shape
        reduced[-1] = jax.image.resize(
            reduced[-1].astype(jnp.float32), (b, *self.final_hw, cc),
            method="bilinear").astype(self.dtype)
        return reduced


@register("dinov2_s")
class ViTSmall(ViTStyleEncoder):
    arch: str = "s"


@register("dinov2_b")
class ViTBase(ViTStyleEncoder):
    arch: str = "b"


@register("dinov2_l")
class ViTLarge(ViTStyleEncoder):
    arch: str = "l"


@register("dinov2_g")
class ViTGiant(ViTStyleEncoder):
    arch: str = "g"
