"""AdaIN decoder: (8, 27, 512) content -> (64, 216, 1) word image.

Rebuild of ``Decoder`` + ``assign_adain_params``
(GAN_word/modules_tro.py:586-607, 226-242).  The reference smuggles AdaIN
parameters and skip features into its norm layers by attribute mutation; here
the decoder takes them as explicit arguments — 2 AdaIN ResBlocks (4 AdaIN
sites), where site 1 fuses maxpool(style_pyramid[3]) and site 3 fuses
style_pyramid[4] via iAFF, then 3x [2x upsample + 5x5 conv + instance norm]
and a 7x7 tanh head.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from affganwriting_tpu.models.aff import AdaINFusion
from affganwriting_tpu.models.blocks import Conv2dBlock, pad2d


def split_adain_params(adain_params: jnp.ndarray, num_sites: int, dim: int):
    """(B, num_sites*2*dim) -> list of (mean (B,dim), std (B,dim)).

    Mirrors the sequential consumption in assign_adain_params
    (GAN_word/modules_tro.py:231-241): first half of each chunk is the mean
    (bias), second half the std (weight).
    """
    out = []
    for i in range(num_sites):
        chunk = adain_params[:, i * 2 * dim:(i + 1) * 2 * dim]
        out.append((chunk[:, :dim], chunk[:, dim:]))
    return out


class AdaINResBlock(nn.Module):
    """Residual block whose two convs are followed by AdaIN(+iAFF) sites."""

    dim: int = 512
    pad_type: str = "reflect"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, params0, params1, skip0=None, skip1=None, *,
                 train: bool = False):
        h = nn.Conv(self.dim, (3, 3), padding="VALID", dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv0")(
            pad2d(x, 1, self.pad_type))
        h = AdaINFusion(self.dim, self.dtype, name="adain0")(
            h, *params0, skip=skip0, train=train)
        h = nn.relu(h)
        h = nn.Conv(self.dim, (3, 3), padding="VALID", dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(
            pad2d(h, 1, self.pad_type))
        h = AdaINFusion(self.dim, self.dtype, name="adain1")(
            h, *params1, skip=skip1, train=train)
        return x + h


class Decoder(nn.Module):
    dim: int = 512
    ups: int = 3
    out_dim: int = 1
    pad_type: str = "reflect"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        content: jnp.ndarray,                 # (B, 8, 27, 512) mixed feature
        adain_params: jnp.ndarray,            # (B, 4096) from the text code
        style_pyramid: Sequence[jnp.ndarray], # 5 style-encoder taps, NHWC
        *,
        train: bool = False,
    ):
        sites = split_adain_params(adain_params, 4, self.dim)
        # skip injections (GAN_word/modules_tro.py:236-239):
        #   AdaIN site 1 <- maxpool2x2(style_pyramid[3]); site 3 <- pyramid[4]
        skip1 = nn.max_pool(style_pyramid[3], (2, 2), strides=(2, 2))
        skip3 = style_pyramid[4]

        x = AdaINResBlock(self.dim, self.pad_type, self.dtype, name="res0")(
            content, sites[0], sites[1], skip0=None, skip1=skip1, train=train)
        x = AdaINResBlock(self.dim, self.pad_type, self.dtype, name="res1")(
            x, sites[2], sites[3], skip0=None, skip1=skip3, train=train)

        dim = self.dim
        for i in range(self.ups):
            n, h, w, c = x.shape
            x = jax.image.resize(x, (n, h * 2, w * 2, c), method="nearest")
            dim //= 2
            x = Conv2dBlock(
                dim, 5, 1, 2, norm="in", activation="relu",
                pad_type=self.pad_type, dtype=self.dtype, name=f"up{i}",
            )(x, train=train)
        x = Conv2dBlock(
            self.out_dim, 7, 1, 3, norm="none", activation="tanh",
            pad_type=self.pad_type, dtype=self.dtype, name="head",
        )(x, train=train)
        return x
