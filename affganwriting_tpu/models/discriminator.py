"""Patch discriminator (GAN_word/modules_tro.py:119-168).

A 6-stage pre-activation conv pyramid (16 -> 1024 channels, reflect-padded
3x3 avg-pool downsamples) whose head convolves the 2x7 final map into a
1024-dim "patch" vector scored with per-element BCE against all-ones /
all-zeros.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from affganwriting_tpu.models.blocks import (
    ActFirstResBlock,
    Conv2dBlock,
    avg_pool_3x3_s2_refpad,
)


class ConvPyramid(nn.Module):
    """Shared D / writer-classifier trunk."""

    n_layers: int = 6
    nf0: int = 16
    max_nf: int = 1024
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        nf = self.nf0
        h = Conv2dBlock(nf, 7, 1, 3, pad_type="reflect", norm="none",
                        activation="none", dtype=self.dtype, name="stem")(x)
        for i in range(self.n_layers - 1):
            nf_out = min(nf * 2, self.max_nf)
            h = ActFirstResBlock(nf, nf, None, "lrelu", "none",
                                 dtype=self.dtype, name=f"res{i}a")(h, train=train)
            h = ActFirstResBlock(nf, nf_out, None, "lrelu", "none",
                                 dtype=self.dtype, name=f"res{i}b")(h, train=train)
            h = avg_pool_3x3_s2_refpad(h)
            nf = nf_out
        nf_out = min(nf * 2, self.max_nf)
        h = ActFirstResBlock(nf, nf, None, "lrelu", "none",
                             dtype=self.dtype, name="res_final_a")(h, train=train)
        h = ActFirstResBlock(nf, nf_out, None, "lrelu", "none",
                             dtype=self.dtype, name="res_final_b")(h, train=train)
        return h


class Discriminator(nn.Module):
    img_height: int = 64
    img_width: int = 216
    final_size: int = 1024
    n_layers: int = 6
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = ConvPyramid(self.n_layers, dtype=self.dtype, name="cnn_f")(
            x, train=train)
        # head kernel/stride from image geometry (modules_tro.py:139):
        # kernel = H // 2^(n-1), stride = W // 2^(n-1) + 1  -> (2, .) k, 7 s
        ks = self.img_height // (2 ** (self.n_layers - 1))
        st = self.img_width // (2 ** (self.n_layers - 1)) + 1
        h = Conv2dBlock(self.final_size, ks, st, 0, norm="none",
                        activation="lrelu", activation_first=True,
                        dtype=self.dtype, name="cnn_c")(h, train=train)
        return h.reshape(h.shape[0], -1)  # (B, 1024) patch logits
