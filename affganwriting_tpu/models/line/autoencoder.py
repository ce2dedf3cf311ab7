"""Perceptual autoencoder ('2tight' variant).

Rebuild of line_generation/model/autoencoder.py:8-769 in the configuration
the GAN trainer consumes (``auto "2tight"``: a 32-d bottleneck conv AE whose
*encoder's multi-scale features* implement the perceptual loss — the trainer
runs the encoder over cat(real, recon) and L1s the feature pairs,
hw_with_style_trainer.py:735-758).  ``encode`` returns the feature pyramid,
``__call__`` the reconstruction.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from affganwriting_tpu.models.blocks import get_group_size


class Autoencoder(nn.Module):
    dim: int = 64
    bottleneck: int = 32
    out_dim: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False, return_features=False):
        feats = []
        h = x
        d = self.dim
        # encoder: 4 stride-2 stages, GroupNorm + ReLU, tapped per stage
        widths = (d, 2 * d, 4 * d, 4 * d)
        for i, feat in enumerate(widths):
            h = nn.Conv(feat, (4, 4), strides=(2, 2),
                        padding=((1, 1), (1, 1)), dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"enc{i}")(h)
            h = nn.GroupNorm(num_groups=get_group_size(feat),
                             dtype=jnp.float32)(h).astype(h.dtype)
            h = nn.relu(h)
            feats.append(h)
        z = nn.Conv(self.bottleneck, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="to_z")(h)
        feats.append(z)
        if return_features:
            return feats

        h = z
        for i, feat in enumerate(reversed(widths)):
            n, hh, ww, c = h.shape
            h = jax.image.resize(h, (n, hh * 2, ww * 2, c), method="nearest")
            h = nn.Conv(feat, (3, 3), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"dec{i}")(h)
            h = nn.GroupNorm(num_groups=get_group_size(feat),
                             dtype=jnp.float32)(h).astype(h.dtype)
            h = nn.relu(h)
        out = nn.Conv(self.out_dim, (5, 5), padding=((2, 2), (2, 2)),
                      dtype=self.dtype, param_dtype=jnp.float32,
                      name="head")(h)
        return jnp.tanh(out)

    def encode(self, x, *, train: bool = False):
        return self(x, train=train, return_features=True)
