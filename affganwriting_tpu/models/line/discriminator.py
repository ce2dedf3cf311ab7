"""Two-head spectral-norm patch discriminator.

Rebuild of ``DiscriminatorAP`` (line_generation/model/discriminator_ap.py:
68-161), active config "condAP wide, use low": group-normed 7x1-in conv,
spectral-normalized conv pyramid with height-shrinking (valid-height) 3x3
convs and avg-pool downsamples, a mid-resolution patch head ``finalMed``
and a further-pooled "low" head ``convs4``; hinge loss is applied per head
by the trainer.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from affganwriting_tpu.models.blocks import get_group_size


class DiscriminatorAP(nn.Module):
    dim: int = 64
    use_low: bool = True
    use_med: bool = True
    leak: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        def sn_conv(h, feats, kernel, padding, name):
            conv = nn.Conv(feats, kernel, padding=padding,
                           dtype=self.dtype, param_dtype=jnp.float32,
                           name=name)
            return nn.SpectralNorm(conv)(h, update_stats=train)

        def lrelu(h):
            return nn.leaky_relu(h, self.leak)

        d = self.dim
        # in_conv: 7x7, height-valid / width-pad-3, GroupNorm
        h = nn.Conv(d, (7, 7), padding=((0, 0), (3, 3)), dtype=self.dtype,
                    param_dtype=jnp.float32, name="in_conv")(x)
        h = nn.GroupNorm(num_groups=get_group_size(d),
                         dtype=jnp.float32)(h).astype(h.dtype)
        h = lrelu(h)

        # convs1
        h = lrelu(sn_conv(h, d, (3, 3), ((0, 0), (1, 1)), "c1a"))
        h = nn.avg_pool(h, (2, 2), strides=(2, 2))
        h = sn_conv(h, 2 * d, (3, 3), ((0, 0), (1, 1)), "c1b")
        h = nn.Dropout(0.05, broadcast_dims=(1, 2),
                       deterministic=not train)(h)
        h = lrelu(h)

        # convs2
        h = lrelu(sn_conv(h, 2 * d, (3, 3), ((0, 0), (1, 1)), "c2"))
        h = nn.avg_pool(h, (2, 2), strides=(2, 2))

        # convs3
        h = nn.Conv(2 * d, (3, 3), padding=((0, 0), (1, 1)),
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="c3a")(h)
        h = nn.GroupNorm(num_groups=get_group_size(2 * d),
                         dtype=jnp.float32)(h).astype(h.dtype)
        h = lrelu(h)
        h = nn.avg_pool(h, (2, 2), strides=(2, 2))
        h = sn_conv(h, 4 * d, (3, 3), ((0, 0), (1, 1)), "c3b")
        h = nn.Dropout(0.05, broadcast_dims=(1, 2),
                       deterministic=not train)(h)
        mid = lrelu(h)

        heads = []
        if self.use_med:
            p_med = sn_conv(mid, 1, (3, 3), ((0, 0), (1, 1)), "final_med")
            heads.append(p_med.reshape(p_med.shape[0], -1))
        if self.use_low:
            g = sn_conv(mid, 2 * d, (3, 3), ((0, 0), (1, 1)), "c4a")
            g = nn.Dropout(0.025, broadcast_dims=(1, 2),
                           deterministic=not train)(g)
            g = lrelu(g)
            g = nn.avg_pool(g, (1, 2), strides=(1, 2))
            for j, feats in enumerate((4 * d, 4 * d)):
                g = sn_conv(g, feats, (1, 3), ((0, 0), (1, 1)), f"c4b{j}")
                g = nn.Dropout(0.025, broadcast_dims=(1, 2),
                               deterministic=not train)(g)
                g = lrelu(g)
                if j == 0:
                    g = nn.avg_pool(g, (1, 2), strides=(1, 2))
            g = sn_conv(g, 4 * d, (1, 3), ((0, 0), (1, 1)), "c4c")
            g = nn.Dropout(0.025, broadcast_dims=(1, 2),
                           deterministic=not train)(g)
            g = lrelu(g)
            p_low = sn_conv(g, 1, (1, 1), ((0, 0), (0, 0)), "final_low")
            heads.append(p_low.reshape(p_low.shape[0], -1))
        return heads
