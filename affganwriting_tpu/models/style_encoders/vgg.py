"""VGG19-IN style encoder ("vgg19" registry key) — the legacy backbone.

Rebuild of ``ImageEncoder`` + the modified ``vgg19_bn``
(GAN_word/modules_tro.py:331-374, vgg_tro_channel3_modi.py:40-90): cfg-'E'
with the first max-pool removed, InstanceNorm instead of BatchNorm, 50-ch
input, tapped into 6 stages.  Tap channels [64, 128, 256, 512, 512, 512];
for 64x216 input the taps are full, full, /2, /4, /8, /8 resolution and the
last is resized to ``final_hw``.  The reference wraps each tap stage in
``nn.DataParallel`` (modules_tro.py:341-346) — here the batch axis is simply
sharded over the mesh's 'data' axis, which is the SPMD generalization.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from affganwriting_tpu.ops.norms import instance_norm
from affganwriting_tpu.models.style_encoders import register

# (channels, pool_before) per conv, grouped into 6 tap stages; derived from
# cfg 'E' modi [64,64,128,128,M,256x4,M,512x4,M,512x4] sliced at
# [:3],[3:9],[9:16],[16:29],[29:42],[42:]
_STAGES = (
    ((64, False),),
    ((64, False), (128, False)),
    ((128, False), (256, True)),
    ((256, False), (256, False), (256, False), (512, True)),
    ((512, False), (512, False), (512, False), (512, True)),
    ((512, False), (512, False), (512, False),),
)


@register("vgg19")
class VGG19StyleEncoder(nn.Module):
    final_hw: tuple[int, int] = (8, 27)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        taps = []
        ci = 0
        for stage in _STAGES:
            for feats, pool_before in stage:
                if pool_before:
                    x = nn.max_pool(x, (2, 2), strides=(2, 2))
                x = nn.Conv(feats, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=f"conv{ci}")(x)
                x = instance_norm(x)
                x = nn.relu(x)
                ci += 1
            taps.append(x)
        n, _, _, c = taps[-1].shape
        taps[-1] = jax.image.resize(
            taps[-1].astype(jnp.float32), (n, *self.final_hw, c),
            method="bilinear").astype(self.dtype)
        return taps
