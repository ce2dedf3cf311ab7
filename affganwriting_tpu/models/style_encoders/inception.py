"""InceptionV3 style encoder ("inception_v3" registry key).

Rebuild of ``ImageEncoderInceptionV3`` (GAN_word/inception.py:7-130): the
torchvision InceptionV3 trunk (shared with the FID extractor,
eval/inception_v3.py) over the 50-channel stack, tapped at Mixed_5c / 5d /
6b / 6e / 7c, each reduced to 512 by 1x1 convs (the reference infers reducer
widths with a probe forward; here shapes are static so they're declared),
last tap resized to ``final_hw``.  The reference softens the early strides
so h=48 inputs survive; we do the same for h < 128 by running the two
stride-2 stem convs at stride 1.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from affganwriting_tpu.eval.inception_v3 import (
    BasicConv,
    InceptionA,
    InceptionB,
    InceptionC,
    InceptionD,
    InceptionE,
)
from affganwriting_tpu.models.style_encoders import register


@register("inception_v3")
class InceptionStyleEncoder(nn.Module):
    style_dim: int = 512
    final_hw: tuple[int, int] = (8, 27)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        d = self.dtype
        soften = x.shape[1] < 128   # keep word-height maps alive
        s = 1 if soften else 2
        h = BasicConv(32, (3, 3), stride=s, padding=((1, 1), (1, 1)),
                      dtype=d, name="Conv2d_1a_3x3")(x)
        h = BasicConv(32, (3, 3), padding=((1, 1), (1, 1)), dtype=d,
                      name="Conv2d_2a_3x3")(h)
        h = BasicConv(64, (3, 3), padding=((1, 1), (1, 1)), dtype=d,
                      name="Conv2d_2b_3x3")(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        h = BasicConv(80, (1, 1), dtype=d, name="Conv2d_3b_1x1")(h)
        h = BasicConv(192, (3, 3), padding=((1, 1), (1, 1)), dtype=d,
                      name="Conv2d_4a_3x3")(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        taps = []
        h = InceptionA(32, dtype=d, name="Mixed_5b")(h)
        h = InceptionA(64, dtype=d, name="Mixed_5c")(h)
        taps.append(h)
        h = InceptionA(64, dtype=d, name="Mixed_5d")(h)
        taps.append(h)
        h = InceptionB(dtype=d, name="Mixed_6a")(h)
        h = InceptionC(128, dtype=d, name="Mixed_6b")(h)
        taps.append(h)
        h = InceptionC(160, dtype=d, name="Mixed_6c")(h)
        h = InceptionC(160, dtype=d, name="Mixed_6d")(h)
        h = InceptionC(192, dtype=d, name="Mixed_6e")(h)
        taps.append(h)
        h = InceptionD(dtype=d, name="Mixed_7a")(h)
        h = InceptionE("avg", dtype=d, name="Mixed_7b")(h)
        h = InceptionE("avg", dtype=d, name="Mixed_7c")(h)
        taps.append(h)

        results = []
        for i, tap in enumerate(taps):
            results.append(
                nn.Conv(self.style_dim, (1, 1), dtype=d,
                        param_dtype=jnp.float32, name=f"reduce{i}")(tap))
        n, _, _, c = results[-1].shape
        results[-1] = jax.image.resize(
            results[-1].astype(jnp.float32), (n, *self.final_hw, c),
            method="bilinear").astype(d)
        return results
