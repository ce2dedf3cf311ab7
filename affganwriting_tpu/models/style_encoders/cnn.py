"""Scratch CNN style encoder ("cnn" registry key).

Rebuild of ``ImageEncoderStyleCNN`` (GAN_word/cnn.py:132-195): a 6-stage
instance-normed, reflect-padded conv pyramid over the 50-channel style stack
with an anisotropic stride-(2,1) stage and a final tap resized to (8, 27).
Tap channel counts are [64, 128, 256, 512, 512, 512]; the decoder consumes
taps[3], taps[4] (both 512) as iAFF skips and taps[-1] as the mix feature.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from affganwriting_tpu.models.blocks import Conv2dBlock
from affganwriting_tpu.models.style_encoders import register


def _pad_w(x):
    """ReflectionPad2d((1, 1, 0, 0)): pad width only."""
    return jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="reflect")


@register("cnn")
class CNNStyleEncoder(nn.Module):
    final_hw: tuple[int, int] = (8, 27)
    style_dim: int = 512   # width of the decoder-facing taps (3, 4, last)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        cb = lambda f, k, s, p, name: Conv2dBlock(  # noqa: E731
            f, k, s, p, pad_type="reflect", norm="in", activation="relu",
            dtype=self.dtype, name=name,
        )
        d = self.style_dim
        r1 = cb(64, 5, 1, 2, "enc1")(x, train=train)
        h = cb(128, 3, 1, 1, "enc2a")(r1, train=train)
        r2 = cb(128, 3, 1, 1, "enc2b")(h, train=train)

        h = cb(256, 4, 2, 1, "enc3a")(r2, train=train)
        r3 = cb(256, 3, 1, 0, "enc3b")(_pad_w(h), train=train)

        h = cb(d, 4, 2, 1, "enc4a")(r3, train=train)
        r4 = cb(d, 3, 1, 0, "enc4b")(_pad_w(h), train=train)

        h = Conv2dBlock(d, (4, 4), (2, 1), 0, pad_type="reflect", norm="in",
                        activation="relu", dtype=self.dtype, name="enc5")(
            _pad_w(r4), train=train)
        r5 = nn.avg_pool(
            jnp.pad(h, ((0, 0), (0, 0), (1, 1), (0, 0))),
            (1, 3), strides=(1, 2), padding="VALID",
        )
        r6 = cb(d, 3, 1, 1, "enc6")(r5, train=train)
        n, _, _, c = r6.shape
        r6 = jax.image.resize(
            r6.astype(jnp.float32), (n, *self.final_hw, c), method="bilinear"
        ).astype(self.dtype)
        return [r1, r2, r3, r4, r5, r6]
