"""Writer classifier (GAN_word/modules_tro.py:170-201).

Same trunk as the discriminator; the head emits ``num_writers`` logits
consumed by a cross-entropy loss.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from affganwriting_tpu.models.blocks import Conv2dBlock
from affganwriting_tpu.models.discriminator import ConvPyramid


class WriterClassifier(nn.Module):
    num_writers: int = 500
    img_height: int = 64
    img_width: int = 216
    n_layers: int = 6
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = ConvPyramid(self.n_layers, dtype=self.dtype, name="cnn_f")(
            x, train=train)
        ks = self.img_height // (2 ** (self.n_layers - 1))
        st = self.img_width // (2 ** (self.n_layers - 1)) + 1
        h = Conv2dBlock(self.num_writers, ks, st, 0, norm="none",
                        activation="lrelu", activation_first=True,
                        dtype=self.dtype, name="cnn_c")(h, train=train)
        return h.reshape(h.shape[0], -1)  # (B, num_writers) logits
