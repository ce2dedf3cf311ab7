"""VGG19-BN 1-D backbone for char-style extraction.

Rebuild of line_generation/model/char_style_vgg.py:1-67 (a defined-but-
unwired variant in the reference): VGG19-BN features over the 1-channel
line image, vertical global-average-pool to a width strip, then a 1x1
adapter to the encoder dim.  The reference adapts the first conv by
averaging its RGB weights into one channel; here the grayscale input is
repeated to three channels instead — with imported weights the conv output
differs only by a 3x scale the following BatchNorm removes.

Freezing early blocks (the reference's ``freeze_to_block``) is an
optimizer concern in this framework: pass the param-name patterns to the
trainer's ``freeze_param_names`` (train/schedules.py partitioned
optimizer) rather than flagging modules.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from affganwriting_tpu.models.recognizer.encoder import VGGTrunk


class VGG19Backbone1D(nn.Module):
    """(B, H, W, 1) line image -> (B, W', out_dim) character-style strip."""

    out_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        f = VGGTrunk(dtype=self.dtype, name="vgg")(
            jnp.concatenate([x] * 3, axis=-1), train=train)
        seq = jnp.mean(f, axis=1)                      # vertical GAP
        return nn.Conv(self.out_dim, (1,), dtype=self.dtype,
                       param_dtype=jnp.float32, name="adapter")(seq)
