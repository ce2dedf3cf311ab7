"""Bahdanau + location attention for the recognizer decoder.

Rebuild of ``locationAttention``
(GAN_word/recognizer/models/attention.py:105-160): the previous attention
distribution is convolved with K=128 filters of width R=7 and projected into
the additive-attention energy alongside the (layer-averaged) decoder hidden
state and the projected encoder outputs.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class LocationAttention(nn.Module):
    hidden: int = 512
    filters: int = 128   # K
    kernel: int = 7      # R
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, enc_out, prev_attn, mask=None):
        """hidden: (L, B, H); enc_out: (B, T, H); prev_attn: (B, T).

        Returns attention weights (B, T), softmax over valid positions.
        """
        # average hidden over decoder layers (the addMask bmm trick,
        # attention.py:143-148)
        h_mean = jnp.mean(hidden, axis=0)                     # (B, H)
        h_att = nn.Dense(self.hidden, dtype=self.dtype,
                         param_dtype=jnp.float32,
                         name="hidden_proj")(h_mean)[:, None, :]
        conv_attn = nn.Conv(
            self.filters, (self.kernel,), padding=((3, 3),),
            dtype=self.dtype, param_dtype=jnp.float32, name="conv1d",
        )(prev_attn[:, :, None])                              # (B, T, K)
        conv_attn = nn.Dense(self.hidden, dtype=self.dtype,
                             param_dtype=jnp.float32,
                             name="prev_attn_proj")(conv_attn)
        enc_att = nn.Dense(self.hidden, dtype=self.dtype,
                           param_dtype=jnp.float32,
                           name="encoder_output_proj")(enc_out)
        energy = nn.Dense(1, dtype=self.dtype, param_dtype=jnp.float32,
                          name="out")(
            jnp.tanh(enc_att + h_att + conv_attn)
        )[..., 0]                                             # (B, T)
        if mask is not None:
            energy = jnp.where(mask, energy, -jnp.inf)
        return nn.softmax(energy, axis=-1)
