"""Text encoder: char embeddings -> AdaIN params + spatial content map.

Rebuild of ``TextEncoder_FC`` (GAN_word/modules_tro.py:268-317).  The
reference builds the content map with a Python loop of per-char concats; here
it is one ``jnp.repeat`` + broadcast, which XLA lowers to a single gather.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from affganwriting_tpu.core.config import VOCAB


class TextEncoderFC(nn.Module):
    """labels (B, T) -> (adain_params (B, 4096), content map (B, H, W, 512)).

    The FC pyramid 768->1024->2048->4096 produces the AdaIN (mean, std)
    parameters; the "embed content force" branch tiles a per-char 512-d
    projection across the style-feature grid: each of the T chars occupies
    ``W // T`` columns, remaining ``W % T`` columns carry the PAD-char
    embedding, rows are broadcast over the height
    (GAN_word/modules_tro.py:292-317).
    """

    max_len: int = 12
    vocab_size: int = VOCAB.size
    embed_dim: int = 64
    content_dim: int = 512
    adain_dim: int = 4096
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, labels, feat_hw: tuple[int, int], *, train: bool = False):
        b, t = labels.shape
        h, w = feat_hw
        embed = nn.Embed(
            self.vocab_size, self.embed_dim,
            dtype=self.dtype, param_dtype=jnp.float32, name="embed",
        )
        xx = embed(labels)                                  # (B, T, E)

        # --- AdaIN-parameter pyramid ---
        out = xx.reshape(b, t * self.embed_dim)
        for i, feats in enumerate((1024, 2048)):
            out = nn.Dense(feats, dtype=self.dtype, param_dtype=jnp.float32,
                           name=f"fc{i}")(out)
            out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                               dtype=jnp.float32)(out)
            out = nn.relu(out).astype(self.dtype)
        out = nn.Dense(self.adain_dim, dtype=self.dtype,
                       param_dtype=jnp.float32, name="fc2")(out)

        # --- content force map ---
        proj = nn.Dense(self.content_dim, dtype=self.dtype,
                        param_dtype=jnp.float32, name="linear")
        xx_new = proj(xx)                                   # (B, T, 512)
        width_reps = max(1, w // t)
        body = jnp.repeat(xx_new, width_reps, axis=1)       # (B, T*reps, 512)
        pad_cols = w - body.shape[1]
        if pad_cols > 0:
            pad_vec = proj(embed(jnp.full((1, 1), VOCAB.pad, dtype=labels.dtype)))
            pad_block = jnp.broadcast_to(
                pad_vec, (b, pad_cols, self.content_dim)
            ).astype(body.dtype)
            body = jnp.concatenate([body, pad_block], axis=1)
        else:
            body = body[:, :w]
        content = jnp.broadcast_to(
            body[:, None, :, :], (b, h, w, self.content_dim)
        )
        return out, content
