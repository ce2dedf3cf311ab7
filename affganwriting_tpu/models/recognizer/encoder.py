"""Recognizer visual encoder: VGG19-BN trunk + 2-layer BiGRU.

Rebuild of the active ``Encoder`` (GAN_word/recognizer/models/encoder_vgg.py:
669-765) with the cfg-'E' VGG19-BN of recognizer/models/vgg_tro_channel3.py
(4 max-pools, so 64x216 -> 4x13x512).  The torch version packs variable
widths into a packed sequence; all word images here are a fixed 216 wide
(the reference also always passes IMG_WIDTH, network_tro.py:43), so the
packed-sequence machinery reduces to a plain scan — masks are still
threaded for future variable-width use.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

_VGG19_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512)


class VGGTrunk(nn.Module):
    """cfg-'E' VGG19 with BatchNorm, 3-channel input, no classifier head."""

    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        ci = 0
        for v in _VGG19_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(v, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=f"conv{ci}")(x)
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=jnp.float32,
                                 name=f"bn{ci}")(x)
                x = nn.relu(x).astype(self.dtype)
                ci += 1
        return x


class BiGRU(nn.Module):
    """2-layer bidirectional GRU, outputs sum-merged over directions.

    Returns (outputs (B, T, H), dec_init_hidden (layers, B, H)) where the
    decoder init uses the *backward* finals of each layer — the torch code's
    ``hidden[[1, 3]]`` selection (encoder_vgg.py:747-750).
    """

    hidden: int = 512
    layers: int = 2
    dropout: float = 0.5
    dtype: jnp.dtype = jnp.float32
    # lax.scan unroll factor for the recurrences.  The sequence is a fixed
    # 13 columns; full unroll turns each RNN into straight-line HLO so XLA
    # can software-pipeline the tiny per-step matmuls (the train step is
    # latency-bound on these scans, docs/ARCHITECTURE.md round-3 table).
    unroll: int = 1

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        finals_bwd = []
        h = x
        for li in range(self.layers):
            fwd_cell = nn.GRUCell(self.hidden, dtype=self.dtype,
                                  param_dtype=jnp.float32)
            bwd_cell = nn.GRUCell(self.hidden, dtype=self.dtype,
                                  param_dtype=jnp.float32)
            fwd_carry, fwd = nn.RNN(fwd_cell, name=f"fwd{li}",
                                    return_carry=True, unroll=self.unroll)(h)
            bwd_carry, bwd = nn.RNN(bwd_cell, name=f"bwd{li}",
                                    return_carry=True, unroll=self.unroll)(
                h, reverse=True, keep_order=True)
            finals_bwd.append(bwd_carry)
            h = jnp.concatenate([fwd, bwd], axis=-1)
            if li < self.layers - 1:
                h = nn.Dropout(self.dropout, deterministic=not train)(h)
        out = h[..., : self.hidden] + h[..., self.hidden:]
        hidden0 = jnp.stack(finals_bwd, axis=0)
        return out, hidden0


class RecEncoder(nn.Module):
    """(B, 64, 216, 1 or 3) grayscale word -> (enc_out (B, 13, 512), h0).

    ``from_feat`` is the post-trunk tail: it lets the int8 serving path
    (ops/quant.py:vgg_quant_apply) replace the VGG forward while the
    BiGRU + decoder stay bf16/f32 — setup-style so both entry points bind
    the same "vgg"/"rnn" parameter subtrees (checkpoint layout unchanged).
    """

    hidden: int = 512
    dropout: float = 0.5
    dtype: jnp.dtype = jnp.bfloat16
    # BiGRU compute dtype: f32 by default (training numerics over the
    # 13-step recurrence); bf16 is available for inference serving
    rnn_dtype: jnp.dtype = jnp.float32
    unroll: int = 1

    def setup(self):
        self.vgg = VGGTrunk(dtype=self.dtype)
        self.rnn = BiGRU(self.hidden, dropout=self.dropout,
                         dtype=self.rnn_dtype, unroll=self.unroll)
        # Dropout2d(0.5) on the conv output (encoder_vgg.py:687,712)
        self.feat_drop = nn.Dropout(self.dropout, broadcast_dims=(1, 2))

    def __call__(self, img, *, train: bool = False):
        if img.shape[-1] == 1:
            # gray -> 3 channels (GAN_word/modules_tro.py:636)
            img = jnp.concatenate([img] * 3, axis=-1)
        feat = self.vgg(img, train=train)
        return self.from_feat(feat, train=train)

    def from_feat(self, feat, *, train: bool = False):
        """Trunk features (B, 4, 13, 512) -> (enc_out, dec init hidden)."""
        if train:
            feat = self.feat_drop(feat, deterministic=not train)
        b, h, w, c = feat.shape
        # (B, H, W, C) -> (B, W, H*C): width is the sequence axis; the
        # torch reshape flattens (height, channel) in that order
        seq = feat.transpose(0, 2, 1, 3).reshape(b, w, h * c)
        seq = seq.astype(self.rnn_dtype)
        return self.rnn(seq, train=train)
