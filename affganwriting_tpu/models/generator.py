"""Generator: style encoder + text encoder + mix + AdaIN decoder.

Rebuild of ``GenModel_FC`` (GAN_word/modules_tro.py:208-266).  The public
surface is functional: ``encode_style`` runs once per style stack (the
expensive half), ``generate`` consumes a cached pyramid with any number of
words — which is exactly the batched-inference split the reference performs
manually in tt.test_single_writer (encode once per writer, loop words).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from affganwriting_tpu.core.config import WordGanConfig
from affganwriting_tpu.models.decoder import Decoder
from affganwriting_tpu.models.style_encoders import get_style_encoder
from affganwriting_tpu.models.text_encoder import TextEncoderFC


class SplitMix(nn.Module):
    """Dense over concat([style, content]) without the concat.

    Kernel shape/path identical to ``nn.Dense`` over the concatenation
    ((style_dim + content_dim, features) at 'linear_mix/kernel'), applied as
    ``style @ K[:ds] + content @ K[ds:] + b`` — exact same math, but a
    batch-1 style term broadcasts against batch-B content, which is what
    lets inference keep the per-writer pyramid un-tiled.
    """

    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, style_last, content):
        ds = style_last.shape[-1]
        din = ds + content.shape[-1]
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (din, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
        k = k.astype(self.dtype)
        s = jnp.einsum("bhwc,cf->bhwf", style_last.astype(self.dtype),
                       k[:ds], preferred_element_type=jnp.float32)
        c = jnp.einsum("bhwc,cf->bhwf", content.astype(self.dtype),
                       k[ds:], preferred_element_type=jnp.float32)
        return (s + c + b).astype(self.dtype)


class Generator(nn.Module):
    config: WordGanConfig
    # int8 serving mode for the decoder's convs (models/decoder.py quant
    # flag).  Same parameter tree as the bf16 generator — construct
    # Generator(cfg, quant=True) and apply the trained variables.
    # quant_mode "static" additionally needs the calibrated "quant"
    # collection from a quant_mode="calib" forward.
    quant: bool = False
    quant_mode: str = "dynamic"
    # exact-mode escape hatch (same param tree): Generator(cfg,
    # subpixel=False) applies trained variables through the reference
    # upsample+conv path — the fast-vs-exact quality A/B runs on this
    # (scripts/ab_subpixel_quality.py)
    subpixel: bool = True

    def setup(self):
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        # style map geometry scales with the image: (H/8, W/8) = (8, 27)
        # for the reference's 64x216 words
        final_hw = (cfg.img_height // 8, cfg.img_width // 8)
        # pass style_dim only when non-default: fixed-width backbones
        # (vgg19) have no reducer to shrink and reject the kwarg loudly
        extra = {} if cfg.style_dim == 512 else {"style_dim": cfg.style_dim}
        self.enc_image = get_style_encoder(
            cfg.style_encoder, dtype=dtype, final_hw=final_hw, **extra)
        self.text_encoder = TextEncoderFC(
            max_len=cfg.output_max_len,
            vocab_size=cfg.vocab_size,
            embed_dim=cfg.text_embed_dim,
            content_dim=cfg.style_dim,
            adain_dim=cfg.adain_param_dim,
            dtype=dtype,
        )
        self.dec = Decoder(dim=cfg.style_dim, dtype=dtype, quant=self.quant,
                           quant_mode=self.quant_mode,
                           subpixel_upsample=self.subpixel)
        # mix: concat(style[-1], content) channels -> Dense back to style_dim
        # (GAN_word/modules_tro.py:252-259).  Implemented as a split dense
        # (same kernel layout) so a batch-1 style feature broadcasts against
        # a batch-B content without materializing the tiled concat — the
        # style half of the matmul runs ONCE per writer.
        self.linear_mix = SplitMix(
            cfg.style_dim, dtype=dtype, name="linear_mix")

    def encode_style(self, style_stack, *, train: bool = False):
        """(B, 64, 216, 50) -> 5-tap pyramid, last tap (B, 8, 27, 512)."""
        return self.enc_image(style_stack, train=train)

    def encode_text(self, labels, feat_hw, *, train: bool = False):
        return self.text_encoder(labels, feat_hw, train=train)

    def mix(self, style_last, content):
        return self.linear_mix(style_last, content)

    def decode(self, mixed, adain_params, pyramid: Sequence, *,
               train: bool = False):
        return self.dec(mixed, adain_params, pyramid, train=train)

    def generate(self, pyramid: Sequence, labels, *, train: bool = False):
        """Style pyramid + labels (B, T) -> image (B, 64, 216, 1)."""
        f_xs = pyramid[-1]
        adain_params, content = self.encode_text(
            labels, f_xs.shape[1:3], train=train)
        mixed = self.mix(f_xs, content)
        return self.decode(mixed, adain_params, pyramid, train=train)

    def __call__(self, style_stack, labels, *, train: bool = False):
        pyramid = self.encode_style(style_stack, train=train)
        return self.generate(pyramid, labels, train=train)
