"""HWWithStyle — the line-generation model container.

Rebuild of line_generation/model/hw_with_style.py:81-377 (active config:
CharStyleEncoder single-style, CountCNN 'duplicates' spacer, SpacedGenerator
with appended style, frozen CNNOnly HWR).  TPU-first differences:

  * ``insert_spaces`` (hw_with_style.py:318-344) samples per-char blank /
    duplicate counts and builds the spaced one-hot **at a static length**
    ``max_gen_length`` via interval arithmetic (cumsum of run lengths +
    broadcast comparisons) instead of Python list building; over-long lines
    lose trailing blanks exactly like the reference's clipping;
  * the DTW alignment ``correct_pred`` (hw_with_style.py:18-74) lives in
    ``affganwriting_tpu/ops/dtw.py`` as a batch-vectorized routine;
  * all sampling flows from explicit PRNG keys ('spacing' / 'noise'
    collections) — same key, same line.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from affganwriting_tpu.models.line.char_style import CharStyleEncoder
from affganwriting_tpu.models.line.count_cnn import CountCNN
from affganwriting_tpu.models.line.hwr import CNNOnlyHWR, CRNN, SmallCRNN
from affganwriting_tpu.models.line.spaced_gen import SpacedGenerator


def insert_spaces(
    label: jnp.ndarray,        # (B, T) class ids (0 = blank, unused here)
    label_lengths: jnp.ndarray,  # (B,)
    counts: jnp.ndarray,       # (B, T, 2): blank count, duplicate count
    key: jax.Array,
    n_class: int,
    max_len: int,
    count_std: float = 1e-8,
    dup_std: float = 1e-9,
):
    """Sampled spacing -> (spaced one-hot (B, L, K), padded fraction (B,))."""
    b, t = label.shape
    k1, k2 = jax.random.split(key)
    blanks = jnp.round(
        counts[..., 0] + count_std * jax.random.normal(k1, (b, t)))
    dups = jnp.round(
        counts[..., 1] + dup_std * jax.random.normal(k2, (b, t)))
    blanks = jnp.clip(blanks, 0, None)
    dups = jnp.clip(dups, 0, None)
    valid = jnp.arange(t)[None, :] < label_lengths[:, None]
    blanks = jnp.where(valid, blanks, 0.0)
    dups = jnp.where(valid, dups, 0.0)

    run = blanks + dups
    start = jnp.cumsum(run, axis=1) - run          # (B, T) run starts
    char_start = start + blanks
    char_end = char_start + dups

    pos = jnp.arange(max_len, dtype=jnp.float32)   # (L,)
    # in_char[b, l, t] = char t occupies position l
    in_char = (pos[None, :, None] >= char_start[:, None, :]) & (
        pos[None, :, None] < char_end[:, None, :]) & valid[:, None, :]
    onehot = jax.nn.one_hot(label, n_class)        # (B, T, K)
    spaced = jnp.einsum("blt,btk->blk", in_char.astype(jnp.float32), onehot)
    is_blank = jnp.sum(spaced, axis=-1) < 0.5
    spaced = spaced.at[:, :, 0].set(is_blank.astype(jnp.float32))

    total = jnp.sum(run, axis=1)
    padded = jnp.clip((max_len - total) / max_len, 0.0, 1.0)
    return spaced, padded


class HWWithStyle(nn.Module):
    n_class: int = 80
    style_dim: int = 128
    gen_dim: int = 256
    hwr_type: str = "cnn_only"     # 'cnn_only' | 'crnn' | 'small_crnn'
    hwr_norm: str = "batch"
    max_gen_length: int = 500
    count_std: float = 1e-8
    dup_std: float = 1e-9
    # char_style_dim > 0 selects the multi-style extractor (reference
    # char_style.py:210-310): per-class private styles + fill_pred.  The
    # style the container hands around stays ONE array — (g_style,
    # spacing_style, char_style) packed along the feature axis — so the
    # trainer's style bank / interpolation / checkpoint plumbing is
    # unchanged; unpacking happens where the parts are consumed.
    char_style_dim: int = 0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.hwr_type == "crnn":
            self.hwr = CRNN(self.n_class, norm=self.hwr_norm,
                            dtype=self.dtype, name="hwr")
        elif self.hwr_type == "small_crnn":
            self.hwr = SmallCRNN(self.n_class, norm=self.hwr_norm,
                                 dtype=self.dtype, name="hwr")
        else:
            self.hwr = CNNOnlyHWR(self.n_class, norm=self.hwr_norm,
                                  dtype=self.dtype, name="hwr")
        if self.char_style_dim > 0:
            from affganwriting_tpu.models.line.char_style_multi import (
                MultiCharStyleEncoder,
            )

            self.style_extractor = MultiCharStyleEncoder(
                n_class=self.n_class, style_dim=self.style_dim,
                char_style_dim=self.char_style_dim,
                dtype=self.dtype, name="style_extractor")
        else:
            self.style_extractor = CharStyleEncoder(
                n_class=self.n_class, style_dim=self.style_dim,
                dtype=self.dtype, name="style_extractor")
        self.spacer = CountCNN(self.n_class, self.style_dim, name="spacer")
        self.generator = SpacedGenerator(
            self.n_class, self.style_dim, self.gen_dim,
            char_style_dim=self.char_style_dim,
            dtype=self.dtype, name="generator")

    def _pack_style(self, g, spacing, char):
        b = g.shape[0]
        return jnp.concatenate(
            [g, spacing, char.reshape(b, -1)], axis=-1)

    def _unpack_style(self, style):
        d = self.char_style_dim
        g = style[:, : self.style_dim]
        spacing = style[:, self.style_dim: self.style_dim + d]
        char = style[:, self.style_dim + d:].reshape(
            style.shape[0], self.n_class, d)
        return g, spacing, char

    def init_all(self, image, label, label_lengths, *, train: bool = False):
        """Touches every submodule — use as the ``method=`` for ``init`` so
        all parameters exist regardless of which lesson runs first."""
        style, pred = self.extract_style(image, train=train)
        img, spaced, counts = self(label, label_lengths, style, train=train)
        return img, style, pred

    def recognize(self, image, *, train: bool = False):
        return self.hwr(image, train=train)

    def extract_style(self, image, a_batch_size: int = 1, *,
                      train: bool = False):
        """Author batches are concatenated width-wise before extraction
        (hw_with_style.py:297-316); the style repeats per author member."""
        pred = self.hwr(image, train=False)        # frozen-HWR semantics
        b, h, w, c = image.shape
        if a_batch_size > 1:
            na = b // a_batch_size
            img_cat = image.reshape(na, a_batch_size, h, w, c)
            img_cat = jnp.concatenate(
                [img_cat[:, i] for i in range(a_batch_size)], axis=2)
            pred_cat = pred.reshape(na, a_batch_size, *pred.shape[1:])
            pred_cat = jnp.concatenate(
                [pred_cat[:, i] for i in range(a_batch_size)], axis=1)
            style = self.style_extractor(img_cat, pred_cat, train=train)
            if self.char_style_dim > 0:
                style = self._pack_style(*style)
            style = jnp.repeat(style, a_batch_size, axis=0)
        else:
            style = self.style_extractor(image, pred, train=train)
            if self.char_style_dim > 0:
                style = self._pack_style(*style)
        return style, pred

    def space(self, label, label_lengths, style, *, train: bool = False):
        onehot = jax.nn.one_hot(label, self.n_class)
        g = (style if self.char_style_dim == 0
             else self._unpack_style(style)[0])
        counts = self.spacer(onehot, g, train=train)
        key = self.make_rng("spacing")
        spaced, padded = insert_spaces(
            label, label_lengths, counts, key, self.n_class,
            self.max_gen_length, self.count_std, self.dup_std)
        return spaced, counts, padded

    def __call__(self, label, label_lengths, style, spaced=None, *,
                 train: bool = False):
        """label (B, T) -> generated line (B, 64, 4*L, 1)."""
        counts = None
        if spaced is None:
            spaced, counts, _ = self.space(
                label, label_lengths, style, train=train)
        if self.char_style_dim > 0:
            from affganwriting_tpu.models.line.char_style_multi import (
                space_style,
            )

            g, spacing, char = self._unpack_style(style)
            pos = space_style(spaced, char, spacing)
            img = self.generator(spaced, g, pos)
        else:
            img = self.generator(spaced, style)
        return img, spaced, counts

    def generate(self, label, label_lengths, style, *, train: bool = False):
        img, _, _ = self(label, label_lengths, style, train=train)
        return img
