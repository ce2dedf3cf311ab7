"""Multi-style CharStyleEncoder (char_style_dim > 0 path).

Rebuild of the non-single-style branch of ``CharStyleEncoder``
(line_generation/model/char_style.py:210-310): per found character class a
private style vector is extracted (recognition-score-weighted average over
that char's windows) and a per-class ``fill_pred`` net predicts the styles
of *all other* classes from it; predictions are averaged across found
classes, found classes' own styles substituted back (mixing factor
``average_found_char_style``), and a global+spacing style pair comes from
the shared trunk.  Returns ``(g_style, spacing_style, char_style[B,K,D])``.

Dense TPU recast: the per-class weighted averages are one one-hot
segment-sum einsum; the banked fill_pred is a per-class stacked-parameter
einsum — no ragged control flow (SURVEY.md §7.3).

Note the parameter volume: fill_pred is K separate Linear(2D -> K*D) nets —
O(K^2 * D^2 / ...) parameters exactly like the torch ModuleList; keep D
modest (the reference's multi-style configs do too).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from affganwriting_tpu.models.line.char_style import (
    CharExtractorBank,
    CharStyleEncoder,
)


class MultiCharStyleEncoder(nn.Module):
    n_class: int = 80
    dim: int = 64
    style_dim: int = 128        # g_style size
    char_style_dim: int = 32    # per-char style size (D)
    char_dim: int = 64
    window: int = 2
    max_chars: int = 32
    average_found_char_style: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image, recog, *, train: bool = False):
        k = self.n_class
        d = self.char_style_dim

        # shared trunk + window selection from the single-style encoder
        base = CharStyleEncoder(
            n_class=k, dim=self.dim, style_dim=self.style_dim,
            char_dim=self.char_dim, window=self.window,
            max_chars=self.max_chars, dtype=self.dtype, name="base")
        # we need the intermediate strip machinery; reuse by re-deriving:
        # run base's down trunk through its own __call__ is not separable,
        # so the multi encoder re-implements the selection with its own
        # params (it is a sibling architecture, not a wrapper, in the
        # reference too).
        del base

        trunk = CharStyleEncoder(
            n_class=k, dim=self.dim, style_dim=self.style_dim + d,
            char_dim=self.char_dim, window=self.window,
            max_chars=self.max_chars, dtype=self.dtype, name="trunk")
        # trunk's final projection yields style_dim + D; split into
        # (spacing_style, g_style) like final_g_spacing_style
        comb = trunk(image, recog, train=train)
        spacing_style = comb[:, :d]
        g_style = comb[:, d:]

        # --- per-class found styles -----------------------------------
        b = image.shape[0]
        # re-derive the per-column class/weight/patch selection on the
        # recognition grid (cheap; recog is given)
        t = recog.shape[1]
        pred = jnp.argmax(recog, axis=-1)
        score = jnp.exp(jnp.max(recog, axis=-1))
        nonblank = pred != 0
        masked = jnp.where(nonblank, score, -1.0)
        n = min(self.max_chars, t)
        top_score, top_idx = jax.lax.top_k(masked, n)
        valid = top_score > 0.0
        classes = jnp.take_along_axis(pred, top_idx, axis=1)      # (B, N)
        weights = jnp.where(valid, top_score, 0.0)                # (B, N)

        # per-column styles from a bank over the *recognition one-hot*
        # context (the image trunk features live in `trunk`; a compact
        # context window of recog suffices for the per-char head here)
        w = self.window
        recog_p = jnp.pad(recog, ((0, 0), (w, w), (0, 0)))
        offs = jnp.arange(2 * w + 1)
        gidx = (top_idx[:, :, None] + offs[None, None, :]).reshape(b, -1)
        patches = jnp.take_along_axis(
            recog_p, gidx[..., None], axis=1
        ).reshape(b, n, 2 * w + 1, k).astype(jnp.float32)
        col_styles = CharExtractorBank(
            k, k, self.char_dim, d, name="char_extractor")(patches, classes)

        onehot = jax.nn.one_hot(classes, k) * weights[..., None]  # (B, N, K)
        per_class_sum = jnp.einsum("bnk,bnd->bkd", onehot, col_styles)
        per_class_w = jnp.sum(onehot, axis=1)                     # (B, K)
        found = per_class_sum / jnp.maximum(per_class_w[..., None], 1e-8)
        found_mask = (per_class_w > 0).astype(jnp.float32)        # (B, K)

        # --- fill_pred: predict all classes' styles from each found one
        init = nn.initializers.lecun_normal()
        w1 = self.param("fill_w1", init, (k, d, 2 * d), jnp.float32)
        b1 = self.param("fill_b1", nn.initializers.zeros, (k, 2 * d))
        w2 = self.param("fill_w2", init, (k, 2 * d, k * d), jnp.float32)
        b2 = self.param("fill_b2", nn.initializers.zeros, (k, k * d))
        h = nn.relu(jnp.einsum("bkd,kde->bke", found, w1) + b1[None])
        fill = jnp.einsum("bke,kef->bkf", h, w2) + b2[None]       # (B,K,K*D)
        fill = fill.reshape(b, k, k, d)                           # src,dst
        denom = jnp.maximum(jnp.sum(found_mask, axis=1), 1.0)
        all_char = jnp.einsum(
            "bk,bkjd->bjd", found_mask, fill) / denom[:, None, None]

        # substitute found classes' own styles, mixing factor lambda
        lam = self.average_found_char_style
        mixed = found * (1 - lam) + all_char * lam
        char_style = jnp.where(
            found_mask[..., None] > 0, mixed, all_char)
        return g_style, spacing_style, char_style


def space_style(spaced, styles, blank_style):
    """Scatter per-char styles along the spaced sequence
    (hw_with_style.py:357-377): char positions get their class's style,
    blanks get the spacing style.

    spaced: (B, L, K) one-hot; styles: (B, K, D); blank_style: (B, D)."""
    classes = jnp.argmax(spaced, axis=-1)                         # (B, L)
    per_pos = jnp.take_along_axis(
        styles, classes[..., None].repeat(styles.shape[-1], -1), axis=1)
    is_blank = (classes == 0)[..., None]
    return jnp.where(is_blank, blank_style[:, None, :], per_pos)
