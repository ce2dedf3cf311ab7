"""Per-writer word dataset: 50-image style stacks + target words.

Rebuild of ``IAM_words`` (GAN_word/load_data.py:58-179) with the same
sampling semantics — per item: shuffle the writer's words, take 51 (pad by
cycling when fewer), hold one out as ``img_xt``; targets are either OOV
corpus words (plus a second independently sampled "swap" word) or the
held-out label and its edit-distance-1 mutation.  Differences from the
reference, by design:

  * images are decoded by a pluggable reader; when no image root is
    configured a deterministic procedural renderer supplies synthetic
    strokes (the reference already tolerates all-zero images for corrupted
    files, load_data.py:145-147);
  * all randomness flows from a seeded ``numpy`` Generator per epoch, so a
    (seed, epoch) pair reproduces the exact batch stream;
  * batches are produced as a dict of contiguous NHWC arrays ready for
    ``jax.device_put`` — style stacks ride the channel axis (B, 64, 216, 50).
"""

from __future__ import annotations

import os
import string
from typing import Callable, Iterator, Optional

import numpy as np

from affganwriting_tpu.core.config import VOCAB, WordGanConfig
from affganwriting_tpu.data.iam import WordEntry


def edits1(word: str, rng: np.random.Generator,
           min_len: int = 2, max_len: int = 10) -> str:
    """One random edit (delete/transpose/replace/insert) of ``word``.

    Mirrors GAN_word/load_data.py:42-55 including the length guards that
    forbid shrinking short words or growing maxed-out ones.
    """
    letters = string.ascii_lowercase
    splits = [(word[:i], word[i:]) for i in range(len(word) + 1)]
    deletes = [L + R[1:] for L, R in splits if R]
    transposes = [L + R[1] + R[0] + R[2:] for L, R in splits if len(R) > 1]
    replaces = [L + c + R[1:] for L, R in splits if R for c in letters]
    inserts = [L + c + R for L, R in splits for c in letters]
    if len(word) <= min_len:
        pool = sorted(set(transposes + replaces + inserts))
    elif len(word) >= max_len:
        pool = sorted(set(deletes + transposes + replaces))
    else:
        pool = sorted(set(deletes + transposes + replaces + inserts))
    return pool[int(rng.integers(len(pool)))]


def preprocess_word_image(img: np.ndarray, height: int = 64,
                          width: int = 216) -> np.ndarray:
    """Grayscale uint8/float image -> (64, 216) float32 in [-1, 1].

    Resize to height 64 preserving aspect (ceil width like the reference's
    ``int(w*rate)+1``), invert, crop-or-zero-pad the width to 216, then
    (x - 0.5) / 0.5 (GAN_word/load_data.py:141-167).

    Dispatches to the native C++ batch kernel (native/preprocess.cpp, built
    via ``python -m affganwriting_tpu.utils.native build``) when present;
    the numpy path below is the reference implementation and fallback.
    """
    from affganwriting_tpu.utils import native

    if native.available() and np.asarray(img).dtype == np.uint8:
        return native.preprocess_words_native(
            np.asarray(img)[None], height, width)[0]
    img = np.asarray(img, dtype=np.float32)
    if img.max() > 1.5:
        img = img / 255.0
    h, w = img.shape
    new_w = int(w * (height / h)) + 1
    img = _resize_bilinear(img, height, new_w)
    img = 1.0 - img
    out = np.zeros((height, width), dtype=np.float32)
    cw = min(new_w, width)
    out[:, :cw] = img[:, :cw]
    return (out - 0.5) / 0.5


def _resize_bilinear(img: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """Minimal bilinear resize (align_corners=False convention)."""
    ih, iw = img.shape
    ys = (np.arange(oh) + 0.5) * ih / oh - 0.5
    xs = (np.arange(ow) + 0.5) * iw / ow - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, ih - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, iw - 1)
    y1 = np.clip(y0 + 1, 0, ih - 1)
    x1 = np.clip(x0 + 1, 0, iw - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    a = img[np.ix_(y0, x0)]
    b = img[np.ix_(y0, x1)]
    c = img[np.ix_(y1, x0)]
    d = img[np.ix_(y1, x1)]
    return (a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx
            + c * wy * (1 - wx) + d * wy * wx)


def _synthetic_cached(word: str, writer_seed: int, height: int,
                      width: int) -> np.ndarray:
    out = _synthetic_cached_impl(word, writer_seed, height, width)
    return out


def _synthetic_cached_impl(word, writer_seed, height, width):
    import functools

    if not hasattr(_synthetic_cached_impl, "_fn"):
        @functools.lru_cache(maxsize=20000)
        def fn(word, writer_seed, height, width):
            img = synthetic_word_image(word, writer_seed, height, width)
            img.setflags(write=False)   # cached: callers must not mutate
            return img

        _synthetic_cached_impl._fn = fn
    return _synthetic_cached_impl._fn(word, writer_seed, height, width)


def synthetic_word_image(word: str, writer_seed: int,
                         height: int = 64, width: int = 216) -> np.ndarray:
    """Deterministic procedural 'handwriting': per-character stroke blobs
    with writer-dependent slant/thickness.  Stands in for IAM images when no
    image root is available (tests, benches); the real reader plugs in via
    ``WordStyleDataset(image_reader=...)``."""
    rng = np.random.default_rng(
        (hash(word) & 0xFFFFFFFF) ^ (writer_seed * 2654435761 & 0xFFFFFFFF))
    img = np.zeros((height, width), np.float32)
    n = max(1, len(word))
    char_w = min(20, width // (n + 1))
    slant = (writer_seed % 7 - 3) * 0.08
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)
    for i, ch in enumerate(word[:10]):
        cx = 8 + i * char_w + char_w / 2
        cy = height / 2 + float(rng.normal(0, 4))
        # a few gaussian strokes per char, shaped by the char code
        for s in range(3):
            ang = (ord(ch) * 0.7 + s * 2.1) % np.pi
            dx, dy = np.cos(ang), np.sin(ang)
            t = (xx - cx) * dx + (yy - cy) * dy + slant * (yy - cy)
            r = -(xx - cx) * dy + (yy - cy) * dx
            img += np.exp(-(t ** 2) / (2 * 36.0) - (r ** 2) / (2 * 4.0))
    img = np.clip(img, 0, 1)
    return (img - 0.5) / 0.5


class WordStyleDataset:
    """Iterable over per-writer samples; yields collated batch dicts.

    One sample (one writer): style stack (64, 216, 50), held-out image
    (64, 216, 1), held-out / OOV target labels, channel-0 label, writer
    class label — the tensors of the reference's ``sort_batch`` collate
    (GAN_word/main_runold.py:74-109) in NHWC layout.
    """

    def __init__(
        self,
        by_writer: dict[str, list[WordEntry]],
        label_map: dict[str, int],
        config: WordGanConfig,
        corpus: Optional[list[str]] = None,
        image_reader: Optional[Callable[[WordEntry], np.ndarray]] = None,
        image_root: Optional[str] = None,
        seed: int = 0,
    ):
        self.config = config
        self.by_writer = {w: list(v) for w, v in by_writer.items()}
        self.label_map = label_map
        self.writers = list(by_writer.keys())
        self.corpus = [w for w in (corpus or [])
                       if 0 < len(w) <= config.max_chars]
        self.seed = seed
        if image_reader is not None:
            self.reader = image_reader
        elif image_root is not None:
            self.reader = _DirectoryReader(image_root)
        else:
            self.reader = None  # synthetic

    def __len__(self):
        return len(self.writers)

    def _read(self, entry: WordEntry, writer_label: int) -> np.ndarray:
        cfg = self.config
        if self.reader is None:
            # deterministic per (word, writer): cache renders — on the
            # 1-core harness an uncached batch-8 step spends ~1.8s just
            # rendering its 408 style images
            return _synthetic_cached(
                entry.word, writer_label, cfg.img_height, cfg.img_width)
        img = self.reader(entry)
        if img is None:
            # corrupted-image fallback (load_data.py:145-147)
            return np.zeros((cfg.img_height, cfg.img_width), np.float32)
        return preprocess_word_image(img, cfg.img_height, cfg.img_width)

    def sample(self, writer: str, rng: np.random.Generator) -> dict:
        cfg = self.config
        extra = cfg.style_stack + 1
        entries = list(self.by_writer[writer])
        rng.shuffle(entries)
        if len(entries) >= extra:
            chosen = entries[:extra]
        else:
            chosen = list(entries)
            while len(chosen) < extra:
                chosen += entries[: extra - len(chosen)]
        label = self.label_map[writer]
        imgs = np.stack([self._read(e, label) for e in chosen], axis=-1)
        hold = int(rng.integers(extra))

        img_xt = imgs[..., hold:hold + 1]
        if cfg.oov and self.corpus:
            w_xt = self.corpus[int(rng.integers(len(self.corpus)))]
            w_swap = self.corpus[int(rng.integers(len(self.corpus)))]
        else:
            w_xt = _clean(chosen[hold].word, cfg.max_chars)
            w_swap = edits1(w_xt, rng, max_len=cfg.max_chars)
        style = np.delete(imgs, hold, axis=-1)
        remaining = [e for i, e in enumerate(chosen) if i != hold]
        label_ch0 = _clean(remaining[0].word, cfg.max_chars)
        return {
            "style_imgs": style.astype(np.float32),
            "img_xt": img_xt.astype(np.float32),
            "writer_id": np.int32(label),
            "label_xt": np.asarray(
                VOCAB.pad_label(w_xt, cfg.output_max_len), np.int32),
            "label_xt_swap": np.asarray(
                VOCAB.pad_label(w_swap, cfg.output_max_len), np.int32),
            "label_ch0": np.asarray(
                VOCAB.pad_label(label_ch0, cfg.output_max_len), np.int32),
        }

    def batches(self, batch_size: Optional[int] = None, epoch: int = 0,
                shuffle: bool = True, drop_last: bool = True,
                ) -> Iterator[dict]:
        bs = batch_size or self.config.batch_size
        rng = np.random.default_rng((self.seed, epoch))
        order = np.arange(len(self.writers))
        if shuffle:
            rng.shuffle(order)
        for start in range(0, len(order) - (bs - 1 if drop_last else 0), bs):
            idxs = order[start:start + bs]
            if drop_last and len(idxs) < bs:
                return
            samples = [self.sample(self.writers[i], rng) for i in idxs]
            yield {
                "style_imgs": np.stack([s["style_imgs"] for s in samples]),
                "img_xt": np.stack([s["img_xt"] for s in samples]),
                "writer_ids": np.stack([s["writer_id"] for s in samples]),
                "label_xt": np.stack([s["label_xt"] for s in samples]),
                "label_xt_swap": np.stack(
                    [s["label_xt_swap"] for s in samples]),
                "label_ch0": np.stack([s["label_ch0"] for s in samples]),
            }


def _clean(word: str, max_chars: int) -> str:
    """Restrict to the a-zA-Z charset and clip length; GT files are already
    filtered to in-charset words (filter27), this guards synthetic input."""
    w = "".join(c for c in word if c in VOCAB.letters)
    return (w or "a")[:max_chars]


class _DirectoryReader:
    """Reads ``<root>/<img_id>.png`` grayscale, None if missing/corrupted."""

    def __init__(self, root: str):
        self.root = root

    def __call__(self, entry: WordEntry):
        path = os.path.join(self.root, entry.img_id + ".png")
        if not os.path.exists(path):
            return None
        try:
            from PIL import Image  # lazy; optional dependency
            with Image.open(path) as im:
                return np.asarray(im.convert("L"))
        except Exception:
            return None
