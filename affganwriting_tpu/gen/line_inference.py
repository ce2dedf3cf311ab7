"""Line-level style library + generation actions.

Rebuilds the tooling surface of line_generation/get_styles.py (style
extraction over a split, pickled as {styles, authors, ids}) and
generate.py's interactive actions (interpolation sweeps, style vector math,
author averages, random-style batches) as library functions + a CLI.  The
reference loops one instance at a time; here extraction and generation are
batched jit calls.
"""

from __future__ import annotations

import pickle
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np


class StyleLibrary:
    """{styles (N, D), authors (N,), ids (N,)} with by-author lookup —
    pickle-compatible with the reference's style files
    (get_styles.py:41-45, app.py:85-95)."""

    def __init__(self, styles: np.ndarray, authors: list, ids: list):
        self.styles = np.asarray(styles)
        self.authors = list(authors)
        self.ids = list(ids)
        self.by_author: dict = {}
        for i, a in enumerate(self.authors):
            self.by_author.setdefault(a, []).append(i)

    def save(self, path: str):
        with open(path, "wb") as f:
            pickle.dump({"styles": self.styles, "authors": self.authors,
                         "ids": self.ids}, f)

    @classmethod
    def load(cls, path: str) -> "StyleLibrary":
        with open(path, "rb") as f:
            raw = pickle.load(f)
        return cls(raw["styles"], raw["authors"], raw["ids"])

    def author_average(self, author) -> np.ndarray:
        """The 'A' REPL action (generate.py)."""
        idx = self.by_author[author]
        return self.styles[idx].mean(axis=0)

    def get(self, author, index: int = 0) -> np.ndarray:
        return self.styles[self.by_author[author][index]]


def extract_styles(trainer, state, batches: Iterable[dict]) -> StyleLibrary:
    """Run the style extractor over a dataset split (get_styles.py:19-140)."""
    styles, authors, ids = [], [], []
    n = 0
    extract = jax.jit(
        lambda v, i, ab: trainer.model.apply(
            v, i, ab, method=trainer.model.extract_style),
        static_argnums=2)
    for batch in batches:
        variables = trainer._variables(state)
        s, _ = extract(variables, jnp.asarray(batch["image"]),
                       int(batch.get("a_batch_size", 1)))
        s = np.asarray(s)
        styles.append(s)
        authors.extend(batch["authors"])
        ids.extend(batch.get("ids", list(range(n, n + len(s)))))
        n += len(s)
    return StyleLibrary(np.concatenate(styles), authors, ids)


def interpolate(style_a: np.ndarray, style_b: np.ndarray,
                steps: int = 8) -> np.ndarray:
    """Linear interpolation sweep (generate.py 'r'/'v' actions)."""
    ts = np.linspace(0.0, 1.0, steps)[:, None]
    return (1 - ts) * style_a[None] + ts * style_b[None]


def style_math(base: np.ndarray, plus: np.ndarray, minus: np.ndarray,
               weight: float = 1.0) -> np.ndarray:
    """base + w*(plus - minus) — the 'm' vector-math action."""
    return base + weight * (plus - minus)


def random_styles(library: StyleLibrary, n: int, extra: float = 0.5,
                  seed: int = 0) -> np.ndarray:
    """Random interpolations/extrapolations of library styles — the 'R'
    batch-generation action."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        i, j = rng.integers(len(library.styles), size=2)
        u = rng.uniform(-extra, 1.0 + extra)
        out.append(library.styles[i]
                   + u * (library.styles[j] - library.styles[i]))
    return np.stack(out)


def gaussian_styles(n: int, dim: int, seed: int = 0,
                    sigma: float = 1.0) -> np.ndarray:
    """The 'v' REPL action's style source (generate.py:308: "styles are
    randomly sampled from gaussian distribution (for VAE)") — N(0, sigma)
    vectors instead of dataset-extracted ones."""
    return np.random.default_rng(seed).normal(
        0.0, sigma, size=(n, dim)).astype(np.float32)


def _resample_time(onehot: np.ndarray, factor: float,
                   max_len: int) -> np.ndarray:
    """Linearly resample a spaced one-hot (B, T, K) along time by
    ``factor`` (the reference's F.interpolate(..., mode='linear'),
    generate.py:834), then pad/crop back to the generator's static
    ``max_len`` so every stretch frame reuses ONE compiled shape."""
    b, t, k = onehot.shape
    new_t = max(1, int(round(t * factor)))
    # sample positions in the source signal for each output position
    src = np.linspace(0.0, t - 1.0, new_t)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, t - 1)
    w = (src - lo).astype(np.float32)
    res = (onehot[:, lo] * (1.0 - w)[None, :, None]
           + onehot[:, hi] * w[None, :, None])
    out = np.zeros((b, max_len, k), np.float32)
    n = min(max_len, new_t)
    out[:, :n] = res[:, :n]
    out[:, n:, 0] = 1.0   # trailing positions are blanks
    return out


def stretch_factors(step: float = 0.01) -> list[float]:
    """The 's' sweep schedule: 1 -> 1.1 -> 0.9 -> 1 (interpolate_horz,
    generate.py:830-852; its two 'strechV' loops re-generate the unchanged
    label — a hold, reproduced as repeated 1.1/0.9 frames)."""
    up = list(np.arange(1.0, 1.1 + step / 2, step))
    down = list(np.arange(1.1, 0.9 - step / 2, -step))
    back = list(np.arange(0.9, 1.0 + step / 2, step))
    return [round(f, 4) for f in up + down + back]


def stretch_sweep(trainer, state, batch: dict, step: float = 0.02,
                  key: Optional[jax.Array] = None) -> np.ndarray:
    """The 's' (strech) REPL action (generate.py:278-306): extract the
    batch's style, DTW-align its spaced label, then render a horizontal
    stretching sweep by 1D-resampling the spaced one-hot before the
    generator.  Returns (frames, B, H, W, 1)."""
    key = key if key is not None else jax.random.key(0)
    image = jnp.asarray(batch["image"])
    variables = trainer._variables(state)
    style, _ = trainer.model.apply(
        variables, image, method=trainer.model.extract_style)
    spaced = trainer.spaced_label(state, batch)          # (B, T) ids
    onehot = np.asarray(jax.nn.one_hot(spaced, trainer.n_class), np.float32)

    max_len = trainer.max_gen_length
    b = onehot.shape[0]
    label = jnp.zeros((b, 1), jnp.int32)        # unused when spaced given
    lengths = jnp.ones((b,), jnp.int32)
    apply = jax.jit(
        lambda v, sp, st, r: trainer.model.apply(
            v, label, lengths, st, sp, rngs=r)[0])
    frames = []
    # one noise key for the whole sweep: frames differ only by stretch,
    # which is what the figure is meant to show
    rngs = {"noise": key}
    for f in stretch_factors(step):
        sp = jnp.asarray(_resample_time(onehot, f, max_len))
        frames.append(np.asarray(apply(variables, sp, style, rngs)))
    return np.stack(frames)


def generate_lines(trainer, state, texts: list[str], styles: np.ndarray,
                   charset, key: Optional[jax.Array] = None) -> np.ndarray:
    """Batched text+style -> line images (the generate.py / app.py path)."""
    key = key if key is not None else jax.random.key(0)
    label_len = max(len(charset.encode(t)) for t in texts)
    labels = np.zeros((len(texts), label_len), np.int32)
    lengths = np.zeros((len(texts),), np.int32)
    for i, t in enumerate(texts):
        ids = charset.encode(t)
        labels[i, : len(ids)] = ids
        lengths[i] = len(ids)
    variables = trainer._variables(state)
    k1, k2, k3 = jax.random.split(key, 3)
    apply = jax.jit(
        lambda v, la, le, st, r: trainer.model.apply(
            v, la, le, st, rngs=r))
    img, _, _ = apply(
        variables, jnp.asarray(labels), jnp.asarray(lengths),
        jnp.asarray(styles, jnp.float32),
        {"noise": k1, "spacing": k2, "dropout": k3})
    return np.asarray(img)


# --- writer-identification retrieval (eval_writer_id.py:15-91) -------------

def writer_retrieval(library: StyleLibrary, metric: str = "l2",
                     top_k: tuple[int, ...] = (1, 5, 20)) -> dict:
    """Leave-one-out writer retrieval from style vectors: for each style,
    rank all others by distance; success@k = same author in the top k."""
    s = library.styles
    n = len(s)
    if metric == "l1":
        d = np.sum(np.abs(s[:, None] - s[None, :]), axis=-1)
    else:
        d = np.sum((s[:, None] - s[None, :]) ** 2, axis=-1)
    np.fill_diagonal(d, np.inf)
    order = np.argsort(d, axis=1)
    authors = np.asarray(library.authors)
    hits = {k: 0 for k in top_k}
    for i in range(n):
        ranked = authors[order[i]]
        for k in top_k:
            if (ranked[:k] == authors[i]).any():
                hits[k] += 1
    return {f"top{k}": hits[k] / n for k in top_k}


# --- remaining generate.py REPL actions as library functions ----------------

def permute_false(sent: str, rng: np.random.Generator) -> str:
    """Word-shuffle that is guaranteed different from the original — the
    'false text' used for MTurk legibility pairs (generate.py:32-48:
    permuteF keeps first/last word in place when the sentence is long)."""
    s = sent.split(" ")
    if len(s) > 4:
        m = s[1:-1]
        while m == s[1:-1]:
            rng.shuffle(m)
        s = s[:1] + m + s[-1:]
    elif len(s) > 2:
        m = list(s)
        while m == s:
            rng.shuffle(m)
        s = m
    else:
        s = s[::-1]
    return " ".join(s)


def save_line_png(img: np.ndarray, path: str) -> None:
    """(H, W, 1) in [-1, 1], ink positive -> white-background PNG
    (generate.py's (1 - img) * 127.5 convention)."""
    from PIL import Image

    arr = np.clip((1.0 - img[..., 0]) * 127.5, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def build_mturk_set(trainer, state, library: StyleLibrary, charset,
                    test_batches: Iterable[dict], out_dir: str, n: int,
                    interpolate_styles: bool = True, seed: int = 0) -> str:
    """The 't' REPL action (generate.py:330-470): write ``n`` MTurk triples
    — a real test line, a generated line with its true text, and a
    generated line with permuted 'false' text — plus text.csv describing
    the HIT rows.  Returns the csv path."""
    import csv
    import os

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)

    # pool of (image, text) from the test split; datasets without a
    # "texts" key (synthetic LineDataset) decode their labels instead
    pool: list[tuple[np.ndarray, str]] = []
    for batch in test_batches:
        texts = batch.get("texts") or [
            charset.decode(row[:le])
            for row, le in zip(np.asarray(batch["label"]),
                               np.asarray(batch["label_lengths"]))]
        for i, text in enumerate(texts):
            if text.strip():
                pool.append((batch["image"][i], text))
        if len(pool) >= n:
            break
    if not pool:
        raise ValueError("no test instances with text")

    csv_path = os.path.join(out_dir, "text.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["index", "text", "false_text"])
        for i in range(n):
            img, text = pool[int(rng.integers(len(pool)))]
            false_text = permute_false(text, rng)
            # style: one library style, or a random interpolation of two
            a = library.styles[int(rng.integers(len(library.styles)))]
            if interpolate_styles:
                b = library.styles[int(rng.integers(len(library.styles)))]
                u = float(rng.random())
                style = a * u + b * (1 - u)
            else:
                style = a
            gen = generate_lines(
                trainer, state, [text, false_text],
                np.stack([style, style]), charset,
                key=jax.random.key(seed + i))
            save_line_png(np.asarray(img), os.path.join(
                out_dir, f"real_{i}.png"))
            save_line_png(gen[0], os.path.join(out_dir, f"gen_{i}.png"))
            save_line_png(gen[1], os.path.join(out_dir, f"genfalse_{i}.png"))
            w.writerow([i, text, false_text])
    return csv_path


def load_line_image(path: str, img_height: int = 64) -> np.ndarray:
    """Image file -> (H, W, 1) in the model's ink-positive [-1, 1] space
    (the 'f' action's 1 - img/128 load, generate.py:718-741)."""
    from PIL import Image

    with Image.open(path) as im:
        arr = np.asarray(im.convert("L"), np.float32)
    if arr.shape[0] != img_height:
        scale = img_height / arr.shape[0]
        new_w = max(1, int(round(arr.shape[1] * scale)))
        with Image.open(path) as im:
            arr = np.asarray(
                im.convert("L").resize((new_w, img_height)), np.float32)
    return (1.0 - arr / 128.0)[..., None]


def style_transfer_images(trainer, state, path_a: str, path_b: str,
                          text: str, charset, steps: int = 8,
                          img_height: int = 64,
                          key: Optional[jax.Array] = None) -> np.ndarray:
    """The 'f' REPL action (generate.py:712-793): extract the style of two
    reference images, render ``text`` at ``steps`` interpolation points
    from style A to style B.  Returns (steps, H, W, 1)."""
    img_a = load_line_image(path_a, img_height)
    img_b = load_line_image(path_b, img_height)
    min_w = min(img_a.shape[1], img_b.shape[1])
    pair = np.stack([img_a[:, :min_w], img_b[:, :min_w]])[..., :1]

    variables = trainer._variables(state)
    styles, _ = trainer.model.apply(
        variables, jnp.asarray(pair, jnp.float32), 1,
        method=trainer.model.extract_style)
    styles = np.asarray(styles)
    sweep = interpolate(styles[0], styles[1], steps)
    return generate_lines(
        trainer, state, [text] * steps, sweep, charset, key=key)


def umap_image_sheet(library: StyleLibrary, images: np.ndarray,
                     out_path: str, sheet: int = 2048,
                     thumb_h: int = 32) -> str:
    """The 'u' REPL action (generate.py umap-images): place line thumbnails
    at their style vectors' 2D projection (UMAP when available, else PCA
    via eval.style_viz.project_2d)."""
    from PIL import Image

    from affganwriting_tpu.eval.style_viz import project_2d

    pts = project_2d(library.styles)
    pts = pts - pts.min(0)
    denom = np.maximum(pts.max(0), 1e-6)
    pts = pts / denom  # [0, 1]^2

    canvas = np.full((sheet, sheet), 255, np.uint8)
    for i, img in enumerate(images):
        arr = np.clip((1.0 - img[..., 0]) * 127.5, 0, 255).astype(np.uint8)
        h, w = arr.shape
        tw = max(1, int(w * thumb_h / h))
        thumb = np.asarray(Image.fromarray(arr).resize((tw, thumb_h)))
        y = int(pts[i, 1] * (sheet - thumb_h))
        x = int(pts[i, 0] * (sheet - tw)) if tw < sheet else 0
        canvas[y: y + thumb_h, x: x + min(tw, sheet)] = np.minimum(
            canvas[y: y + thumb_h, x: x + min(tw, sheet)],
            thumb[:, : min(tw, sheet)])
    Image.fromarray(canvas).save(out_path)
    return out_path
