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
