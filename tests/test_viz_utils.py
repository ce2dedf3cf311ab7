"""WER, style 2D projection, loss-curve tooling."""

import json

import numpy as np

from affganwriting_tpu.eval.cer import wer
from affganwriting_tpu.eval.style_viz import project_2d, umap_styles
from affganwriting_tpu.gen.line_inference import StyleLibrary
from affganwriting_tpu.utils.graph import load_series, sparkline


def test_wer():
    assert wer(["the cat sat"], ["the cat sat"]) == 0.0
    assert wer(["the dog sat"], ["the cat sat"]) == 1 / 3
    assert wer(["a b", "c"], ["a b", "d"]) == 1 / 3


def test_project_2d_and_png(tmp_path):
    rng = np.random.default_rng(0)
    styles = np.concatenate(
        [rng.normal(size=(5, 16)) + 4, rng.normal(size=(5, 16)) - 4])
    lib = StyleLibrary(styles, ["a"] * 5 + ["b"] * 5, list(range(10)))
    pts = project_2d(lib.styles)
    assert pts.shape == (10, 2)
    out = umap_styles(lib, str(tmp_path / "viz.png"))
    assert out.endswith(".png")


def test_graph_series(tmp_path):
    p = tmp_path / "metrics.jsonl"
    with open(p, "w") as f:
        for i in range(5):
            f.write(json.dumps(
                {"step": i, "group": "train", "loss": 1.0 / (i + 1)}) + "\n")
    series = load_series(str(p))
    assert len(series["train/loss"]) == 5
    assert len(sparkline([1, 2, 3, 2, 1])) == 5
