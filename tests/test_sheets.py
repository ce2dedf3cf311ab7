import os

import numpy as np

from affganwriting_tpu.eval.sheets import (
    _glyph,
    _text_strip,
    write_line_sheet,
    write_sheet,
)


def test_glyphs_are_readable_bitmaps():
    """Real 5x7 glyphs (not barcodes): distinct letters render distinct
    bitmaps, every printable ASCII char has one, text strips carry ink."""
    seen = set()
    for c in "abcdefghij0123AB":
        g = _glyph(c)
        assert g.shape == (7, 5) and g.any()
        seen.add(g.tobytes())
    assert len(seen) == 16   # all distinct
    strip = _text_strip("deep", 64, 216)
    assert strip.shape == (64, 216)
    assert (strip == 255).sum() > 50   # glyph pixels, not a bar


def test_write_line_sheet(tmp_path):
    rng = np.random.default_rng(0)
    b, h = 2, 32
    path = write_line_sheet(
        str(tmp_path), "iter_100",
        rng.normal(size=(b, h, 120, 1)),
        rng.normal(size=(b, h, 96, 1)),
        rng.normal(size=(b, h, 128, 1)),
        texts=["a line", "two"],
        disc_scores={"real": -0.5, "recon": 0.1, "gen": 0.9},
    )
    assert os.path.exists(path) or os.path.exists(path + ".npy")


def test_write_sheet(tmp_path):
    b, h, w = 2, 64, 216
    rng = np.random.default_rng(0)
    path = write_sheet(
        str(tmp_path), "epoch_1",
        rng.normal(size=(b, h, w, 1)),
        ["deep", "scan"],
        rng.normal(size=(b, h, w, 1)),
        ["deep", "scan"],
        rng.normal(size=(b, h, w, 4)),
        rng.normal(size=(b, h, w, 1)),
        ["dep", "scans"],
        ["dep", "scans"],
    )
    assert os.path.exists(path) or os.path.exists(path + ".npy")
