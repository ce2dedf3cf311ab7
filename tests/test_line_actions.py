"""Remaining generate.py REPL actions as library functions: MTurk set
builder ('t'), image-pair style transfer ('f'), UMAP image sheet ('u')
(reference line_generation/generate.py:257-793)."""

import numpy as np
import pytest

from affganwriting_tpu.gen.line_inference import (
    StyleLibrary,
    load_line_image,
    permute_false,
    save_line_png,
    umap_image_sheet,
)


def test_permute_false_always_differs():
    rng = np.random.default_rng(0)
    for sent in ("one two three four five six",
                 "alpha beta gamma",
                 "just two"):
        out = permute_false(sent, rng)
        assert out != sent
        assert sorted(out.split(" ")) == sorted(sent.split(" "))
    # long sentences keep first/last word pinned (generate.py:34-38)
    out = permute_false("a b c d e f", rng)
    assert out.split(" ")[0] == "a" and out.split(" ")[-1] == "f"


def test_line_png_roundtrip(tmp_path):
    img = np.full((32, 80, 1), -1.0, np.float32)
    img[10:20, 20:60, 0] = 1.0   # ink
    p = str(tmp_path / "line.png")
    save_line_png(img, p)
    back = load_line_image(p, img_height=32)
    assert back.shape == (32, 80, 1)
    # ink is positive, background ~ -1
    assert back[15, 40, 0] > 0.5
    assert back[2, 2, 0] < -0.5
    # height-rescale path
    back2 = load_line_image(p, img_height=64)
    assert back2.shape == (64, 160, 1)


def test_umap_image_sheet(tmp_path):
    rng = np.random.default_rng(0)
    styles = rng.normal(size=(6, 16)).astype(np.float32)
    lib = StyleLibrary(styles, [f"a{i}" for i in range(6)], list(range(6)))
    images = np.full((6, 16, 40, 1), -1.0, np.float32)
    images[:, 4:10, 5:30, 0] = 1.0
    out = umap_image_sheet(lib, images, str(tmp_path / "sheet.png"),
                           sheet=256, thumb_h=16)
    from PIL import Image

    with Image.open(out) as im:
        arr = np.asarray(im)
    assert arr.shape == (256, 256)
    assert (arr < 255).any()   # thumbnails landed


@pytest.mark.slow
def test_mturk_set_and_style_transfer(tmp_path):
    """'t' and 'f' actions against a tiny live line model."""
    import jax

    from affganwriting_tpu.data.lines import LineCharset, LineDataset
    from affganwriting_tpu.gen.line_inference import (
        build_mturk_set,
        extract_styles,
        style_transfer_images,
    )
    from affganwriting_tpu.train.line_trainer import LineGanTrainer

    cs = LineCharset()
    ds = LineDataset(cs, a_batch_size=2, width=256, label_len=24, seed=0)
    trainer = LineGanTrainer(n_class=cs.n_class, max_gen_length=48, seed=0)
    batches = list(__import__("itertools").islice(
        ds.batches(batch_authors=1, epoch=0), 2))
    state = trainer.init_state(batches[0], jax.random.key(0))
    lib = extract_styles(trainer, state, iter(batches))

    csv_path = build_mturk_set(
        trainer, state, lib, cs, iter(batches), str(tmp_path / "mturk"),
        n=2, seed=0)
    import csv as csv_mod
    import os

    with open(csv_path) as f:
        rows = list(csv_mod.DictReader(f))
    assert len(rows) == 2
    for i in range(2):
        for stem in ("real", "gen", "genfalse"):
            assert os.path.exists(tmp_path / "mturk" / f"{stem}_{i}.png")

    # 'f': style transfer between two saved line images
    from affganwriting_tpu.gen.line_inference import save_line_png

    save_line_png(batches[0]["image"][0], str(tmp_path / "a.png"))
    save_line_png(batches[0]["image"][1], str(tmp_path / "b.png"))
    imgs = style_transfer_images(
        trainer, state, str(tmp_path / "a.png"), str(tmp_path / "b.png"),
        "hello", cs, steps=3)
    assert imgs.shape[0] == 3
    assert np.isfinite(imgs).all()


@pytest.mark.slow
def test_line_repl_headless_script(tmp_path):
    """The REPL drives every scripted action headlessly (generate.py UX)."""
    from affganwriting_tpu.cli import line_repl

    line_repl.main([
        "--out", str(tmp_path),
        "--script", "a;r;2;hi;s;0;v;2;hey;A;;q",
    ])
    import os

    assert os.path.exists(tmp_path / "interp0.png")
    assert os.path.exists(tmp_path / "average.png")
    # 's' stretch sweep frames (generate.py:278-306 naming gen{b}_{i})
    assert os.path.exists(tmp_path / "gen0_0.png")
    # 'v' gaussian-style interpolation frames
    assert os.path.exists(tmp_path / "vae0.png")
    assert os.path.exists(tmp_path / "vae1.png")


def test_stretch_schedule_and_resample():
    """The 's' sweep helpers: schedule covers 1->1.1->0.9->1
    (interpolate_horz, generate.py:830-852) and time-resampling keeps the
    static generator length with trailing blanks."""
    from affganwriting_tpu.gen.line_inference import (
        _resample_time,
        stretch_factors,
    )

    fs = stretch_factors(0.05)
    assert fs[0] == 1.0 and max(fs) == 1.1 and min(fs) == 0.9
    assert fs[-1] == 1.0

    onehot = np.zeros((1, 10, 4), np.float32)
    onehot[0, :, 0] = 1.0
    onehot[0, 3:6, 0] = 0.0
    onehot[0, 3:6, 2] = 1.0
    out = _resample_time(onehot, 1.5, 20)
    assert out.shape == (1, 20, 4)
    # stretched char run is ~1.5x longer
    assert 3 <= out[0, :, 2].sum() <= 6.5
    # every position is (softly) one-hot; tail is blank
    np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-5)
    assert out[0, 16:, 0].all()
