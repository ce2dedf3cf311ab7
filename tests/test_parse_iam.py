"""IAM form-XML data path: parseIAM bbox semantics, author grouping,
and line-trainer lessons running on XML-indexed data (reference
line_generation/utils/parseIAM.py:137-185, datasets/author_hw_dataset.py)."""

import json
import os

import numpy as np
import pytest

from affganwriting_tpu.data.lines import LineCharset
from affganwriting_tpu.data.parse_iam import (
    AuthorLineDataset,
    AuthorLinesIndex,
    crop_line,
    parse_form_xml,
)

_XML = """<?xml version="1.0" encoding="ISO-8859-1"?>
<form id="{form}" writer-id="{writer}">
  <handwritten-part>
    <line id="{form}-00" text="{t0}">
      <word id="{form}-00-00" text="A">
        <cmp x="100" y="200" width="40" height="60"/>
        <cmp x="150" y="210" width="30" height="40"/>
      </word>
      <word id="{form}-00-01" text="line">
        <cmp x="200" y="205" width="120" height="50"/>
      </word>
    </line>
    <line id="{form}-01" text="{t1}">
      <word id="{form}-01-00" text="short">
        <cmp x="110" y="400" width="200" height="20"/>
      </word>
    </line>
  </handwritten-part>
</form>
"""


def _write_fixture(tmp_path, form="a01-000", writer="000",
                   t0="A line", t1="short"):
    xml_dir = tmp_path / "xml"
    xml_dir.mkdir(exist_ok=True)
    (xml_dir / f"{form}.xml").write_text(
        _XML.format(form=form, writer=writer, t0=t0, t1=t1))
    return str(xml_dir)


def _write_sets(tmp_path, forms):
    p = tmp_path / "sets.json"
    p.write_text(json.dumps(
        {"train": forms, "valid": [], "test": []}))
    return str(p)


def test_parse_form_xml_bbox_semantics(tmp_path):
    xml_dir = _write_fixture(tmp_path)
    recs = parse_form_xml(os.path.join(xml_dir, "a01-000.xml"))
    assert len(recs) == 2
    assert recs[0].writer == "000"
    assert recs[0].text == "A line"
    assert recs[0].line_id == "a01-000-00"

    # raw boxes: line0 y [200, 261), x [100, 321); line1 y [400, 421),
    # x [110, 311).  heights 61 and 21 -> meanH = (61+21+2)/2 = 42... the
    # reference counts 1+maxY-minY per line: (1+260-200)+(1+420-400)=82,
    # meanH 41.
    mean_h = ((1 + 260 - 200) + (1 + 420 - 400)) / 2
    y0, y1, x0, x1 = recs[1].bounds
    # line1 is shorter than meanH: vertically centered out to meanH
    assert (y1 - y0) == pytest.approx(mean_h, abs=1)
    assert x0 == round(110 - mean_h / 4)
    assert x1 == round(311 + mean_h / 4)
    # line0 is taller than meanH: vertical bounds unchanged
    assert recs[0].bounds[0] == 200 and recs[0].bounds[1] == 261


def test_index_splits_and_grouping(tmp_path):
    xml_dir = _write_fixture(tmp_path, form="a01-000", writer="007")
    _write_fixture(tmp_path, form="a01-001", writer="007")
    _write_fixture(tmp_path, form="b02-000", writer="013")
    sets = _write_sets(tmp_path, ["a01-000", "a01-001"])  # b02 excluded

    idx = AuthorLinesIndex(xml_dir, sets_path=sets, split="train")
    assert idx.authors == ["007"]
    assert len(idx.by_author["007"]) == 4
    assert len(idx) == 4


def test_crop_line_geometry():
    from affganwriting_tpu.data.parse_iam import LineRecord

    form = np.ones((500, 600), np.float32)
    form[200:260, 100:300] = 0.0   # ink block
    rec = LineRecord((190, 270, 90, 310), "x", "id", "w", "f")
    img = crop_line(form, rec, img_height=32)
    assert img.shape[0] == 32
    # aspect preserved: 80 tall x 220 wide -> 32 x 88
    assert img.shape[1] == 88
    assert img.max() > 0.9    # ink inverted to +1
    assert img.min() < -0.9   # background -1


def test_author_line_dataset_batches_with_synthetic_fallback(tmp_path):
    """No form images on disk -> synthetic fallback, batch contract holds."""
    xml_dir = _write_fixture(tmp_path, form="a01-000", writer="007")
    _write_fixture(tmp_path, form="a01-001", writer="013")
    sets = _write_sets(tmp_path, ["a01-000", "a01-001"])
    idx = AuthorLinesIndex(xml_dir, sets_path=sets)
    cs = LineCharset()
    ds = AuthorLineDataset(idx, str(tmp_path / "none"), cs,
                           a_batch_size=2, img_height=64, label_len=48)
    batch = next(ds.batches(batch_authors=2, epoch=0))
    assert batch["image"].shape[0] == 4           # 2 authors x a_batch 2
    assert batch["image"].shape[1] == 64
    assert batch["image"].shape[3] == 1
    assert batch["image"].shape[2] % 128 == 0     # bucketed width
    assert batch["label"].shape == (4, 48)
    assert (batch["label_lengths"] > 0).all()
    assert batch["a_batch_size"] == 2
    assert len(set(batch["authors"])) == 2


def test_author_line_dataset_real_images(tmp_path):
    """With form PNGs present, crops come from the page pixels."""
    from PIL import Image

    xml_dir = _write_fixture(tmp_path, form="a01-000", writer="007")
    sets = _write_sets(tmp_path, ["a01-000"])
    img_dir = tmp_path / "forms"
    img_dir.mkdir()
    page = np.full((600, 700), 255, np.uint8)
    page[200:261, 100:321] = 0    # line0 ink
    page[395:425, 110:311] = 0    # line1 ink
    Image.fromarray(page).save(img_dir / "a01-000.png")

    idx = AuthorLinesIndex(xml_dir, sets_path=sets)
    cs = LineCharset()
    ds = AuthorLineDataset(idx, str(img_dir), cs, a_batch_size=2,
                           img_height=64, label_len=48, seed=1)
    batch = next(ds.batches(batch_authors=1, epoch=0))
    # ink from the page must appear (inverted to positive values)
    assert float(batch["image"].max()) > 0.9
    assert float(batch["image"].min()) <= -1.0 + 1e-6


@pytest.mark.slow
def test_line_trainer_lesson_on_xml_data(tmp_path):
    """An auto-lesson train step runs on XML-indexed author batches."""
    from affganwriting_tpu.train.line_trainer import LineGanTrainer
    import jax

    xml_dir = _write_fixture(tmp_path, form="a01-000", writer="007",
                             t0="ab", t1="cd")
    _write_fixture(tmp_path, form="a01-001", writer="013", t0="ef", t1="gh")
    sets = _write_sets(tmp_path, ["a01-000", "a01-001"])
    idx = AuthorLinesIndex(xml_dir, sets_path=sets)
    cs = LineCharset()
    ds = AuthorLineDataset(idx, str(tmp_path / "none"), cs, a_batch_size=2,
                           img_height=64, label_len=16, max_width=256)
    batch = next(ds.batches(batch_authors=1, epoch=0))
    trainer = LineGanTrainer(n_class=cs.n_class, max_gen_length=64, seed=0)
    from affganwriting_tpu.train.curriculum import Curriculum

    trainer.curriculum = Curriculum({0: [["auto"]]})   # pin the lesson
    state = trainer.init_state(batch, jax.random.key(0))
    state, metrics = trainer.train_iteration(state, 0, batch)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))


def test_fg_mask_and_augmented_batches(tmp_path):
    """Otsu fg masks ride in the batch; augmentation perturbs pixels but
    keeps labels (author_hw_dataset.py:200-229, 291-299)."""
    import numpy as np

    from affganwriting_tpu.data.line_augment import (
        foreground_mask,
        otsu_threshold,
    )

    # otsu separates a bimodal image
    img = np.full((32, 64), 0.9, np.float32)
    img[10:20, 10:50] = 0.1
    th = otsu_threshold(img)
    assert 0.1 < th < 0.9
    mask = foreground_mask(img)
    assert mask[15, 30] == 1.0        # ink
    assert mask[2, 2] == 0.0          # background
    assert mask.sum() > (10 * 40)     # dilation grew the ink region

    xml_dir = _write_fixture(tmp_path, form="a01-000", writer="007")
    sets = _write_sets(tmp_path, ["a01-000"])
    idx = AuthorLinesIndex(xml_dir, sets_path=sets)
    cs = LineCharset()
    ds = AuthorLineDataset(idx, str(tmp_path / "none"), cs, a_batch_size=2,
                           img_height=64, label_len=48, with_fg_mask=True,
                           augment=True)
    batch = next(ds.batches(batch_authors=1, epoch=0))
    assert batch["fg_mask"].shape == batch["image"].shape
    assert set(np.unique(batch["fg_mask"])) <= {0.0, 1.0}
    # augmentation is seeded: same epoch -> same pixels
    batch2 = next(ds.batches(batch_authors=1, epoch=0))
    np.testing.assert_array_equal(batch["image"], batch2["image"])
