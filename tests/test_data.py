"""Data pipeline tests: GT parsing, writer maps, sampler semantics.

Validates against the real ground-truth files mounted with the reference
(read-only data assets, not code) and checks the writer-label convention
matches the reference's pairs_idx mapping rule (first-appearance order).
"""

import numpy as np
import pytest

from affganwriting_tpu.core.config import VOCAB, default_config
from affganwriting_tpu.data.iam import (
    default_reference_paths,
    load_corpus,
    parse_groundtruth,
    writer_label_map,
)
from affganwriting_tpu.data.words import (
    WordStyleDataset,
    edits1,
    preprocess_word_image,
)

PATHS = default_reference_paths()


def test_parse_groundtruth_counts():
    tr = parse_groundtruth(PATHS["train_gt"])
    te = parse_groundtruth(PATHS["test_gt"])
    assert sum(len(v) for v in tr.values()) == 44419
    assert sum(len(v) for v in te.values()) == 18436
    assert len(tr) == 339   # train writers (SURVEY.md W2)
    assert len(te) == 161   # test writers


def test_writer_label_map_first_appearance_order():
    tr = parse_groundtruth(PATHS["train_gt"])
    m = writer_label_map(tr)
    # the reference's pairs_idx_wid_iam.py:1 starts (0,'049'), (1,'128'),
    # (2,'116') — first-appearance order of the GT file
    assert m["049"] == 0 and m["128"] == 1 and m["116"] == 2


def test_corpus():
    corpus = load_corpus(PATHS["corpus"])
    assert len(corpus) == 22553
    assert all(c.isalpha() for w in corpus[:100] for c in w)


def test_edits1_properties():
    rng = np.random.default_rng(0)
    for w in ["the", "scanner", "ab"]:
        e = edits1(w, rng)
        assert e != w or len(w) <= 2  # usually differs
        assert e.isalpha()
    # deterministic under a fixed generator state
    a = edits1("word", np.random.default_rng(7))
    b = edits1("word", np.random.default_rng(7))
    assert a == b


def test_preprocess_range_and_shape():
    img = (np.random.default_rng(0).random((91, 300)) * 255).astype(np.uint8)
    out = preprocess_word_image(img)
    assert out.shape == (64, 216)
    assert out.min() >= -1.0 - 1e-6 and out.max() <= 1.0 + 1e-6


@pytest.fixture(scope="module")
def dataset():
    cfg = default_config()
    tr = parse_groundtruth(PATHS["train_gt"])
    corpus = load_corpus(PATHS["corpus"])
    return WordStyleDataset(
        tr, writer_label_map(tr), cfg, corpus=corpus, seed=0)


def test_batch_shapes(dataset):
    batch = next(dataset.batches(batch_size=4, epoch=0))
    assert batch["style_imgs"].shape == (4, 64, 216, 50)
    assert batch["img_xt"].shape == (4, 64, 216, 1)
    assert batch["writer_ids"].shape == (4,)
    for k in ("label_xt", "label_xt_swap", "label_ch0"):
        assert batch[k].shape == (4, 12)
        assert batch[k][:, 0].tolist() == [VOCAB.go] * 4
    assert batch["style_imgs"].min() >= -1.0 and batch["style_imgs"].max() <= 1.0


def test_batch_determinism(dataset):
    b1 = next(dataset.batches(batch_size=2, epoch=3))
    b2 = next(dataset.batches(batch_size=2, epoch=3))
    for k in b1:
        np.testing.assert_array_equal(b1[k], b2[k])
    b3 = next(dataset.batches(batch_size=2, epoch=4))
    assert not np.array_equal(b1["writer_ids"], b3["writer_ids"]) or not (
        np.array_equal(b1["label_xt"], b3["label_xt"]))
