"""Auxiliary subsystems: augmentation, style library/retrieval, HTR trainer,
web-app backend selftest pieces."""

import numpy as np
import pytest

import jax

from affganwriting_tpu.data.augment import (
    elastic,
    gaussian_blur,
    grid_warp,
    marcal_augment,
    rotate,
    shear,
)
from affganwriting_tpu.gen.line_inference import (
    StyleLibrary,
    interpolate,
    random_styles,
    style_math,
    writer_retrieval,
)


def test_augment_ops_preserve_shape():
    rng = np.random.default_rng(0)
    img = rng.random((32, 64)).astype(np.float32)
    for out in (gaussian_blur(img, 1.0), shear(img, 0.2), rotate(img, 3.0),
                grid_warp(img, rng), elastic(img, rng, 300, 8)):
        assert out.shape == img.shape
        assert np.isfinite(out).all()
    aug = marcal_augment(img, rng)
    assert aug.shape == img.shape
    assert 0.0 <= aug.min() and aug.max() <= 1.0
    # determinism under a fixed seed
    a = marcal_augment(img, np.random.default_rng(5))
    b = marcal_augment(img, np.random.default_rng(5))
    np.testing.assert_array_equal(a, b)


def test_style_library_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    styles = rng.normal(size=(6, 16)).astype(np.float32)
    lib = StyleLibrary(styles, ["a", "a", "b", "b", "c", "c"], list(range(6)))
    p = str(tmp_path / "styles.pkl")
    lib.save(p)
    lib2 = StyleLibrary.load(p)
    np.testing.assert_array_equal(lib.styles, lib2.styles)
    assert lib2.by_author["b"] == [2, 3]
    avg = lib2.author_average("a")
    np.testing.assert_allclose(avg, styles[:2].mean(0), rtol=1e-6)

    sweep = interpolate(styles[0], styles[1], steps=5)
    assert sweep.shape == (5, 16)
    np.testing.assert_allclose(sweep[0], styles[0], rtol=1e-6)
    np.testing.assert_allclose(sweep[-1], styles[1], rtol=1e-6)
    assert style_math(styles[0], styles[1], styles[2]).shape == (16,)
    assert random_styles(lib, 4).shape == (4, 16)


def test_writer_retrieval_separable():
    rng = np.random.default_rng(0)
    # two well-separated author clusters -> perfect top-1
    a = rng.normal(size=(5, 8)) + 10
    b = rng.normal(size=(5, 8)) - 10
    lib = StyleLibrary(np.concatenate([a, b]),
                       ["a"] * 5 + ["b"] * 5, list(range(10)))
    out = writer_retrieval(lib, top_k=(1, 5))
    assert out["top1"] == 1.0


@pytest.mark.slow
def test_htr_trainer_one_epoch():
    from affganwriting_tpu.core.config import VOCAB, default_config
    from affganwriting_tpu.data.words import synthetic_word_image
    from affganwriting_tpu.train.htr_trainer import HTRTrainer

    cfg = default_config().replace(
        compute_dtype="float32", img_height=32, img_width=104)
    trainer = HTRTrainer(cfg)
    words = ["cat", "dog"]
    img = np.stack([synthetic_word_image(w, 1, 32, 104) for w in words]
                   )[..., None].astype(np.float32)
    labels = np.asarray(
        [VOCAB.pad_label(w, cfg.output_max_len) for w in words], np.int32)
    state = trainer.init_state(img, labels, jax.random.key(0))
    batches = [{"image": img, "labels": labels}] * 2
    state, metrics = trainer.train_epoch(state, iter(batches), epoch=0)
    assert np.isfinite(metrics["loss"])
    assert metrics["teacher_rate"] == 0.5


def test_memwatch_restart(monkeypatch):
    """The RSS watchdog saves and re-execs past the threshold, no-ops
    below it or when disabled (utils/memwatch.py — mitigation for the
    runtime's per-transfer host-mirror leak)."""
    import os

    from affganwriting_tpu.utils import memwatch

    assert memwatch.rss_gb() > 0.01   # this test process uses real memory

    calls = {"save": 0, "exec": 0}
    monkeypatch.setattr(
        memwatch.os, "execv",
        lambda *a: calls.__setitem__("exec", calls["exec"] + 1))
    save = lambda: calls.__setitem__("save", calls["save"] + 1)  # noqa: E731

    memwatch.maybe_restart(0.0, save)          # disabled
    memwatch.maybe_restart(10_000.0, save)     # far below threshold
    assert calls == {"save": 0, "exec": 0}

    monkeypatch.delenv("AFFG_RESTARTS", raising=False)
    memwatch.maybe_restart(0.001, save, label="test")   # way above
    assert calls == {"save": 1, "exec": 1}
    assert os.environ["AFFG_RESTARTS"] == "1"
