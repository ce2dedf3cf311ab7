"""Line-GAN trainer: curriculum rotation + every lesson step runs once."""

import jax
import numpy as np
import pytest

from affganwriting_tpu.data.lines import LineCharset, LineDataset, TextData, load_sets
from affganwriting_tpu.train.curriculum import Curriculum
from affganwriting_tpu.train.line_trainer import LineGanTrainer, StyleBank


def test_charset_and_sets():
    cs = LineCharset()
    assert cs.n_class == 80
    ids = cs.encode("Hello, world!")
    assert cs.decode(ids) == "Hello, world!"
    assert cs.ctc_collapse([0, 5, 5, 0, 7]) == cs.idx_to_char[5] + cs.idx_to_char[7]
    sets = load_sets()
    assert len(sets["train"]) == 747  # SURVEY.md L0


def test_curriculum_rotation():
    c = Curriculum()
    seen = [tuple(c.get_lesson(i)) for i in range(7)]
    assert seen[0] == ("count",)
    assert seen[1] == ("no-step", "gen")
    assert seen[3] == ("disc",)
    assert c.get_lesson(7) == c.get_lesson(0)
    # int tokens duplicate
    c2 = Curriculum({0: [[2, "gen"], ["disc"]]})
    assert [c2.get_lesson(i) for i in range(3)] == [
        ["gen"], ["gen"], ["disc"]]


def test_style_bank_interpolation():
    bank = StyleBank(size=4, extra=0.5, seed=0)
    assert bank.sample(2) is None
    bank.add(np.ones((2, 8), np.float32))
    bank.add(np.zeros((3, 8), np.float32))
    assert len(bank.bank) == 4
    s = bank.sample(5)
    assert s.shape == (5, 8)


def test_text_data():
    cs = LineCharset()
    td = TextData(cs, max_len=20, seed=0)
    b = td.batch(3, 24)
    assert b["label"].shape == (3, 24)
    assert all(le > 0 for le in b["label_lengths"])


@pytest.mark.slow
def test_one_iteration_of_each_lesson():
    cs = LineCharset()
    ds = LineDataset(cs, a_batch_size=2, width=256, label_len=24, seed=0)
    trainer = LineGanTrainer(
        n_class=cs.n_class, max_gen_length=64, seed=0)
    batches = ds.batches(batch_authors=1, epoch=0)
    first = next(batches)
    state = trainer.init_state(first, jax.random.key(0))

    # run the full 7-lesson rotation once
    def batch_stream():
        yield first
        yield from ds.batches(batch_authors=1, epoch=1)

    stream = batch_stream()
    all_metrics = {}
    for it in range(7):
        state, metrics = trainer.train_iteration(state, it, next(stream))
        for k, v in metrics.items():
            assert np.isfinite(v), (it, k, v)
        all_metrics.update(metrics)
    # every lesson type produced its losses; auto-gen adds the
    # adversarial-on-recon term (hw_with_style_trainer.py:792, 818-831)
    for key in ("count", "auto", "auto_perceptual", "auto_gen_adv",
                "gen_adv", "gen_ctc", "disc"):
        assert key in all_metrics, key


@pytest.mark.slow
def test_lessons_with_char_style_multi():
    """char_style_dim > 0 selects the multi-style extractor
    (char_style.py:210-310); the packed (g, spacing, per-class) style
    flows through every lesson — spacer on the g part, the generator on
    g + space_style per-position char styles."""
    cs = LineCharset()
    ds = LineDataset(cs, a_batch_size=2, width=256, label_len=24, seed=0)
    trainer = LineGanTrainer(
        n_class=cs.n_class, max_gen_length=64, seed=0, char_style_dim=8)
    assert trainer.config_dict["char_style_dim"] == 8  # rides checkpoints
    batches = ds.batches(batch_authors=1, epoch=0)
    first = next(batches)
    state = trainer.init_state(first, jax.random.key(0))

    # the packed style is g + spacing + K*D wide
    import jax.numpy as jnp
    v = {"params": {**state.main_params, "hwr": state.hwr_params}}
    if state.model_stats:
        v["batch_stats"] = state.model_stats
    style, _ = trainer.model.apply(
        v, jnp.asarray(first["image"]), method=trainer.model.extract_style)
    assert style.shape[-1] == 128 + 8 + cs.n_class * 8

    def batch_stream():
        yield first
        yield from ds.batches(batch_authors=1, epoch=1)

    stream = batch_stream()
    all_metrics = {}
    for it in range(7):
        state, metrics = trainer.train_iteration(state, it, next(stream))
        for k, v2 in metrics.items():
            assert np.isfinite(v2), (it, k, v2)
        all_metrics.update(metrics)
    for key in ("count", "auto", "gen_adv", "gen_ctc", "disc"):
        assert key in all_metrics, key
