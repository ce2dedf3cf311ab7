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


def test_no_step_gen_grads_deferred_into_auto_step():
    """The no-step gen lesson's gradients are NOT discarded: the reference
    stashes them in saved_grads (hw_with_style_trainer.py:310-346) and
    applies them — per-slot rescaled by balance_var_x — at the next auto
    lesson's optimizer step (:378-386).  Dropping them (the pre-r5
    behavior) starves G of every bank-style adversarial/CTC gradient,
    because the active curriculum only ever runs gen as ['no-step','gen']."""
    cs = LineCharset()
    ds = LineDataset(cs, a_batch_size=2, width=256, label_len=24, seed=0)
    trainer = LineGanTrainer(n_class=cs.n_class, max_gen_length=64, seed=0)
    first = next(ds.batches(batch_authors=1, epoch=0))
    state = trainer.init_state(first, jax.random.key(0))

    # iteration 1 of the default rotation is ['no-step', 'gen']
    assert trainer.curriculum.get_lesson(1) == ["no-step", "gen"]
    state1, m = trainer.train_iteration(state, 1, first)
    assert "gen_adv" in m and "gen_ctc" in m
    assert trainer._saved_grads is not None
    # no-step: the lesson itself applies no main-param update
    assert all(np.array_equal(a, b) for a, b in zip(
        jax.tree.leaves(state.main_params),
        jax.tree.leaves(state1.main_params)))

    # iteration 2 ['auto', 'auto-gen'] consumes the stash
    rng_before = trainer.rng
    state_with, _ = trainer.train_iteration(state1, 2, first)
    assert trainer._saved_grads is None

    # replay the identical auto step with the stash cleared: the saved
    # slots really contribute to the applied update
    trainer.rng = rng_before
    trainer._saved_grads = None
    state_wo, _ = trainer.train_iteration(state1, 2, first)
    assert any(not np.allclose(a, b) for a, b in zip(
        jax.tree.leaves(state_with.main_params),
        jax.tree.leaves(state_wo.main_params)))


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
