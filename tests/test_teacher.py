"""Teacher phase: self-teacher pseudo-labeling + filtered R-only update."""

import pytest
import jax
import numpy as np

from affganwriting_tpu.core.config import default_config
from affganwriting_tpu.gen.inference import variables_of
from affganwriting_tpu.train.state import init_state
from affganwriting_tpu.train.teacher import (
    SelfTeacher,
    run_teacher_phase,
    texts_to_labels,
)

TINY = default_config().replace(
    compute_dtype="float32", style_encoder="resnet18",
    img_height=32, img_width=104, num_writers=8, batch_size=2,
    style_stack=4,
)


def _batches(n=2, b=2):
    rng = np.random.default_rng(0)
    from affganwriting_tpu.core.config import VOCAB

    lab = lambda w: VOCAB.pad_label(w, TINY.output_max_len)  # noqa: E731
    for _ in range(n):
        yield {
            "style_imgs": rng.normal(
                size=(b, TINY.img_height, TINY.img_width, TINY.style_stack)
            ).astype(np.float32),
            "label_xt": np.asarray([lab("deep"), lab("scan")], np.int32),
        }


def test_texts_to_labels_filters_charset():
    out = texts_to_labels(["ab.c,1x", ""], TINY)
    from affganwriting_tpu.core.config import VOCAB

    assert VOCAB.decode(out[0]) == "abcx"
    assert VOCAB.decode(out[1]) == "a"


@pytest.mark.slow
def test_teacher_phase_runs_and_updates_only_rec():
    state = init_state(TINY, jax.random.key(0))
    teacher = SelfTeacher(TINY, variables_of(state.rec))
    # force the confidence threshold to accept everything
    before_rec = jax.tree.leaves(state.rec.params)[0].copy()
    before_gen = jax.tree.leaves(state.gen.params)[0].copy()
    new_state, stats = run_teacher_phase(
        state, TINY, teacher, _batches(), jax.random.key(1),
        max_steps=2, conf_threshold=0.0)
    assert stats["used_batches"] >= 1
    after_rec = jax.tree.leaves(new_state.rec.params)[0]
    after_gen = jax.tree.leaves(new_state.gen.params)[0]
    assert not np.allclose(np.asarray(before_rec), np.asarray(after_rec))
    np.testing.assert_array_equal(
        np.asarray(before_gen), np.asarray(after_gen))
    assert np.isfinite(stats["avg_pseudo_loss"])


def test_flax_trocr_teacher_predicts():
    """On-device TrOCR teacher: greedy decode emits charset texts with
    confidences in [0, 1]; wiring works weightless at tiny dims."""
    import dataclasses

    import numpy as np

    from affganwriting_tpu.core.config import VOCAB, default_config
    from affganwriting_tpu.models.recognizer.trocr import TrOCRArch
    from affganwriting_tpu.train.teacher import FlaxTrOCRTeacher

    cfg = default_config().replace(
        compute_dtype="float32", img_height=32, img_width=104, max_chars=6)
    arch = dataclasses.replace(TrOCRArch.tiny(), image_size=64)
    teacher = FlaxTrOCRTeacher(cfg, arch=arch)
    imgs = np.random.default_rng(0).normal(
        size=(2, 32, 104, 1)).astype(np.float32)
    texts, conf = teacher.predict(imgs)
    assert len(texts) == 2 and conf.shape == (2,)
    assert all(0.0 <= c <= 1.0 for c in conf)
    letters = set(VOCAB.letters)
    for t in texts:
        assert all(c in letters for c in t)   # charset-only, no punctuation
