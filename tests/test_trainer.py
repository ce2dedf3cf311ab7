"""Trainer-loop smoke: one tiny epoch end-to-end, checkpoint round-trip,
generated-folder CER."""

import os

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy on the 1-core CPU harness

from affganwriting_tpu.core.checkpoint import CheckpointManager
from affganwriting_tpu.core.config import default_config
from affganwriting_tpu.data.iam import (
    default_reference_paths,
    load_corpus,
    parse_groundtruth,
    writer_label_map,
)
from affganwriting_tpu.data.words import WordStyleDataset
from affganwriting_tpu.eval.generated import cer_of_folder, parse_generated_name
from affganwriting_tpu.train.loop import EarlyStopping, WordGanTrainer
from affganwriting_tpu.train.state import init_state

TINY = default_config().replace(
    compute_dtype="float32",
    style_encoder="resnet18",
    img_height=32,
    img_width=104,
    num_writers=500,
    batch_size=2,
    style_stack=8,
)


def _datasets():
    paths = default_reference_paths()
    tr = parse_groundtruth(paths["train_gt"])
    small = dict(list(tr.items())[:4])
    corpus = load_corpus(paths["corpus"])[:200]
    label_map = writer_label_map(tr)
    return (
        WordStyleDataset(small, label_map, TINY, corpus=corpus, seed=0),
        WordStyleDataset(small, label_map, TINY, corpus=corpus, seed=1),
    )


@pytest.mark.slow
def test_trainer_one_epoch(tmp_path):
    train_ds, test_ds = _datasets()
    trainer = WordGanTrainer(
        TINY, train_ds, test_ds, logdir=str(tmp_path / "run"),
        eval_every=1, save_every=1000, save_latest_every_steps=1)
    out = trainer.train_epoch(0)
    assert np.isfinite(out["l_total"]) and out["cer_te"] >= 0
    monitor = trainer.evaluate(0)
    assert np.isfinite(monitor)
    assert os.path.exists(tmp_path / "run" / "metrics.jsonl")
    # latest checkpoint written during the epoch
    assert trainer.ckpt.latest_exists()


def test_checkpoint_roundtrip(tmp_path):
    state = init_state(TINY, jax.random.key(0))
    ck = CheckpointManager(str(tmp_path / "ck"))
    ck.save_latest(state, TINY)
    restored = ck.restore("latest", state)
    a = jax.tree.leaves(state.gen.params)[0]
    b = jax.tree.leaves(restored.gen.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert ck.load_config("latest") == TINY


def test_early_stopping():
    es = EarlyStopping(patience=2)
    es.update(5.0)
    es.update(6.0)
    assert not es.should_stop
    es.update(6.0)
    assert es.should_stop


def test_generated_folder_cer(tmp_path):
    names = ["049-0.three-three.png", "049-1.threw-shrew.png",
             "050-0.abc-abd.png", "junk.txt"]
    for n in names:
        (tmp_path / n).write_bytes(b"")
    assert parse_generated_name("049-0.three-three.png") == ("three", "three")
    out = cer_of_folder(str(tmp_path))
    # edits: 0 + 1 (threw->shrew) + 1 (abc->abd); ref len 5 + 5 + 3 = 13
    assert out["count"] == 3
    assert out["ref_len"] == 13
    assert out["edits"] == 2
    assert out["cer"] == pytest.approx(100 * 2 / 13)
