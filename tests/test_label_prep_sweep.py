"""Label-prep utilities + sweep hooks + AE pretrain step."""

import jax
import numpy as np

from affganwriting_tpu.core.config import default_config
from affganwriting_tpu.data.label_prep import (
    clean_gt_lines,
    merge_gt_files,
    split_gt_by_writers,
)
from affganwriting_tpu.train.sweep import Study


def test_clean_gt_lines():
    lines = ["049,a-b-c the", "049,a-b-d th3e", "050,x-y-z supercalifragil",
             "050,x-y-w ok"]
    out = clean_gt_lines(lines)
    assert out == ["049,a-b-c the", "050,x-y-w ok"]


def test_split_and_merge(tmp_path):
    p = tmp_path / "gt.txt"
    p.write_text("\n".join(
        [f"{w},{w}-img-{i} word" for w in ("049", "050", "051")
         for i in range(3)]))
    train, test = split_gt_by_writers(str(p), train_frac=0.67)
    train_w = {ln.split(",")[0] for ln in train}
    test_w = {ln.split(",")[0] for ln in test}
    assert train_w == {"049", "050"} and test_w == {"051"}

    p2 = tmp_path / "gt2.txt"
    p2.write_text("\n".join(train))
    merged = merge_gt_files([str(p), str(p2)], str(tmp_path / "out.txt"))
    assert merged == 9  # dedup keeps originals only


def test_sweep_study():
    study = Study(default_config(), seed=0)

    def objective(cfg):
        # pretend lower lr_rec is better
        return cfg.lr_rec

    best = study.run(objective, n_trials=5)
    assert best["value"] == min(t["value"] for t in study.trials)
    cfgs = {t["params"]["lr_gen"] for t in study.trials}
    assert len(cfgs) == 5  # distinct samples


def test_ae_pretrain_step():
    from affganwriting_tpu.train.auto_trainer import AutoTrainer

    img = np.random.default_rng(0).normal(
        size=(2, 64, 128, 1)).astype(np.float32)
    tr = AutoTrainer(lr=1e-3)
    state = tr.init_state(img, jax.random.key(0))
    state = tr.train(state, iter([{"image": img}] * 3), iterations=3)
    assert int(state["step"]) == 3
