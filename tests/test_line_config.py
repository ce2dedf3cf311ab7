import json

import pytest

from affganwriting_tpu.core.line_config import (
    apply_override,
    load_config,
    merge_resume,
)


def test_load_and_override(tmp_path):
    p = tmp_path / "cf_myrun.json"
    p.write_text(json.dumps(
        {"name": "myrun", "model": {"style_dim": 128},
         "trainer": {"iterations": 100}}))
    cfg = load_config(str(p), overrides=[
        "model.style_dim=64", "trainer.lr=0.001", "tag=abc"])
    assert cfg["model"]["style_dim"] == 64
    assert cfg["trainer"]["lr"] == 0.001
    assert cfg["tag"] == "abc"


def test_name_mismatch_raises(tmp_path):
    p = tmp_path / "cf_other.json"
    p.write_text(json.dumps({"name": "different"}))
    with pytest.raises(ValueError):
        load_config(str(p))


def test_merge_resume():
    file_cfg = {"a": 1, "override": False}
    ckpt_cfg = {"a": 2, "b": 3}
    merged = merge_resume(file_cfg, ckpt_cfg)
    assert merged["a"] == 2 and merged["b"] == 3
    merged2 = merge_resume({"a": 1, "override": True}, ckpt_cfg)
    assert merged2["a"] == 1


def test_apply_override_json_values():
    cfg = {}
    apply_override(cfg, 'x.y=[1, 2]')
    assert cfg["x"]["y"] == [1, 2]
