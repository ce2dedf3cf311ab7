"""Emuru backend plumbing (reference line_generation/app.py:152-215 +
emuru_infer.py): local-snapshot discovery, preprocessing, clean failure
without weights.  The model itself needs a downloaded snapshot, which this
zero-egress environment never has — generation is exercised manually when
weights exist; everything around it is tested here."""

import os

import numpy as np
import pytest

from affganwriting_tpu.serve import emuru


@pytest.fixture(autouse=True)
def _isolated_env(tmp_path, monkeypatch):
    monkeypatch.delenv("EMURU_DIR", raising=False)
    monkeypatch.setenv("HUGGINGFACE_HUB_CACHE", str(tmp_path / "nocache"))
    emuru._MODEL = None
    yield
    emuru._MODEL = None


def _make_snapshot(root, name="abc123", complete=True):
    snap = root / "models--blowing-up-groundhogs--emuru" / "snapshots" / name
    os.makedirs(snap)
    (snap / "config.json").write_text("{}")
    if complete:
        (snap / "model.safetensors").write_text("stub")
    return snap


def test_no_snapshot_raises_cleanly():
    with pytest.raises(FileNotFoundError):
        emuru.find_local_snapshot()
    with pytest.raises(FileNotFoundError):
        emuru.load_emuru()
    assert not emuru.available()


def test_emuru_dir_direct_snapshot(tmp_path, monkeypatch):
    snap = tmp_path / "snap"
    os.makedirs(snap)
    (snap / "config.json").write_text("{}")
    (snap / "model.safetensors").write_text("stub")
    monkeypatch.setenv("EMURU_DIR", str(snap))
    assert emuru.find_local_snapshot() == str(snap)
    assert emuru.available()


def test_emuru_dir_hub_layout_and_incomplete(tmp_path, monkeypatch):
    # incomplete snapshot (missing safetensors) is not a candidate
    _make_snapshot(tmp_path, "partial", complete=False)
    monkeypatch.setenv("EMURU_DIR", str(tmp_path))
    with pytest.raises(FileNotFoundError, match="no complete"):
        emuru.find_local_snapshot()
    snap = _make_snapshot(tmp_path, "full", complete=True)
    assert emuru.find_local_snapshot() == str(snap)


def test_hub_cache_discovery(tmp_path, monkeypatch):
    cache = tmp_path / "hub"
    snap = _make_snapshot(cache)
    monkeypatch.setenv("HUGGINGFACE_HUB_CACHE", str(cache))
    assert emuru.find_local_snapshot() == str(snap)


def test_normalize_text():
    s = emuru.normalize_text("  “smart”  ’quotes’\n and   space ")
    assert s == '"smart" \'quotes\' and space'


def test_prep_style_image_shapes():
    from PIL import Image

    pil = Image.fromarray(
        (np.random.default_rng(0).random((32, 200)) * 255).astype(np.uint8))
    t = emuru.prep_style_image(pil)
    # (1, C, 64, W): RGB, height 64, aspect preserved (200*64/32 = 400)
    assert tuple(t.shape) == (1, 3, 64, 400)
    v = t.numpy()
    assert -1.0 <= v.min() and v.max() <= 1.0
