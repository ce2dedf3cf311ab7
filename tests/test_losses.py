"""Numerical parity of the loss functions vs an independent torch oracle.

The torch expressions here are re-derived from the loss definitions
(label-smoothing KLDiv per GAN_word/loss_tro.py:8-34, patch BCE per
modules_tro.py:145-168) and serve as fixed-seed oracles for the JAX
implementations.
"""

import numpy as np
import pytest

from affganwriting_tpu.train import losses

torch = pytest.importorskip("torch")


def _label_smoothing_torch(logits, targets, smoothing=0.4, pad=2):
    x = torch.log_softmax(torch.tensor(logits), dim=-1)
    t = torch.tensor(targets)
    n, v = x.shape
    true_dist = torch.full((n, v), smoothing / (v - 2))
    true_dist.scatter_(1, t.unsqueeze(1), 1.0 - smoothing)
    true_dist[:, pad] = 0
    true_dist[t == pad] = 0
    return torch.nn.functional.kl_div(
        x, true_dist, reduction="sum").item()


def test_label_smoothing_matches_torch():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(24, 55)).astype(np.float32)
    targets = rng.integers(0, 55, size=(24,))
    targets[::5] = 2  # some PAD rows
    ours = float(losses.label_smoothing_kl(logits, targets))
    ref = _label_smoothing_torch(logits, targets)
    assert ours == pytest.approx(ref, rel=1e-5)


def test_rec_loss_shape_contract():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(2, 11, 55)).astype(np.float32)
    labels = np.full((2, 12), 2, dtype=np.int32)
    labels[:, 0] = 0
    labels[:, 1] = 10
    labels[:, 2] = 1
    val = float(losses.rec_loss(logits, labels))
    assert np.isfinite(val) and val > 0


def test_bce_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(4, 1024)).astype(np.float32)
    tx = torch.tensor(x)
    bce = torch.nn.BCEWithLogitsLoss()
    assert float(losses.dis_real_loss(x)) == pytest.approx(
        bce(tx, torch.ones_like(tx)).item(), rel=1e-5)
    assert float(losses.dis_fake_loss(x)) == pytest.approx(
        bce(tx, torch.zeros_like(tx)).item(), rel=1e-5)


def test_writer_ce_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(6, 500)).astype(np.float32)
    y = rng.integers(0, 500, size=(6,))
    ref = torch.nn.functional.cross_entropy(
        torch.tensor(x), torch.tensor(y)).item()
    assert float(losses.writer_ce_loss(x, y)) == pytest.approx(ref, rel=1e-5)
