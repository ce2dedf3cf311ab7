"""FID pipeline tests: activation shapes, Fréchet math, metric sanity."""

import numpy as np
import pytest

from affganwriting_tpu.eval.fid import (
    FIDScorer,
    crop64_preprocess,
    frechet_distance,
    gaussian_stats,
)


def test_crop64_preprocess():
    imgs = (np.random.default_rng(0).random((3, 64, 216)) * 255).astype(
        np.uint8)
    out = crop64_preprocess(imgs)
    assert out.shape == (3, 64, 64, 3)
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_frechet_identity_is_zero():
    rng = np.random.default_rng(0)
    act = rng.normal(size=(256, 16))
    mu, sig = gaussian_stats(act)
    assert frechet_distance(mu, sig, mu, sig) == pytest.approx(0.0, abs=1e-6)


def test_frechet_mean_shift():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(4096, 8))
    b = a + 2.0  # shift every dim by 2 -> FID ~= 8 * 4 = 32
    fa, fb = gaussian_stats(a), gaussian_stats(b)
    assert frechet_distance(*fa, *fb) == pytest.approx(8 * 4.0, rel=0.05)


@pytest.mark.slow
def test_scorer_orders_distributions():
    """Same distribution -> small FID; disjoint -> larger (random-weight
    Inception still separates distributions)."""
    rng = np.random.default_rng(0)
    base = rng.random((48, 64, 216)).astype(np.float32)
    same_a, same_b = base[:24], base[24:]
    different = np.clip(base[:24] * 0.2 + 0.8, 0, 1)  # brightness shift
    scorer = FIDScorer(batch_size=24)
    d_same = scorer.fid(same_a, same_b)
    d_diff = scorer.fid(same_a, different)
    assert d_diff > d_same
