"""Subpixel upsample-conv: interior must match the exact path bit-for-bit
(same parameters), borders within the documented 2px tolerance."""

import jax
import jax.numpy as jnp
import numpy as np

from affganwriting_tpu.models.decoder import UpsampleConv


def test_subpixel_matches_exact_interior():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 27, 32)), jnp.float32)
    fast = UpsampleConv(16, subpixel=True, dtype=jnp.float32)
    exact = UpsampleConv(16, subpixel=False, dtype=jnp.float32)
    v = fast.init(jax.random.key(0), x)  # same param structure both paths
    y_fast = np.asarray(fast.apply(v, x))
    y_exact = np.asarray(exact.apply(v, x))
    assert y_fast.shape == y_exact.shape == (2, 16, 54, 16)
    # interior (2px border excluded) must agree to float tolerance
    np.testing.assert_allclose(
        y_fast[:, 2:-2, 2:-2], y_exact[:, 2:-2, 2:-2], rtol=2e-4, atol=2e-4)
    # borders: same scale, approximated padding
    assert np.abs(y_fast - y_exact).mean() < 0.1 * np.abs(y_exact).mean() + 0.1
