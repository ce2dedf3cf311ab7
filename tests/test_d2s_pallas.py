"""Fused d2s+IN+ReLU kernel vs the XLA composition: values and grads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from affganwriting_tpu.ops.d2s_pallas import (
    fused_d2s_in_relu,
    reference_d2s_in_relu,
)

B, H, W, C4 = 2, 8, 12, 64


@pytest.fixture(scope="module")
def x():
    return jnp.asarray(
        np.random.default_rng(0).normal(size=(B, H, W, C4)), jnp.float32)


def test_forward_matches(x):
    got = fused_d2s_in_relu(x)
    want = reference_d2s_in_relu(x)
    assert got.shape == (B, 2 * H, 2 * W, C4 // 4)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_grad_matches(x):
    def loss_a(x):
        return jnp.sum(jnp.sin(fused_d2s_in_relu(x)))

    def loss_b(x):
        return jnp.sum(jnp.sin(reference_d2s_in_relu(x)))

    ga = jax.grad(loss_a)(x)
    gb = jax.grad(loss_b)(x)
    np.testing.assert_allclose(
        np.asarray(ga), np.asarray(gb), rtol=2e-3, atol=2e-3)
