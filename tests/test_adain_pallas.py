"""Fused Pallas AdaIN vs the reference jnp implementation: values + grads.

On CPU the kernel runs in interpreter mode; on TPU the same code compiles
to Mosaic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from affganwriting_tpu.ops.adain_pallas import fused_adain
from affganwriting_tpu.ops.norms import adain

B, H, W, C = 2, 8, 16, 128


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    mean = jnp.asarray(rng.normal(size=(B, C)), jnp.float32)
    std = jnp.asarray(rng.normal(size=(B, C)) + 1.5, jnp.float32)
    return x, mean, std


def test_forward_matches_reference(inputs):
    x, mean, std = inputs
    got = fused_adain(x, mean, std)
    want = adain(x, mean, std)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_gradients_match_reference(inputs):
    x, mean, std = inputs

    def loss_fused(x, m, s):
        return jnp.sum(jnp.sin(fused_adain(x, m, s)))

    def loss_ref(x, m, s):
        return jnp.sum(jnp.sin(adain(x, m, s)))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, mean, std)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, mean, std)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)
