"""Multi-style char encoder + space_style scatter."""

import jax
import jax.numpy as jnp
import numpy as np

from affganwriting_tpu.models.line.char_style_multi import (
    MultiCharStyleEncoder,
    space_style,
)

K, D, B = 6, 8, 2


def test_multi_char_style_shapes():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(B, 64, 64, 1)), jnp.float32)
    recog = jax.nn.log_softmax(
        jnp.asarray(rng.normal(size=(B, 16, K)), jnp.float32), axis=-1)
    enc = MultiCharStyleEncoder(
        n_class=K, style_dim=16, char_style_dim=D, max_chars=4)
    v = jax.jit(enc.init)(jax.random.key(0), img, recog)
    g, spacing, chars = jax.jit(enc.apply)(v, img, recog)
    assert g.shape == (B, 16)
    assert spacing.shape == (B, D)
    assert chars.shape == (B, K, D)
    for x in (g, spacing, chars):
        assert np.isfinite(np.asarray(x)).all()


def test_space_style_scatter():
    spaced = jax.nn.one_hot(
        jnp.asarray([[0, 3, 3, 0, 5]]), K)                 # (1, 5, K)
    styles = jnp.arange(K * D, dtype=jnp.float32).reshape(1, K, D)
    blank = jnp.full((1, D), -1.0)
    out = space_style(spaced, styles, blank)
    assert out.shape == (1, 5, D)
    np.testing.assert_array_equal(np.asarray(out[0, 0]), [-1.0] * D)
    np.testing.assert_array_equal(
        np.asarray(out[0, 1]), np.asarray(styles[0, 3]))
    np.testing.assert_array_equal(
        np.asarray(out[0, 4]), np.asarray(styles[0, 5]))
