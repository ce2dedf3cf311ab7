"""One-pass Pallas IN+ReLU kernel: interpret-mode parity vs the jnp path."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

import affganwriting_tpu.ops.in_relu_pallas as m
from affganwriting_tpu.ops.norms import instance_norm


def _interp(x, eps=1e-5, relu=True):
    n, h, w, c = x.shape
    return pl.pallas_call(
        functools.partial(m._kernel, eps=eps, relu=relu),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(n, c // m.LANE),
        in_specs=[pl.BlockSpec((1, h, w, m.LANE), lambda i, j: (i, 0, 0, j))],
        out_specs=pl.BlockSpec((1, h, w, m.LANE), lambda i, j: (i, 0, 0, j)),
        interpret=True,
    )(x)


def test_parity_with_jnp_instance_norm():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 256)) * 3 + 1, jnp.float32)
    got = _interp(x)
    ref = jnp.maximum(instance_norm(x), 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    # no-relu variant
    got2 = _interp(x, relu=False)
    ref2 = instance_norm(x)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2), atol=1e-5)


def test_channel_blocks_are_independent():
    """Stats are per (sample, channel): duplicating a channel block must
    reproduce its outputs exactly."""
    rng = np.random.default_rng(1)
    a = rng.normal(size=(1, 4, 6, 128)).astype(np.float32)
    x = jnp.asarray(np.concatenate([a, a], axis=-1))
    out = np.asarray(_interp(x))
    np.testing.assert_array_equal(out[..., :128], out[..., 128:])
