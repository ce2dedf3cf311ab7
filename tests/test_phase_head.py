"""Phase-space head + phase instance norm vs their spatial equivalents."""

import jax
import jax.numpy as jnp
import numpy as np

from affganwriting_tpu.models.decoder import (
    Decoder,
    ExactHead,
    PhaseHead,
    instance_norm_phase,
)
from affganwriting_tpu.ops.norms import instance_norm

B, H, W, C = 2, 8, 12, 16


def _d2s(x4):
    b, h, w, c4 = x4.shape
    c = c4 // 4
    y = x4.reshape(b, h, w, 2, 2, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, c)


def test_instance_norm_phase_matches_spatial():
    x4 = jnp.asarray(
        np.random.default_rng(0).normal(size=(B, H, W, 4 * C)), jnp.float32)
    got = _d2s(instance_norm_phase(x4))
    want = instance_norm(_d2s(x4))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_phase_head_matches_exact_interior():
    rng = np.random.default_rng(1)
    x4 = jnp.asarray(rng.normal(size=(B, H, W, 4 * C)), jnp.float32)
    phase = PhaseHead(1, jnp.float32)
    exact = ExactHead(1, "reflect", jnp.float32)
    v = phase.init(jax.random.key(0), x4)       # same param structure
    y_phase = np.asarray(phase.apply(v, x4))
    y_exact = np.asarray(exact.apply(v, _d2s(x4)))
    assert y_phase.shape == y_exact.shape == (B, 2 * H, 2 * W, 1)
    # interior (3px border excluded for the 7x7 reflect window)
    np.testing.assert_allclose(
        y_phase[:, 4:-4, 4:-4], y_exact[:, 4:-4, 4:-4],
        rtol=2e-4, atol=2e-4)


def test_pallas_head_matches_jnp_reassociation():
    """ops/phase_head_pallas.py (interpret mode) vs the shipped PhaseHead."""
    from affganwriting_tpu.models.decoder import fold_head_kernel, pad2d
    from affganwriting_tpu.ops.phase_head_pallas import phase_head_fold

    rng = np.random.default_rng(3)
    x4 = jnp.asarray(rng.normal(size=(B, H, W, 4 * C)) * 0.5, jnp.float32)
    head = PhaseHead(1, jnp.float32)
    v = head.init(jax.random.key(0), x4)
    want = np.asarray(head.apply(v, x4))[..., 0]
    kc = fold_head_kernel(v["params"]["kernel"])
    got = np.asarray(phase_head_fold(
        pad2d(x4, 2, "reflect"), kc,
        jnp.tile(v["params"]["bias"], (4,)), interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5)

    # the flag routes through the same kernel
    head_p = PhaseHead(1, jnp.float32, use_pallas=True)
    got2 = np.asarray(head_p.apply(v, x4))
    assert got2.shape == (B, 2 * H, 2 * W, 1)


def test_decoder_modes_share_params_and_agree_interior():
    rng = np.random.default_rng(2)
    content = jnp.asarray(rng.normal(size=(1, 8, 27, 512)), jnp.float32)
    adain = jnp.asarray(rng.normal(size=(1, 4096)), jnp.float32)
    pyramid = [None, None, None,
               jnp.asarray(rng.normal(size=(1, 4, 14, 512)), jnp.float32),
               jnp.asarray(rng.normal(size=(1, 8, 27, 512)), jnp.float32)]
    fast = Decoder(subpixel_upsample=True, dtype=jnp.float32)
    exact = Decoder(subpixel_upsample=False, dtype=jnp.float32)
    v = jax.jit(fast.init)(jax.random.key(0), content, adain, pyramid)
    y_fast = np.asarray(jax.jit(fast.apply)(v, content, adain, pyramid))
    y_exact = np.asarray(jax.jit(exact.apply)(
        v, content, adain, pyramid))
    assert y_fast.shape == y_exact.shape == (1, 64, 216, 1)
    # per-op interiors are exact (tests above), but instance-norm stats
    # pool over border pixels so the modes diverge gradually through the
    # stack — they must remain strongly correlated (Decoder docstring)
    a, b = y_fast.ravel(), y_exact.ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.85, corr
