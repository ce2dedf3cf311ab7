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


def test_generator_exact_mode_shares_param_tree():
    """Generator(cfg, subpixel=False) applies variables initialized by the
    fast generator — the escape hatch the fast-vs-exact quality A/B uses
    (scripts/ab_subpixel_quality.py)."""
    from affganwriting_tpu.core.config import default_config
    from affganwriting_tpu.gen.inference import encode_labels
    from affganwriting_tpu.models.generator import Generator

    cfg = default_config().replace(
        compute_dtype="float32", style_encoder="cnn",
        img_height=32, img_width=104, style_dim=64,
        adain_param_dim=512, text_embed_dim=16, max_chars=6)
    fast = Generator(cfg, subpixel=True)
    exact = Generator(cfg, subpixel=False)
    rng = np.random.default_rng(0)
    style = jnp.asarray(rng.normal(
        size=(1, cfg.img_height, cfg.img_width, cfg.style_stack)),
        jnp.float32)
    labels = jnp.asarray(encode_labels(["word", "pens"], cfg.output_max_len))
    v = jax.jit(fast.init)(jax.random.key(0), style, labels)
    a = np.asarray(jax.jit(fast.apply)(v, style, labels))
    b = np.asarray(jax.jit(exact.apply)(v, style, labels))
    assert a.shape == b.shape == (2, cfg.img_height, cfg.img_width, 1)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    # same weights, same interior computation: strongly correlated outputs
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.5
