"""int8 (w8a8) serving path: BN fold, quant error bounds, tail equivalence.

The quant trunk (ops/quant.py) is an opt-in replacement for R's VGG19
forward in the generation+recognition sweep; these gates pin (a) the BN
fold algebra, (b) the quantization error at trunk output, (c) that
``Recognizer.read_features`` is exactly the bf16 pipeline's tail.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from affganwriting_tpu.models.recognizer.seq2seq import Recognizer
from affganwriting_tpu.ops.quant import (
    folded_vgg_apply,
    prepare_vgg_quant,
    quantize_weight,
    vgg_quant_apply,
)

B = 2


@pytest.fixture(scope="module")
def rec_setup():
    rec = Recognizer(dtype=jnp.float32)
    rng = np.random.default_rng(0)
    # width 104, not the serving 216: the trunk is fully convolutional and
    # every gate here is scale-free (corr / rel-L2 / tail equivalence);
    # int8+bf16 conv EMULATION on this 1-core CPU is execution-bound, so
    # width is the knob that keeps the fast suite fast
    img = jnp.asarray(np.tanh(rng.normal(size=(B, 64, 104, 1))), jnp.float32)
    labels = jnp.asarray([[1] + [10] * 11] * B, jnp.int32)
    v = jax.jit(rec.init)(jax.random.key(0), img, labels)
    # give BN stats non-trivial values so the fold is actually exercised
    bs = jax.tree.map(lambda x: x, v["batch_stats"])
    v = {"params": v["params"], "batch_stats": jax.tree.map(
        lambda x: x + 0.05 * np.random.default_rng(1).normal(size=x.shape)
        .astype(np.float32) ** 2, bs)}
    return rec, v, img, labels


def test_folded_trunk_matches_bn_inference(rec_setup):
    rec, v, img, labels = rec_setup
    from affganwriting_tpu.models.recognizer.encoder import VGGTrunk

    trunk = VGGTrunk(dtype=jnp.float32)
    tv = {"params": v["params"]["enc"]["vgg"],
          "batch_stats": v["batch_stats"]["enc"]["vgg"]}
    img3 = jnp.concatenate([img] * 3, axis=-1)
    want = np.asarray(jax.jit(
        lambda tv, im: trunk.apply(tv, im, train=False))(tv, img3))

    from affganwriting_tpu.ops.quant import _vgg_layers

    folded = _vgg_layers(v)
    got, amaxes = jax.jit(
        lambda f, im: folded_vgg_apply(f, im, dtype=jnp.float32))(
        folded, img)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)
    assert len(amaxes) == 16   # VGG19: 16 convs


def test_weight_quant_roundtrip_error():
    w = np.random.default_rng(2).normal(size=(3, 3, 32, 64)).astype(
        np.float32)
    wq, sw = quantize_weight(jnp.asarray(w))
    deq = np.asarray(wq, np.float32) * np.asarray(sw)
    err = np.abs(deq - w).max(axis=(0, 1, 2)) / np.abs(w).max(axis=(0, 1, 2))
    assert err.max() < 1.0 / 127  # per-channel symmetric bound


def test_quant_trunk_feature_error(rec_setup):
    rec, v, img, labels = rec_setup
    from affganwriting_tpu.ops.quant import _vgg_layers

    folded = _vgg_layers(v)
    ref, _ = jax.jit(
        lambda f, im: folded_vgg_apply(f, im, dtype=jnp.float32))(
        folded, img)
    q = prepare_vgg_quant(v, img)
    got = jax.jit(
        lambda q_, im: vgg_quant_apply(q_, im, dtype=jnp.float32))(
        q, img)
    ref, got = np.asarray(ref).ravel(), np.asarray(got).ravel()
    corr = np.corrcoef(ref, got)[0, 1]
    assert corr > 0.98, corr
    # relative L2 error at the trunk output
    rel = np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-9)
    assert rel < 0.2, rel


def test_read_features_is_the_bf16_tail(rec_setup):
    """Feeding the bf16 trunk's own features through read_features must
    reproduce __call__ exactly (same params, same decode)."""
    rec, v, img, labels = rec_setup
    from affganwriting_tpu.models.recognizer.encoder import VGGTrunk

    trunk = VGGTrunk(dtype=jnp.float32)
    tv = {"params": v["params"]["enc"]["vgg"],
          "batch_stats": v["batch_stats"]["enc"]["vgg"]}
    img3 = jnp.concatenate([img] * 3, axis=-1)
    feat = jax.jit(
        lambda tv_, im: trunk.apply(tv_, im, train=False))(tv, img3)

    logits_full, _ = jax.jit(
        lambda v_, im, la: rec.apply(v_, im, la, train=False))(
        v, img, labels)
    logits_tail, _ = jax.jit(
        lambda v_, f, la: rec.apply(v_, f, la,
                                    method=rec.read_features))(
        v, feat, labels)
    np.testing.assert_allclose(
        np.asarray(logits_tail), np.asarray(logits_full),
        rtol=1e-5, atol=1e-5)


def test_quant_decoder_matches_bf16_decoder():
    """Decoder(quant=True) binds the same params and its output stays
    highly correlated with the bf16 path (IN renormalizes the rounding
    error; tanh saturates it)."""
    from affganwriting_tpu.models.decoder import Decoder

    rng = np.random.default_rng(5)
    dim = 64
    content = jnp.asarray(rng.normal(size=(B, 8, 12, dim)), jnp.float32)
    adain = jnp.asarray(rng.normal(size=(B, 8 * dim)), jnp.float32)
    pyramid = [None, None, None,
               jnp.asarray(rng.normal(size=(B, 4, 6, dim)), jnp.float32),
               jnp.asarray(rng.normal(size=(B, 8, 12, dim)), jnp.float32)]
    base = Decoder(dim=dim, dtype=jnp.float32)
    quant = Decoder(dim=dim, dtype=jnp.float32, quant=True)
    v = jax.jit(base.init)(jax.random.key(0), content, adain, pyramid)
    y0 = np.asarray(jax.jit(base.apply)(v, content, adain, pyramid))
    y1 = np.asarray(jax.jit(quant.apply)(v, content, adain, pyramid))
    assert y0.shape == y1.shape
    corr = np.corrcoef(y0.ravel(), y1.ravel())[0, 1]
    assert corr > 0.99, corr


def test_static_quant_decoder_calibrates_and_matches():
    """calib mode records per-site amaxes into the "quant" collection;
    static mode then reproduces the bf16 decoder as closely as the
    dynamic path does (same inputs in-calibration-range by construction).
    """
    from affganwriting_tpu.models.decoder import Decoder

    rng = np.random.default_rng(7)
    dim = 64
    content = jnp.asarray(rng.normal(size=(B, 8, 12, dim)), jnp.float32)
    adain = jnp.asarray(rng.normal(size=(B, 8 * dim)), jnp.float32)
    pyramid = [None, None, None,
               jnp.asarray(rng.normal(size=(B, 4, 6, dim)), jnp.float32),
               jnp.asarray(rng.normal(size=(B, 8, 12, dim)), jnp.float32)]
    base = Decoder(dim=dim, dtype=jnp.float32)
    v = jax.jit(base.init)(jax.random.key(0), content, adain, pyramid)
    y0 = np.asarray(jax.jit(base.apply)(v, content, adain, pyramid))

    calib = Decoder(dim=dim, dtype=jnp.float32, quant=True,
                    quant_mode="calib")
    y_c, mut = calib.apply(v, content, adain, pyramid, mutable=["quant"])
    # calib forward is the bf16 path (f32 here) — identical output
    np.testing.assert_allclose(np.asarray(y_c), y0, rtol=1e-5, atol=1e-5)
    amaxes = jax.tree.leaves(mut["quant"])
    assert len(amaxes) > 0 and all(float(a) > 0 for a in amaxes)

    static = Decoder(dim=dim, dtype=jnp.float32, quant=True,
                     quant_mode="static")
    y1 = np.asarray(jax.jit(static.apply)(
        {**v, **mut}, content, adain, pyramid))
    corr = np.corrcoef(y0.ravel(), y1.ravel())[0, 1]
    assert corr > 0.99, corr


def test_quant_pipeline_builder_runs(rec_setup):
    """make_generate_and_read_quant_fn compiles and decodes (tiny check --
    the TPU A/B lives in cli/bench_kernels.py / bench.py)."""
    rec, v, img, labels = rec_setup
    q = prepare_vgg_quant(v, img)
    feat = jax.jit(
        lambda q_, im: vgg_quant_apply(q_, im, dtype=jnp.float32))(
        q, img)
    logits, _ = jax.jit(
        lambda v_, f, la: rec.apply(v_, f, la,
                                    method=rec.read_features))(
        v, feat, labels)
    pred = np.asarray(jnp.argmax(logits, axis=-1))
    assert pred.shape == (B, 11)
