"""TrOCR drop-in recognizer (W13): architecture parity vs HuggingFace,
differentiable preprocess, vocab projection, and grads-reach-G through the
four-player step (reference GAN_word/trocr_recognizer.py:48-247, wired by
main_runtransformer.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from affganwriting_tpu.core.config import VOCAB, default_config
from affganwriting_tpu.models.recognizer.trocr import (
    TrOCRArch,
    TrOCRCore,
    TrOCRRecognizer,
    default_char_token_table,
    import_torch_state_dict,
    preprocess_for_trocr,
)


def test_default_table_injective_and_valid():
    mv, valid = default_char_token_table(TrOCRArch.tiny().vocab_tro)
    assert mv.shape == (VOCAB.size,)
    letters = mv[VOCAB.num_tokens:]
    assert len(set(letters.tolist())) == len(letters)  # injective
    assert valid[VOCAB.num_tokens:].all()
    # END is a live class (it is a target after the GO-shift); GO/PAD
    # stay masked
    assert valid[VOCAB.end]
    assert not valid[VOCAB.go] and not valid[VOCAB.pad]


def test_preprocess_geometry_and_gradient():
    img = jnp.ones((2, 64, 216, 1)) * 0.3
    out = preprocess_for_trocr(img, size=384)
    assert out.shape == (2, 384, 384, 3)
    # aspect-preserving: 64x216 scales by 384/216 -> 114x384, bottom pad
    un = out * 0.5 + 0.5  # un-normalize
    assert float(jnp.abs(un[:, :113, :, :].mean() - 0.65)) < 1e-4
    assert float(jnp.abs(un[:, 120:, :, :]).max()) < 1e-6  # padded region

    # differentiable w.r.t. the image (grads reach G through this)
    g = jax.grad(lambda x: preprocess_for_trocr(x).sum())(img)
    assert float(jnp.abs(g).max()) > 0


def test_recognizer_logits_shape_and_mask():
    arch = dataclasses.replace(TrOCRArch.tiny(), image_size=64)
    rec = TrOCRRecognizer(arch, output_max_len=12)
    img = jnp.zeros((2, 64, 216, 1))
    labels = jnp.asarray(
        [VOCAB.pad_label("word", 12), VOCAB.pad_label("deep", 12)], jnp.int32)
    variables = rec.init(jax.random.key(0), img, labels)
    (logits, aux), _ = rec.apply(
        variables, img, labels, train=True, mutable=["batch_stats"])
    assert aux is None
    assert logits.shape == (2, 11, VOCAB.size)
    # control-token rows are masked (never predicted), finite so the
    # label-smoothed KL stays bounded
    assert float(logits[..., VOCAB.go].max()) <= -25.0
    # letter rows carry live logits
    assert float(jnp.abs(logits[..., VOCAB.num_tokens:]).max()) < 25.0


@pytest.mark.slow
def test_parity_vs_transformers():
    """Weights imported from a random-init HF VisionEncoderDecoderModel
    reproduce its logits (the real import path for trocr-base-handwritten,
    exercised at tiny dims)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from transformers import (
        TrOCRConfig,
        VisionEncoderDecoderConfig,
        VisionEncoderDecoderModel,
        ViTConfig,
    )

    arch = TrOCRArch.tiny()
    enc = ViTConfig(
        hidden_size=arch.enc_hidden, num_hidden_layers=arch.enc_layers,
        num_attention_heads=arch.enc_heads, intermediate_size=arch.enc_mlp,
        image_size=arch.image_size, patch_size=arch.patch_size,
        num_channels=3)
    dec = TrOCRConfig(
        d_model=arch.dec_hidden, decoder_layers=arch.dec_layers,
        decoder_attention_heads=arch.dec_heads, decoder_ffn_dim=arch.dec_ffn,
        vocab_size=arch.vocab_tro,
        max_position_embeddings=arch.max_positions,
        scale_embedding=arch.scale_embedding,
        layernorm_embedding=arch.layernorm_embedding,
        activation_function="gelu", dropout=0.0, attention_dropout=0.0)
    cfg = VisionEncoderDecoderConfig.from_encoder_decoder_configs(enc, dec)
    tm = VisionEncoderDecoderModel(cfg)
    tm.eval()

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, arch.image_size, arch.image_size))
    x = x.astype(np.float32)
    ids = rng.integers(0, arch.vocab_tro, size=(2, 7)).astype(np.int64)
    with torch.no_grad():
        ref = tm(pixel_values=torch.tensor(x),
                 decoder_input_ids=torch.tensor(ids)).logits.numpy()

    params = import_torch_state_dict(tm.state_dict(), arch)
    out = TrOCRCore(arch).apply(
        {"params": params},
        jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-3)


@pytest.mark.slow
def test_train_step_trocr_grads_reach_gen():
    """Full four-player step with rec='trocr' (frozen): the recognition
    loss must move G's params even though R itself never updates."""
    from affganwriting_tpu.train.state import init_state
    from affganwriting_tpu.train.step import make_train_step

    cfg = default_config().replace(
        compute_dtype="float32",
        style_encoder="cnn",
        img_height=32,
        img_width=104,
        num_writers=4,
        batch_size=2,
        recognizer="trocr",
        rec_frozen=True,
        trocr_preset="tiny",
        # isolate the recognition pathway into G
        w_dis=0.0, w_cla=0.0, w_l1=0.0, w_rec=1.0,
    )
    state = init_state(cfg, jax.random.key(0))
    step = jax.jit(make_train_step(cfg))

    rng = np.random.default_rng(0)
    b = 2
    lab = lambda w: VOCAB.pad_label(w, cfg.output_max_len)  # noqa: E731
    batch = {
        "style_imgs": rng.normal(
            size=(b, 32, 104, cfg.style_stack)).astype(np.float32),
        "img_xt": rng.normal(size=(b, 32, 104, 1)).astype(np.float32),
        "writer_ids": np.arange(b, dtype=np.int32),
        "label_xt": np.asarray([lab("deep")] * b, np.int32),
        "label_xt_swap": np.asarray([lab("dep")] * b, np.int32),
        "label_ch0": np.asarray([lab("word")] * b, np.int32),
    }
    new_state, metrics, _ = step(state, batch, jax.random.key(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    # R frozen: its params must be bit-identical
    for a, b_ in zip(jax.tree.leaves(state.rec.params),
                     jax.tree.leaves(new_state.rec.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
    # G moved, and only the rec loss could have moved it
    g0 = jax.tree.leaves(state.gen.params)
    g1 = jax.tree.leaves(new_state.gen.params)
    moved = sum(
        float(np.abs(np.asarray(x) - np.asarray(y)).max())
        for x, y in zip(g0, g1))
    assert moved > 0
