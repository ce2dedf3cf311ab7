"""Line-generation model zoo: shapes, spacing semantics, DTW alignment."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from affganwriting_tpu.models.line.autoencoder import Autoencoder
from affganwriting_tpu.models.line.char_style import CharStyleEncoder
from affganwriting_tpu.models.line.container import HWWithStyle, insert_spaces
from affganwriting_tpu.models.line.count_cnn import CountCNN
from affganwriting_tpu.models.line.discriminator import DiscriminatorAP
from affganwriting_tpu.models.line.hwr import CNNOnlyHWR, CRNN
from affganwriting_tpu.models.line.spaced_gen import SpacedGenerator
from affganwriting_tpu.ops.dtw import correct_pred, interleave_blanks

B, H, W, K = 2, 64, 128, 80
RNG = np.random.default_rng(0)
IMG = jnp.asarray(RNG.normal(size=(B, H, W, 1)), jnp.float32)


def test_crnn_and_cnnonly_log_probs():
    for cls in (CRNN, CNNOnlyHWR):
        m = cls(nclass=K, dtype=jnp.float32)
        v = jax.jit(m.init)(jax.random.key(0), IMG)
        out = jax.jit(m.apply)(v, IMG)
        assert out.ndim == 3 and out.shape[0] == B and out.shape[2] == K
        sums = np.asarray(jnp.sum(jnp.exp(out), axis=-1))
        np.testing.assert_allclose(sums, 1.0, rtol=1e-4)


def test_small_crnn():
    """SmallCRNN (cnn_lstm.py:117-192): h=24 inputs, T = W/4 - 2, width
    padded to >=12, spatial dropout active only in train mode."""
    from affganwriting_tpu.models.line.hwr import SmallCRNN

    img = jnp.asarray(RNG.normal(size=(B, 24, 96, 1)), jnp.float32)
    m = SmallCRNN(nclass=K, dtype=jnp.float32)
    v = jax.jit(m.init)(jax.random.key(0), img)
    out = jax.jit(m.apply)(v, img)
    # T = W/4 + 1 (padded (2,1) pool) - 2 (valid final conv)
    assert out.shape == (B, 96 // 4 - 1, K)
    np.testing.assert_allclose(
        np.asarray(jnp.sum(jnp.exp(out), axis=-1)), 1.0, rtol=1e-4)
    # narrow input pads to the 12-column minimum (reference :169-171)
    tiny = jnp.asarray(RNG.normal(size=(B, 24, 8, 1)), jnp.float32)
    out2 = jax.jit(m.apply)(v, tiny)
    assert out2.shape == (B, 2, K)
    # train mode consumes the dropout rng and stays finite
    out3, _ = m.apply(v, img, train=True, mutable=["batch_stats"],
                      rngs={"dropout": jax.random.key(1)})
    assert np.isfinite(np.asarray(out3)).all()


@pytest.mark.slow
def test_spaced_generator_shape_and_determinism():
    L = 24
    gen = SpacedGenerator(n_class=K, style_size=128)
    spaced = jax.nn.one_hot(
        jnp.asarray(RNG.integers(0, K, size=(B, L))), K)
    style = jnp.asarray(RNG.normal(size=(B, 128)), jnp.float32)
    v = gen.init({"params": jax.random.key(0), "noise": jax.random.key(1)},
                 spaced, style)
    img1 = gen.apply(v, spaced, style, rngs={"noise": jax.random.key(7)})
    img2 = gen.apply(v, spaced, style, rngs={"noise": jax.random.key(7)})
    img3 = gen.apply(v, spaced, style, rngs={"noise": jax.random.key(8)})
    assert img1.shape == (B, 64, 4 * L, 1)
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))
    assert not np.array_equal(np.asarray(img1), np.asarray(img3))
    assert float(jnp.max(jnp.abs(img1))) <= 1.0


def test_count_cnn():
    m = CountCNN(K, 128)
    onehot = jax.nn.one_hot(jnp.asarray(RNG.integers(0, K, (B, 10))), K)
    style = jnp.asarray(RNG.normal(size=(B, 128)), jnp.float32)
    v = m.init(jax.random.key(0), onehot, style)
    out = m.apply(v, onehot, style)
    assert out.shape == (B, 10, 2)


@pytest.mark.slow
def test_char_style_encoder():
    hwr = CNNOnlyHWR(nclass=K, dtype=jnp.float32)
    hv = hwr.init(jax.random.key(0), IMG)
    recog = hwr.apply(hv, IMG)
    enc = CharStyleEncoder(n_class=K, style_dim=128)
    v = enc.init(jax.random.key(1), IMG, recog)
    style = enc.apply(v, IMG, recog)
    assert style.shape == (B, 128)
    assert np.isfinite(np.asarray(style)).all()


def test_discriminator_ap_heads():
    d = DiscriminatorAP(dim=64, use_low=True, use_med=True)
    v = jax.jit(d.init)(jax.random.key(0), IMG)
    heads = jax.jit(d.apply)(v, IMG)
    assert len(heads) == 2
    for h in heads:
        assert h.shape[0] == B and h.ndim == 2


def test_autoencoder():
    ae = Autoencoder()
    v = jax.jit(ae.init)(jax.random.key(0), IMG)
    recon = jax.jit(ae.apply)(v, IMG)
    assert recon.shape == IMG.shape
    feats = jax.jit(lambda v_, im: ae.apply(v_, im,
                                            method=ae.encode))(v, IMG)
    assert len(feats) == 5
    assert feats[-1].shape[-1] == 32  # 2tight bottleneck


def test_insert_spaces_semantics():
    label = jnp.asarray([[5, 9, 3]], jnp.int32)
    lengths = jnp.asarray([3], jnp.int32)
    # deterministic counts (std ~ 0): 2 blanks then 1 duplicate per char
    counts = jnp.tile(jnp.asarray([[2.0, 1.0]]), (1, 3, 1)).reshape(1, 3, 2)
    spaced, padded = insert_spaces(
        label, lengths, counts, jax.random.key(0), K, max_len=16)
    ids = np.asarray(jnp.argmax(spaced, axis=-1))[0]
    assert ids.tolist() == [0, 0, 5, 0, 0, 9, 0, 0, 3, 0, 0, 0, 0, 0, 0, 0]
    assert 0.0 <= float(padded[0]) <= 1.0


def test_hw_with_style_end_to_end():
    # small charset + short gen length keep the 1-core CPU compile cheap;
    # the full-K container runs in the slow trainer tests
    ke, mgl = 20, 16
    m = HWWithStyle(n_class=ke, max_gen_length=mgl, dtype=jnp.float32)
    img_in = IMG[:, :, :64]
    label = jnp.asarray(RNG.integers(1, ke, (B, 6)), jnp.int32)
    lengths = jnp.full((B,), 6, jnp.int32)
    rngs = {"params": jax.random.key(0), "noise": jax.random.key(1),
            "spacing": jax.random.key(2)}
    v = jax.jit(lambda r, im, la, le: m.init(
        r, im, la, le, method=m.init_all))(rngs, img_in, label, lengths)
    style, pred = jax.jit(lambda v_, im: m.apply(
        v_, im, method=m.extract_style))(v, img_in)
    assert style.shape == (B, 128)
    img, spaced, counts = jax.jit(lambda v_, la, le, st, r: m.apply(
        v_, la, le, st, rngs=r))(
        v, label, lengths, style,
        {"noise": jax.random.key(3), "spacing": jax.random.key(4)})
    assert img.shape == (B, 64, 4 * mgl, 1)
    assert spaced.shape == (B, mgl, ke)
    assert counts.shape == (B, 6, 2)


def test_correct_pred_alignment():
    t_pred, batch = 12, 1
    label = np.asarray([[3], [7], [5]])          # (T_label, B)
    # build a prediction that clearly walks 3 -> 7 -> 5 with blanks between
    pred = np.full((t_pred, batch, K), 0.01, np.float32)
    seq = [0, 0, 3, 3, 0, 7, 7, 0, 0, 5, 0, 0]
    for t, c in enumerate(seq):
        pred[t, 0, c] = 0.95
    spaced = correct_pred(pred, label)
    assert spaced.shape == (t_pred, batch)
    # the non-blank chars must appear in label order
    chars = [c for c in spaced[:, 0].tolist() if c != 0]
    dedup = [c for i, c in enumerate(chars) if i == 0 or chars[i - 1] != c]
    assert dedup == [3, 7, 5]
    assert interleave_blanks(label).shape == (7, 1)


@pytest.mark.slow
def test_ae_variants_and_ehwr_head():
    """Size variants select the reference's bottlenecks; E_HWR emits CTC
    log-probs from the code (autoencoder.py:8-52, 596-629)."""
    import jax
    import numpy as np
    from affganwriting_tpu.models.line.autoencoder import (
        VARIANTS, Autoencoder)

    assert VARIANTS["2tight"][1] == 32
    assert VARIANTS["2tighter"][1] == 16
    assert VARIANTS["2"][1] == 256

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 64, 128, 1)), jnp.float32)
    ae = Autoencoder(variant="2tighter", hwr_classes=80)
    variables = ae.init(jax.random.key(0), x)
    recon, logp = ae.apply(variables, x, return_ctc=True)
    assert recon.shape == x.shape
    assert logp.shape == (2, 128 // 16, 80)   # bottleneck strip width
    np.testing.assert_allclose(
        np.exp(np.asarray(logp)).sum(-1), 1.0, atol=1e-4)
    # grads reach the encoder through the CTC head
    def loss(p):
        _, lp = ae.apply({"params": p}, x, return_ctc=True)
        return -lp.mean()
    g = jax.grad(loss)(variables["params"])
    enc_leaf = jax.tree.leaves(g["enc0"])[0]
    assert float(jnp.abs(enc_leaf).max()) > 0


@pytest.mark.slow
def test_auto_trainer_ctc_regularized():
    import jax
    import numpy as np
    from affganwriting_tpu.train.auto_trainer import AutoTrainer

    tr = AutoTrainer(ctc_weight=0.1, n_class=80)
    img = np.random.default_rng(0).normal(size=(2, 64, 128, 1))
    img = img.astype(np.float32)
    state = tr.init_state(img, jax.random.key(0))
    batch = {"image": img,
             "label": np.asarray([[5, 6, 7, 0], [8, 9, 0, 0]], np.int32),
             "label_lengths": np.asarray([3, 2], np.int32)}
    state = tr.train(state, iter([batch, batch]), iterations=2)
    assert int(state["step"]) == 2


def test_char_style_vgg_backbone_strip():
    """VGG19Backbone1D (reference char_style_vgg.py:1-67): 1-channel line
    image -> width strip at the adapter dim, finite under train and eval."""
    from affganwriting_tpu.models.line.char_style_vgg import VGG19Backbone1D

    m = VGG19Backbone1D(out_dim=32)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 64, 128, 1)), jnp.float32)
    variables = jax.jit(m.init)(jax.random.key(0), x)
    out = m.apply(variables, x)
    assert out.ndim == 3 and out.shape[0] == 2 and out.shape[2] == 32
    assert out.shape[1] > 1          # a real width sequence
    assert np.isfinite(np.asarray(out)).all()
    out_tr, _ = m.apply(variables, x, train=True,
                        mutable=["batch_stats"])
    assert np.isfinite(np.asarray(out_tr)).all()


def test_deskew_removes_slant():
    """deskew (normalize_line.py:9-64): a sheared stroke pattern comes back
    more vertical — the post-deskew vertical projection profile is peakier
    (higher variance) than the slanted input's."""
    from affganwriting_tpu.data.normalize_line import deskew

    h, w = 48, 160
    img = np.full((h, w), 255.0, np.float32)
    for x0 in range(16, 144, 16):          # slanted "strokes"
        for y in range(4, 44):
            x = int(x0 + 0.35 * y)
            img[y, x - 1: x + 2] = 0.0
    out = deskew(img)
    assert out.shape == img.shape

    def profile_var(a):
        return float(np.var((255.0 - a).sum(axis=0)))

    assert profile_var(out) > profile_var(img) * 1.2


def test_skeletonize_normalizes_stroke_width():
    """skeletonize (normalize_line.py:66-84): thick ink comes back thinner
    but connected, re-inked on white."""
    from affganwriting_tpu.data.normalize_line import skeletonize

    img = np.full((32, 64), 255.0, np.float32)
    img[10:20, 8:56] = 0.0                  # a 10px-thick bar
    out = skeletonize(img)
    assert out.shape == img.shape
    ink_in = (img < 128).sum()
    ink_out = (out < 128).sum()
    assert 0 < ink_out < ink_in             # thinner, not erased
    # the skeleton row survives along the bar's length
    assert (out[14:16, 10:54] < 200).any()
