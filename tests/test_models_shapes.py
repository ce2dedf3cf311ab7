"""Golden shape/dtype tests for the word-level model zoo.

Shapes mirror the reference's documented activations (SURVEY.md §2.1):
style pyramid last tap (B, 8, 27, 512), generated image (B, 64, 216, 1),
D patch vector (B, 1024), writer logits (B, 500), recognizer logits
(B, 11, 55).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from affganwriting_tpu.core.config import default_config, VOCAB
from affganwriting_tpu.models.generator import Generator
from affganwriting_tpu.models.discriminator import Discriminator
from affganwriting_tpu.models.writer_cla import WriterClassifier
from affganwriting_tpu.models.recognizer.seq2seq import Recognizer

B = 2
CFG = default_config().replace(compute_dtype="float32", style_encoder="cnn")


def _style_stack(b=B):
    return jnp.asarray(
        np.random.default_rng(0).normal(size=(b, 64, 216, 50)),
        dtype=jnp.float32,
    )


def _labels(b=B):
    words = ["deep", "scan"]
    return jnp.asarray(
        [VOCAB.pad_label(w, CFG.output_max_len) for w in words[:b]],
        dtype=jnp.int32,
    )


def test_vocab():
    assert VOCAB.size == 55
    lab = VOCAB.pad_label("the", 12)
    assert lab[0] == VOCAB.go and lab[4] == VOCAB.end and lab[5] == VOCAB.pad
    assert VOCAB.decode(lab) == "the"


@pytest.mark.slow
def test_generator_shapes():
    gen = Generator(CFG)
    variables = gen.init(jax.random.key(0), _style_stack(), _labels())
    img = gen.apply(variables, _style_stack(), _labels())
    assert img.shape == (B, 64, 216, 1)
    assert float(jnp.max(jnp.abs(img))) <= 1.0 + 1e-5  # tanh head

    pyramid = gen.apply(variables, _style_stack(), method=gen.encode_style)
    assert pyramid[-1].shape == (B, 8, 27, 512)
    for tap in pyramid[3:5]:
        assert tap.shape[-1] == 512  # iAFF skip taps


@pytest.mark.slow
@pytest.mark.parametrize("enc", ["resnet50", "resnet18"])
def test_resnet_style_encoders(enc):
    cfg = CFG.replace(style_encoder=enc)
    gen = Generator(cfg)
    stack = _style_stack(1)
    variables = gen.init(jax.random.key(0), stack, _labels(1))
    pyramid = gen.apply(
        variables, stack, method=gen.encode_style,
    )
    assert len(pyramid) == 5
    assert pyramid[-1].shape == (1, 8, 27, 512)
    assert pyramid[3].shape[-1] == 512


def test_discriminator_writer_cla_shapes():
    img = jnp.zeros((B, 64, 216, 1), jnp.float32)
    dis = Discriminator(dtype=jnp.float32)
    v = jax.jit(dis.init)(jax.random.key(0), img)
    assert jax.jit(dis.apply)(v, img).shape == (B, 1024)

    cla = WriterClassifier(num_writers=500, dtype=jnp.float32)
    v = jax.jit(cla.init)(jax.random.key(0), img)
    assert jax.jit(cla.apply)(v, img).shape == (B, 500)


_REC_CACHE = {}


def _recognizer():
    # initializing the VGG+BiGRU recognizer eagerly costs ~6s on this
    # 1-core CPU; both recognizer tests share one init
    if "rec" not in _REC_CACHE:
        img = jnp.zeros((B, 64, 216, 1), jnp.float32)
        rec = Recognizer(dtype=jnp.float32)
        v = jax.jit(rec.init)(jax.random.key(0), img, _labels())
        _REC_CACHE["rec"] = (rec, v, img)
    return _REC_CACHE["rec"]


def test_recognizer_shapes():
    rec, v, img = _recognizer()
    logits, attns = jax.jit(rec.apply)(v, img, _labels())
    assert logits.shape == (B, 11, 55)
    assert attns.shape == (B, 11, 13)
    # attention rows are distributions
    np.testing.assert_allclose(
        np.asarray(jnp.sum(attns, axis=-1)), 1.0, rtol=1e-5)


def test_recognizer_teacher_forcing_runs():
    rec, v, img = _recognizer()
    logits, _ = jax.jit(lambda v_, im, la, r: rec.apply(
        v_, im, la, train=True, teacher_rate=0.5, rngs=r,
        mutable=["batch_stats"],
    ))(v, img, _labels(),
       {"teacher": jax.random.key(1), "dropout": jax.random.key(2)})[0]
    assert logits.shape == (B, 11, 55)


def test_vmap_word_merge_is_per_slice_pure():
    """The train step merges the two fake-word R calls with jax.vmap
    (train/step.py heads_loss).  That is only sound if batch-coupled ops
    (BatchNorm batch statistics) stay per-slice under vmap: slice 1's
    input must not influence slice 0's output, and identical slices must
    produce identical outputs."""
    import flax.linen as nn

    class TinyBNTrunk(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(2):
                x = nn.Conv(8, (3, 3), name=f"c{i}")(x)
                x = nn.BatchNorm(use_running_average=False,
                                 name=f"bn{i}")(x)
                x = nn.relu(x)
            return x

    t = TinyBNTrunk()
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.normal(size=(2, 8, 12, 1)), jnp.float32)
    x2 = jnp.asarray(rng.normal(size=(2, 8, 12, 1)), jnp.float32)
    x3 = jnp.asarray(rng.normal(size=(2, 8, 12, 1)), jnp.float32)
    v = t.init(jax.random.key(0), x1)

    def one(x):
        y, _ = t.apply(v, x, mutable=["batch_stats"])
        return y

    f = jax.jit(lambda s: jax.vmap(one)(s))
    a = f(jnp.stack([x1, x2]))
    b = f(jnp.stack([x1, x3]))
    assert float(jnp.max(jnp.abs(a[0] - b[0]))) == 0.0
    c = f(jnp.stack([x1, x1]))
    assert float(jnp.max(jnp.abs(c[0] - c[1]))) == 0.0
