"""The determinism contract (BASELINE.md): same (params, style stack, text)
always yields the same image; different text yields a different image."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from affganwriting_tpu.core.config import VOCAB, default_config
from affganwriting_tpu.gen.inference import encode_labels, make_generate_fn
from affganwriting_tpu.train.state import build_models

CFG = default_config().replace(
    compute_dtype="float32", style_encoder="resnet18",
    img_height=32, img_width=104)


@pytest.mark.slow
def test_word_generation_deterministic():
    gen, _, _, _ = build_models(CFG)
    rng = np.random.default_rng(0)
    style = np.asarray(rng.normal(size=(1, 32, 104, 50)), np.float32)
    labels = encode_labels(["same", "same", "diff"], CFG.output_max_len)
    v = jax.jit(gen.init)(jax.random.key(0), jnp.asarray(style), labels[:1])
    fn = make_generate_fn(CFG)
    img1 = np.asarray(fn(v, style, labels))
    img2 = np.asarray(fn(v, style, labels))
    np.testing.assert_array_equal(img1, img2)          # call-to-call
    np.testing.assert_array_equal(img1[0], img1[1])    # same text, same img
    assert not np.array_equal(img1[0], img1[2])        # text changes image
