"""Beam search: shapes, beam-1 == greedy argmax path, scores ordered."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from affganwriting_tpu.core.config import VOCAB
from affganwriting_tpu.models.recognizer.seq2seq import Recognizer

B = 2


@functools.lru_cache(maxsize=1)
def _setup():
    rec = Recognizer(dtype=jnp.float32)
    img = jnp.asarray(
        np.random.default_rng(0).normal(size=(B, 64, 216, 1)), jnp.float32)
    labels = jnp.asarray(
        [VOCAB.pad_label("beam", 12)] * B, jnp.int32)
    v = jax.jit(rec.init)(jax.random.key(0), img, labels)
    return rec, v, img, labels


def test_beam_shapes_and_beam1_equals_greedy():
    rec, v, img, labels = _setup()
    seq1, score1 = jax.jit(lambda v_, im: rec.apply(
        v_, im, beam_size=1, method=rec.beam_search))(v, img)
    assert seq1.shape == (B, 11) and score1.shape == (B,)

    logits, _ = jax.jit(rec.apply)(v, img, labels)  # free-running greedy
    greedy = np.asarray(jnp.argmax(logits, axis=-1))
    np.testing.assert_array_equal(np.asarray(seq1), greedy)


def test_beam3_runs_and_eos_freezes():
    rec, v, img, labels = _setup()
    seq3, s3 = jax.jit(lambda v_, im: rec.apply(
        v_, im, beam_size=3, method=rec.beam_search))(v, img)
    assert seq3.shape == (B, 11)
    assert np.isfinite(np.asarray(s3)).all()
    # once END is emitted, every later token must be END (frozen beams)
    arr = np.asarray(seq3)
    for row in arr:
        seen_end = False
        for t in row:
            if seen_end:
                assert t == VOCAB.end
            if t == VOCAB.end:
                seen_end = True
