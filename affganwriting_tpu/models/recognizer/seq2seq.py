"""Attention seq2seq recognizer R.

Rebuild of ``RecModel`` / ``Seq2Seq`` / ``Decoder``
(GAN_word/modules_tro.py:610-638, recognizer/models/seq2seqnew2.py:5-62,
recognizer/models/decoder.py:9-57).  The torch version decodes with a Python
loop (and even a per-sample Python beam search during training,
modules_tro.py:637); here decoding is one ``nn.scan`` over 11 steps with the
location-attention state carried, so the whole recognizer jits into a single
XLA while-loop — batched, static shapes, no host round-trips.

Training parity note: the reference calls Seq2Seq with ``teacher_rate=False,
train=False, beam_size=3`` from the GAN step, i.e. free-running decoding
whose per-step distributions feed the loss.  Beam-3-with-gradients is an
(accidental) inefficiency of the reference, not a semantic requirement: with
free running, greedy decoding is the beam-1 special case and is what we
compile into the train step.  A batched beam search lives in
``affganwriting_tpu/gen/beam.py`` for evaluation use.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from affganwriting_tpu.core.config import VOCAB
from affganwriting_tpu.models.recognizer.attention import LocationAttention
from affganwriting_tpu.models.recognizer.encoder import RecEncoder


class DecoderCell(nn.Module):
    """One decode step: attention -> context -> 2-layer GRU -> logits."""

    vocab_size: int = VOCAB.size
    hidden: int = 512
    embed_dim: int = 60
    dropout: float = 0.5
    train: bool = False

    @nn.compact
    def __call__(self, carry, step_in):
        hidden, prev_attn, prev_id, enc_out = carry
        teacher_id, use_teacher = step_in

        attn = LocationAttention(self.hidden, name="attention")(
            hidden, enc_out, prev_attn)                       # (B, T)
        context = jnp.einsum(
            "bt,bth->bh", attn, enc_out,
            preferred_element_type=jnp.float32)               # (B, H)

        emb = nn.Embed(self.vocab_size, self.embed_dim,
                       param_dtype=jnp.float32, name="embedding")(prev_id)
        x = jnp.concatenate([emb, context], axis=-1)          # (B, E+H)

        h0, x = nn.GRUCell(self.hidden, param_dtype=jnp.float32,
                           name="gru0")(hidden[0], x)
        x = nn.Dropout(self.dropout, deterministic=not self.train)(x)
        h1, x = nn.GRUCell(self.hidden, param_dtype=jnp.float32,
                           name="gru1")(hidden[1], x)
        logits = nn.Dense(self.vocab_size, param_dtype=jnp.float32,
                          name="out")(x)                      # (B, V)

        greedy = jnp.argmax(logits, axis=-1)
        next_id = jnp.where(use_teacher, teacher_id, greedy).astype(prev_id.dtype)
        new_hidden = jnp.stack([h0, h1], axis=0)
        return (new_hidden, attn, next_id, enc_out), (logits, attn)


class Recognizer(nn.Module):
    """Full R: VGG-BiGRU encoder + scan decoder.

    ``__call__(img, labels)`` returns per-step logits (B, T_out-1, V) —
    the (t, b, v)->(b, t, v) permuted output of the reference
    (modules_tro.py:638).
    """

    vocab_size: int = VOCAB.size
    hidden: int = 512
    embed_dim: int = 60
    output_max_len: int = 12
    dropout: float = 0.5
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, img, labels, *, train: bool = False,
                 teacher_rate: float = 0.0, rng=None):
        """img: (B, 64, 216, 1); labels: (B, T_out) with labels[:, 0] == GO.

        teacher_rate > 0 requires an rng (or a 'teacher' rng collection);
        the GAN training path uses free running (teacher_rate=0), matching
        the reference's ``teacher_rate=False`` calls (network_tro.py:43).
        """
        b = img.shape[0]
        steps = self.output_max_len - 1

        enc_out, hidden0 = RecEncoder(
            self.hidden, self.dropout, self.dtype, name="enc")(
            img, train=train)

        if teacher_rate > 0.0:
            if rng is None:
                rng = self.make_rng("teacher")
            use_teacher = (
                jax.random.uniform(rng, (steps, b)) < teacher_rate)
        else:
            use_teacher = jnp.zeros((steps, b), dtype=bool)
        teacher_ids = jnp.swapaxes(labels[:, 1:], 0, 1)       # (steps, B)

        scan = nn.scan(
            DecoderCell,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=0, out_axes=0, length=steps,
        )(self.vocab_size, self.hidden, self.embed_dim, self.dropout,
          train, name="dec")

        init_attn = jnp.zeros((b, enc_out.shape[1]), dtype=jnp.float32)
        go_ids = labels[:, 0]
        carry0 = (hidden0, init_attn, go_ids, enc_out)
        _, (logits, attns) = scan(carry0, (teacher_ids, use_teacher))
        return jnp.swapaxes(logits, 0, 1), jnp.swapaxes(attns, 0, 1)
