"""Attention seq2seq recognizer R.

Rebuild of ``RecModel`` / ``Seq2Seq`` / ``Decoder``
(GAN_word/modules_tro.py:610-638, recognizer/models/seq2seqnew2.py:5-62,
recognizer/models/decoder.py:9-57).  The torch version decodes with a Python
loop (and a per-sample Python beam search, seq2seqnew2.py:64-181); here
greedy/teacher decoding is one ``nn.scan`` over 11 steps and beam search is
a fully batched scan with beams folded into the batch axis — the whole
recognizer jits into a single XLA program.

Training parity note: the reference calls Seq2Seq with ``teacher_rate=False,
train=False, beam_size=3`` from the GAN step, i.e. free-running decoding
whose per-step distributions feed the loss.  Beam-3-with-gradients is an
(accidental) inefficiency of the reference, not a semantic requirement: with
free running, greedy decoding is the beam-1 special case and is what we
compile into the train step; ``beam_search`` serves evaluation.
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

    @nn.compact
    def __call__(self, carry, step_in, *, train: bool = False):
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
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        h1, x = nn.GRUCell(self.hidden, param_dtype=jnp.float32,
                           name="gru1")(hidden[1], x)
        logits = nn.Dense(self.vocab_size, param_dtype=jnp.float32,
                          name="out")(x)                      # (B, V)

        greedy = jnp.argmax(logits, axis=-1)
        next_id = jnp.where(use_teacher, teacher_id, greedy).astype(
            prev_id.dtype)
        new_hidden = jnp.stack([h0, h1], axis=0)
        return (new_hidden, attn, next_id, enc_out), (logits, attn)


class Recognizer(nn.Module):
    """Full R: VGG-BiGRU encoder + scan decoder.

    ``__call__(img, labels)`` returns per-step logits (B, T_out-1, V) —
    the (t, b, v)->(b, t, v) permuted output of the reference
    (modules_tro.py:638).  ``beam_search`` returns the best token sequence
    per sample, batched over samples x beams.
    """

    vocab_size: int = VOCAB.size
    hidden: int = 512
    embed_dim: int = 60
    output_max_len: int = 12
    dropout: float = 0.5
    dtype: jnp.dtype = jnp.bfloat16
    # scan unroll for the BiGRU encoder and the decoder scan; the step
    # counts are small static constants (13 / 11), so full unroll turns
    # the recurrences into straight-line HLO (see config.rec_scan_unroll)
    unroll: int = 1

    def setup(self):
        self.enc = RecEncoder(self.hidden, self.dropout, self.dtype,
                              unroll=self.unroll, name="enc")
        self.dec = DecoderCell(self.vocab_size, self.hidden, self.embed_dim,
                               self.dropout, name="dec")

    def __call__(self, img, labels, *, train: bool = False,
                 teacher_rate: float = 0.0, rng=None):
        """img: (B, 64, 216, 1); labels: (B, T_out) with labels[:, 0] == GO.

        teacher_rate > 0 requires an rng (or a 'teacher' rng collection);
        the GAN training path uses free running (teacher_rate=0), matching
        the reference's ``teacher_rate=False`` calls (network_tro.py:43).
        """
        enc_out, hidden0 = self.enc(img, train=train)
        return self.decode(enc_out, hidden0, labels, train=train,
                           teacher_rate=teacher_rate, rng=rng)

    def read_features(self, feat, labels):
        """Inference tail for an externally-computed VGG trunk output —
        the int8 serving path (ops/quant.py:vgg_quant_apply) runs the
        trunk at 2x MXU rate and hands (B, 4, 13, 512) features here."""
        enc_out, hidden0 = self.enc.from_feat(feat, train=False)
        return self.decode(enc_out, hidden0, labels)

    def decode(self, enc_out, hidden0, labels, *, train: bool = False,
               teacher_rate: float = 0.0, rng=None):
        b = enc_out.shape[0]
        steps = self.output_max_len - 1

        # teacher_rate may be a traced scalar; the rng presence decides the
        # (static) branch
        if rng is None and not self.has_rng("teacher"):
            use_teacher = jnp.zeros((steps, b), dtype=bool)
        else:
            if rng is None:
                rng = self.make_rng("teacher")
            use_teacher = (
                jax.random.uniform(rng, (steps, b)) < teacher_rate)
        teacher_ids = jnp.swapaxes(labels[:, 1:], 0, 1)       # (steps, B)

        def step(cell, carry, xs):
            return cell(carry, xs, train=train)

        scan = nn.scan(
            step,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=0, out_axes=0,
            unroll=min(self.unroll, steps),
        )

        init_attn = jnp.zeros((b, enc_out.shape[1]), dtype=jnp.float32)
        go_ids = labels[:, 0]
        carry0 = (hidden0, init_attn, go_ids, enc_out)
        _, (logits, attns) = scan(
            self.dec, carry0, (teacher_ids, use_teacher))
        return jnp.swapaxes(logits, 0, 1), jnp.swapaxes(attns, 0, 1)

    def beam_search(self, img, *, beam_size: int = 3,
                    eos_id: int = VOCAB.end):
        """Batched beam search (replaces the reference's per-sample Python
        loops, seq2seqnew2.py:75-181).  Returns (tokens (B, steps),
        scores (B,)) of the best hypothesis; log-probs via log_softmax
        (the reference's ``log(logits + 1e-12)`` on raw scores is numerically
        unsound and not reproduced)."""
        k = beam_size
        b = img.shape[0]
        steps = self.output_max_len - 1
        v = self.vocab_size

        enc_out, hidden0 = self.enc(img, train=False)
        t_enc = enc_out.shape[1]

        def fold(x):  # (B, ...) -> (B*K, ...) by repeat
            return jnp.repeat(x, k, axis=0)

        carry0 = {
            "hidden": jnp.repeat(hidden0, k, axis=1),       # (2, BK, H)
            "attn": jnp.zeros((b * k, t_enc), jnp.float32),
            "last": jnp.full((b * k,), VOCAB.go, jnp.int32),
            "scores": jnp.tile(
                jnp.concatenate(
                    [jnp.zeros((1,)), jnp.full((k - 1,), -1e9)]), (b,)),
            "alive": jnp.ones((b * k,), bool),
            "seq": jnp.zeros((b * k, steps), jnp.int32),
            "enc": fold(enc_out),
        }

        def step(cell, carry, t):
            dummy_teacher = jnp.zeros((b * k,), jnp.int32)
            dummy_flag = jnp.zeros((b * k,), bool)
            (hidden, attn, _, _), (logits, _) = cell(
                (carry["hidden"], carry["attn"], carry["last"], carry["enc"]),
                (dummy_teacher, dummy_flag), train=False)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            # finished beams may only extend with EOS at zero cost
            frozen = jnp.full((v,), -jnp.inf).at[eos_id].set(0.0)
            logp = jnp.where(carry["alive"][:, None], logp, frozen[None, :])

            total = carry["scores"][:, None] + logp          # (BK, V)
            total = total.reshape(b, k * v)
            top_scores, top_idx = jax.lax.top_k(total, k)    # (B, K)
            parent = top_idx // v                            # beam index
            token = (top_idx % v).astype(jnp.int32)

            flat_parent = (
                parent + jnp.arange(b)[:, None] * k).reshape(-1)  # (BK,)
            new = {
                "hidden": hidden[:, flat_parent, :],
                "attn": attn[flat_parent],
                "last": token.reshape(-1),
                "scores": top_scores.reshape(-1),
                "alive": jnp.logical_and(
                    carry["alive"][flat_parent],
                    token.reshape(-1) != eos_id),
                "seq": carry["seq"][flat_parent].at[:, t].set(
                    token.reshape(-1)),
                "enc": carry["enc"],
            }
            return new, None

        scan = nn.scan(
            step,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0, out_axes=0,
        )
        final, _ = scan(self.dec, carry0, jnp.arange(steps))
        scores = final["scores"].reshape(b, k)
        best = jnp.argmax(scores, axis=-1)
        seqs = final["seq"].reshape(b, k, steps)
        best_seq = jnp.take_along_axis(
            seqs, best[:, None, None], axis=1)[:, 0]
        best_score = jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0]
        return best_seq, best_score
