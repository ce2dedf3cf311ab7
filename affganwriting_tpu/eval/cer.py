"""Batched character-error-rate (CER) as a jit'd DP.

The reference computes CER with python-Levenshtein per sample on the host
(GAN_word/loss_tro.py:43-72, cer.py:5-47).  Here the whole batch runs as one
XLA program: control tokens (GO/END/PAD) are stripped by a stable compaction,
then a vectorized Levenshtein wavefront computes all edit distances at once.
Protocol identical to the reference: ``100 * sum(edit) / sum(len(gt))``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from affganwriting_tpu.core.config import VOCAB


def strip_tokens(ids: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Remove GO/END/PAD ids, compacting letters to the front.

    ids: (B, T) -> (compacted (B, T), lengths (B,)).  Matches the
    reference's filter of ids < num_tokens (loss_tro.py:60-62) — note it
    strips *all* control tokens anywhere, not just a suffix.
    """
    keep = ids >= VOCAB.num_tokens
    # stable argsort of (not keep) pushes kept positions forward in order
    order = jnp.argsort(~keep, axis=-1, stable=True)
    compacted = jnp.take_along_axis(ids, order, axis=-1)
    lengths = jnp.sum(keep, axis=-1)
    return compacted, lengths


@functools.partial(jax.jit, static_argnames=())
def batched_levenshtein(a, a_len, b, b_len):
    """Edit distances for a batch of padded sequences.

    a: (B, La) int, valid prefix length a_len; likewise b.  Runs the classic
    row-by-row DP with the column recurrence as a ``lax.scan`` carrying the
    running minimum — O(La*Lb) tiny steps, vectorized over the batch.
    """
    B, La = a.shape
    Lb = b.shape[1]

    row0 = jnp.broadcast_to(
        jnp.arange(Lb + 1, dtype=jnp.int32)[None, :], (B, Lb + 1))
    # positions beyond b_len shouldn't matter; we read the answer at b_len.

    def row_step(prev_row, i):
        ai = a[:, i]                               # (B,)
        # within-row scan over j with carry new[j-1]
        def col_step(carry, j):
            left = carry                           # new[j-1]  (B,)
            up = prev_row[:, j + 1]                # prev[j]
            diag = prev_row[:, j]                  # prev[j-1]
            cost = jnp.where(ai == b[:, j], 0, 1)
            val = jnp.minimum(
                jnp.minimum(left + 1, up + 1), diag + cost)
            # past a's valid length the row must stay equal to prev_row
            val = jnp.where(i < a_len, val, up)
            return val, val

        first = jnp.where(i < a_len, i + 1, prev_row[:, 0])
        _, cols = jax.lax.scan(
            col_step, first, jnp.arange(Lb))
        new_row = jnp.concatenate(
            [first[:, None], jnp.swapaxes(cols, 0, 1)], axis=1)
        return new_row, None

    final_row, _ = jax.lax.scan(row_step, row0, jnp.arange(La))
    # distance sits at column b_len of the final row... but rows past a_len
    # were frozen, so final_row is row a_len. Gather per-sample column b_len.
    return jnp.take_along_axis(final_row, b_len[:, None], axis=1)[:, 0]


def cer_counts(pred_ids: jnp.ndarray, gt_ids: jnp.ndarray):
    """(sum edit distance, sum gt length) after token stripping.

    pred_ids/gt_ids: (B, T) label ids (argmax of logits for predictions).
    """
    p, p_len = strip_tokens(pred_ids)
    g, g_len = strip_tokens(gt_ids)
    dists = batched_levenshtein(p, p_len, g, g_len)
    return jnp.sum(dists), jnp.sum(g_len)


def wer(pred_texts: list[str], gt_texts: list[str]) -> float:
    """Word error rate over text pairs (line_generation/utils/
    error_rates.py:1-27): word-level Levenshtein / reference word count."""
    ed_sum, n_sum = 0, 0
    for p, g in zip(pred_texts, gt_texts):
        pw, gw = p.split(), g.split()
        vocab = {w: i for i, w in enumerate(dict.fromkeys(pw + gw))}
        dp = list(range(len(gw) + 1))
        for i, wp in enumerate(pw, 1):
            prev = dp[0]
            dp[0] = i
            for j, wg in enumerate(gw, 1):
                cur = dp[j]
                dp[j] = min(dp[j] + 1, dp[j - 1] + 1,
                            prev + (vocab[wp] != vocab[wg]))
                prev = cur
        ed_sum += dp[len(gw)]
        n_sum += len(gw)
    return ed_sum / max(n_sum, 1)


class CERAccumulator:
    """Streaming CER across batches (GAN_word/loss_tro.py:43-72 semantics)."""

    def __init__(self):
        self.ed = 0
        self.length = 0

    def add_logits(self, logits, gt_labels_no_go):
        pred = jnp.argmax(logits, axis=-1)
        ed, ln = cer_counts(pred, gt_labels_no_go)
        self.ed += int(ed)
        self.length += int(ln)

    def value(self) -> float:
        if self.length == 0:
            return 0.0
        return 100.0 * self.ed / self.length
