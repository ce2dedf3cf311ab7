"""CER pipeline vs a plain-python Levenshtein oracle."""

import numpy as np

from affganwriting_tpu.core.config import VOCAB
from affganwriting_tpu.eval.cer import batched_levenshtein, cer_counts, strip_tokens


def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev = dp[0]
        dp[0] = i
        for j, cb in enumerate(b, 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
            prev = cur
    return dp[len(b)]


def test_levenshtein_matches_oracle():
    rng = np.random.default_rng(0)
    words_a, words_b = [], []
    for _ in range(32):
        la, lb = rng.integers(0, 11, size=2)
        words_a.append("".join(rng.choice(list("abcdef"), la)))
        words_b.append("".join(rng.choice(list("abcdef"), lb)))

    def pad_ids(ws):
        out = np.zeros((len(ws), 10), np.int32)
        lens = np.zeros(len(ws), np.int32)
        for i, w in enumerate(ws):
            ids = VOCAB.encode(w)
            out[i, : len(ids)] = ids
            lens[i] = len(ids)
        return out, lens

    a, a_len = pad_ids(words_a)
    b, b_len = pad_ids(words_b)
    dists = np.asarray(batched_levenshtein(a, a_len, b, b_len))
    expected = [_lev(x, y) for x, y in zip(words_a, words_b)]
    np.testing.assert_array_equal(dists, expected)


def test_strip_tokens():
    ids = np.asarray([[0, 5, 6, 1, 2, 2], [0, 1, 2, 2, 2, 2]], np.int32)
    out, lens = strip_tokens(ids)
    assert lens.tolist() == [2, 0]
    assert out[0, :2].tolist() == [5, 6]


def test_cer_counts_end_to_end():
    gt = np.asarray([VOCAB.pad_label("the", 12)], np.int32)
    pred_ok = np.asarray([VOCAB.pad_label("the", 12)], np.int32)
    pred_bad = np.asarray([VOCAB.pad_label("thx", 12)], np.int32)
    ed, ln = cer_counts(pred_ok, gt)
    assert (int(ed), int(ln)) == (0, 3)
    ed, ln = cer_counts(pred_bad, gt)
    assert (int(ed), int(ln)) == (1, 3)
