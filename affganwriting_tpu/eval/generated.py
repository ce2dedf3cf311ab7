"""CER over a folder of generated images, parsed from filenames.

Rebuild of GAN_word/evaluate_cer_generated.py:9-87 / cer.py: filenames are
``<wid>-<n>.<GT>-<pred>.png``; CER = 100 * sum(edit) / sum(len(GT)).  The
edit distances for the whole folder run as one batched jit call.
"""

from __future__ import annotations

import os

import numpy as np

from affganwriting_tpu.core.config import VOCAB
from affganwriting_tpu.eval.cer import batched_levenshtein


def parse_generated_name(name: str):
    """'049-3.three-threw.png' -> ('three', 'threw') or None."""
    stem, ext = os.path.splitext(name)
    if ext.lower() not in (".png", ".jpg", ".jpeg"):
        return None
    dot = stem.find(".")
    if dot < 0:
        return None
    pair = stem[dot + 1:]
    if "-" not in pair:
        return None
    gt, pred = pair.split("-", 1)
    return gt, pred


def cer_of_folder(folder: str) -> dict:
    pairs = []
    for name in sorted(os.listdir(folder)):
        parsed = parse_generated_name(name)
        if parsed:
            pairs.append(parsed)
    return cer_of_pairs(pairs)


def cer_of_pairs(pairs: list[tuple[str, str]]) -> dict:
    """CER over (GT, pred) text pairs — the folder protocol's core, reused
    by the int8-serving CER gate (scripts/ab_int8_cer.py)."""
    if not pairs:
        return {"cer": 0.0, "count": 0}
    max_len = max(max(len(g), len(p)) for g, p in pairs)
    max_len = max(max_len, 1)

    def encode(ws):
        ids = np.zeros((len(ws), max_len), np.int32)
        lens = np.zeros(len(ws), np.int32)
        for i, w in enumerate(ws):
            e = [c for c in VOCAB.encode("".join(
                ch for ch in w if ch in VOCAB.letters))]
            ids[i, : len(e)] = e
            lens[i] = len(e)
        return ids, lens

    g_ids, g_len = encode([g for g, _ in pairs])
    p_ids, p_len = encode([p for _, p in pairs])
    dists = np.asarray(batched_levenshtein(p_ids, p_len, g_ids, g_len))
    total_len = int(g_len.sum())
    return {
        "cer": 100.0 * float(dists.sum()) / max(total_len, 1),
        "count": len(pairs),
        "edits": int(dists.sum()),
        "ref_len": total_len,
    }


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("folder")
    args = p.parse_args(argv)
    print(cer_of_folder(args.folder))


if __name__ == "__main__":
    main()
