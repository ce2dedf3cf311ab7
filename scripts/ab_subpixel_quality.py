"""Quality A/B for the subpixel fast decoder vs the exact path, on a
TRAINED model.

The fast mode is exact in the interior but approximates the 2-pixel
reflect borders (models/decoder.py), and round 3 measured ~0.9 output
correlation through a RANDOM-init stack.  The open question (VERDICT r3
weak #7) is whether that matters on trained weights for the end metrics.
This script answers it: same checkpoint, same words, same style stacks,
generated through BOTH decoder paths (identical param tree), recognized by
the same R — reports per-mode generated-word CER plus image agreement.

Usage:
    timeout 1800 python scripts/ab_subpixel_quality.py \
        --ckpt runs/evidence_r4_word/ckpt --ckpt-name best
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--ckpt-name", default="best")
    p.add_argument("--writers", type=int, default=8)
    p.add_argument("--words", type=int, default=64)
    p.add_argument("--split", choices=("train", "test"), default="test")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from affganwriting_tpu.core.cache import enable_compile_cache

    enable_compile_cache()
    from affganwriting_tpu.core.checkpoint import CheckpointManager
    from affganwriting_tpu.core.config import VOCAB, default_config
    from affganwriting_tpu.data.iam import (
        default_reference_paths,
        load_corpus,
        parse_groundtruth,
        writer_label_map,
    )
    from affganwriting_tpu.data.words import WordStyleDataset
    from affganwriting_tpu.eval.generated import cer_of_pairs
    from affganwriting_tpu.gen.inference import encode_labels, variables_of
    from affganwriting_tpu.models.generator import Generator
    from affganwriting_tpu.train.state import build_models, init_state

    cfg = default_config()
    state = init_state(cfg, jax.random.key(args.seed))
    state = CheckpointManager(args.ckpt).restore(args.ckpt_name, state)
    gen_vars = variables_of(state.gen)
    rec_vars = variables_of(state.rec)
    _, _, _, rec = build_models(cfg)

    modes = {"fast": Generator(cfg, subpixel=True),
             "exact": Generator(cfg, subpixel=False)}

    def make_run(gen):
        @jax.jit
        def run(gv, rv, style, labels):
            pyramid = gen.apply(gv, style, train=False,
                                method=gen.encode_style)
            imgs = gen.apply(gv, pyramid, labels, train=False,
                             method=gen.generate)
            logits, _ = rec.apply(rv, imgs, labels, train=False)
            return imgs, jnp.argmax(logits, axis=-1)
        return run

    runs = {k: make_run(g) for k, g in modes.items()}

    paths = default_reference_paths()
    gt = parse_groundtruth(
        paths["train_gt" if args.split == "train" else "test_gt"])
    label_map = writer_label_map(gt)
    ds = WordStyleDataset(gt, label_map, cfg, corpus=None, seed=args.seed)
    words = [w[: cfg.max_chars] for w in load_corpus(paths["oov_corpus"])
             if w and all(c in VOCAB.letters for c in w)][: args.words]
    labels = encode_labels(words, cfg.output_max_len)

    rng = np.random.default_rng(args.seed)
    pairs = {k: [] for k in modes}
    img_mse, img_corr, n_stacks = 0.0, 0.0, 0
    for wid in list(gt.keys())[: args.writers]:
        entries = gt[wid][:]
        rng.shuffle(entries)
        while len(entries) < cfg.style_stack:
            entries = entries + entries[: cfg.style_stack - len(entries)]
        stack = np.stack(
            [ds._read(e, label_map[wid])
             for e in entries[: cfg.style_stack]], axis=-1
        )[None].astype(np.float32)
        outs = {}
        for k, run in runs.items():
            imgs, preds = run(gen_vars, rec_vars, stack, labels)
            outs[k] = (np.asarray(imgs, np.float32), np.asarray(preds))
            for i, w in enumerate(words):
                pairs[k].append((w, VOCAB.decode(outs[k][1][i]) or "x"))
        a, b = outs["fast"][0], outs["exact"][0]
        img_mse += float(np.mean((a - b) ** 2))
        img_corr += float(np.corrcoef(a.ravel(), b.ravel())[0, 1])
        n_stacks += 1

    res = {k: cer_of_pairs(v) for k, v in pairs.items()}
    print(json.dumps({
        "ckpt": os.path.join(args.ckpt, args.ckpt_name),
        "writers": args.writers, "words": len(words),
        "fast": res["fast"], "exact": res["exact"],
        "delta_cer_fast_minus_exact": round(
            res["fast"]["cer"] - res["exact"]["cer"], 3),
        "image_mse": round(img_mse / max(n_stacks, 1), 6),
        "image_corr": round(img_corr / max(n_stacks, 1), 4),
    }))


if __name__ == "__main__":
    main()
