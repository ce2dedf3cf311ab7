"""CER gate for the w8a8 serving mode: int8 vs bf16 on a TRAINED model.

The round-3 A/B (scripts/ab_int8_static.py) proved static-int8 throughput
(7.9k vs 5.6k imgs/s/chip) but gated quality only on feature correlation.
This script gates on the END metric: generated-word CER against the
requested text (the reference's evaluate_cer_generated.py protocol) for the
same words and the same style stacks, bf16 pipeline vs the full static-w8a8
pipeline (int8 R trunk + static-calibrated int8 G).

Usage (after a training run):
    timeout 1800 python scripts/ab_int8_cer.py \
        --ckpt runs/evidence_r4_word/ckpt --ckpt-name best \
        [--writers 8] [--words 64] [--split test] [--corpus oov]

Prints one JSON line: {"bf16": {...}, "int8": {...}, "delta_cer": ...,
"pred_agreement": ...}.  Pass/fail policy: int8 ships as the default
serving mode only if delta_cer is within noise (< 1.0 CER point).
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
    p.add_argument("--corpus", choices=("in_vocab", "oov"), default="oov")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax

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
    from affganwriting_tpu.gen.inference import (
        calibrate_gen_quant,
        encode_labels,
        make_generate_and_read_fn,
        make_generate_and_read_quant_fn,
        variables_of,
    )
    from affganwriting_tpu.ops.quant import prepare_vgg_quant
    from affganwriting_tpu.train.state import init_state

    cfg = default_config()
    state = init_state(cfg, jax.random.key(args.seed))
    state = CheckpointManager(args.ckpt).restore(args.ckpt_name, state)
    gen_vars = variables_of(state.gen)
    rec_vars = variables_of(state.rec)

    paths = default_reference_paths()
    gt = parse_groundtruth(
        paths["train_gt" if args.split == "train" else "test_gt"])
    label_map = writer_label_map(gt)
    ds = WordStyleDataset(gt, label_map, cfg, corpus=None, seed=args.seed)
    corpus_path = (paths["oov_corpus"] if args.corpus == "oov" else
                   os.path.join(os.path.dirname(paths["corpus"]),
                                "in_vocab.subset.tro.37"))
    words = [w[: cfg.max_chars] for w in load_corpus(corpus_path)
             if w and all(c in VOCAB.letters for c in w)][: args.words]
    labels = encode_labels(words, cfg.output_max_len)

    rng = np.random.default_rng(args.seed)
    stacks = []
    for wid in list(gt.keys())[: args.writers]:
        entries = gt[wid][:]
        rng.shuffle(entries)
        while len(entries) < cfg.style_stack:
            entries = entries + entries[: cfg.style_stack - len(entries)]
        stacks.append(np.stack(
            [ds._read(e, label_map[wid])
             for e in entries[: cfg.style_stack]], axis=-1
        )[None].astype(np.float32))

    base = make_generate_and_read_fn(cfg)
    # calibrate both int8 halves on the FIRST writer's generated batch —
    # serving calibrates once, then styles vary (bench.py methodology)
    calib_imgs, _ = base(gen_vars, rec_vars, stacks[0], labels)
    qparams = prepare_vgg_quant(rec_vars, np.asarray(calib_imgs))
    gen_vars_cal = calibrate_gen_quant(cfg, gen_vars, stacks[0], labels)
    quant = make_generate_and_read_quant_fn(cfg, quant_gen="static")

    pairs_bf16, pairs_int8 = [], []
    agree = total = 0
    for stack in stacks:
        _, p_b = base(gen_vars, rec_vars, stack, labels)
        _, p_q = quant(gen_vars_cal, rec_vars, qparams, stack, labels)
        p_b, p_q = np.asarray(p_b), np.asarray(p_q)
        agree += int((p_b == p_q).sum())
        total += p_b.size
        for i, w in enumerate(words):
            pairs_bf16.append((w, VOCAB.decode(p_b[i]) or "x"))
            pairs_int8.append((w, VOCAB.decode(p_q[i]) or "x"))

    r_b = cer_of_pairs(pairs_bf16)
    r_q = cer_of_pairs(pairs_int8)
    out = {
        "ckpt": os.path.join(args.ckpt, args.ckpt_name),
        "writers": args.writers, "words": len(words),
        "corpus": args.corpus, "split": args.split,
        "bf16": r_b, "int8": r_q,
        "delta_cer": round(r_q["cer"] - r_b["cer"], 3),
        "pred_token_agreement": round(agree / max(total, 1), 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
