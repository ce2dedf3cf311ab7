"""Generate target words and cross-check their legibility with a teacher.

The testtrocr.py / testtrocr2.py surface (GAN_word, W14/W12): generate a
fixed word list per writer, OCR the images with the teacher (TrOCR from a
local snapshot via --trocr-dir, else the framework's own recognizer), and
write a CSV of (writer, word, prediction, confidence) plus the images.
"""

from __future__ import annotations

import argparse
import csv
import os

TARGET_WORDS = ["the", "quick", "brown", "fox", "jumps", "over", "lazy",
                "dog", "hello", "world"]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="runs/teacher_check")
    p.add_argument("--trocr-dir", default=None)
    p.add_argument("--max-writers", type=int, default=2)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import numpy as np

    from affganwriting_tpu.core.checkpoint import CheckpointManager
    from affganwriting_tpu.core.config import default_config
    from affganwriting_tpu.data.iam import (
        default_reference_paths,
        parse_groundtruth,
        writer_label_map,
    )
    from affganwriting_tpu.data.words import WordStyleDataset
    from affganwriting_tpu.eval.sheets import _normalize, _save_png
    from affganwriting_tpu.gen.inference import (
        encode_labels,
        make_generate_fn,
        variables_of,
    )
    from affganwriting_tpu.train.state import init_state
    from affganwriting_tpu.train.teacher import SelfTeacher, TrOCRTeacher

    cfg = default_config()
    state = init_state(cfg, jax.random.key(args.seed))
    if args.ckpt:
        state = CheckpointManager(args.ckpt).restore("best", state)
    if args.trocr_dir:
        teacher = TrOCRTeacher(args.trocr_dir)
    else:
        teacher = SelfTeacher(cfg, variables_of(state.rec))

    gt = parse_groundtruth(default_reference_paths()["test_gt"])
    label_map = writer_label_map(gt)
    ds = WordStyleDataset(gt, label_map, cfg, seed=args.seed)
    generate = make_generate_fn(cfg)
    gen_vars = variables_of(state.gen)

    os.makedirs(args.out, exist_ok=True)
    rows = []
    rng = np.random.default_rng(args.seed)
    for wid in list(gt.keys())[: args.max_writers]:
        entries = list(gt[wid])
        rng.shuffle(entries)
        while len(entries) < cfg.style_stack:
            entries += entries[: cfg.style_stack - len(entries)]
        stack = np.stack(
            [ds._read(e, label_map[wid]) for e in entries[: cfg.style_stack]],
            axis=-1)[None].astype(np.float32)
        labels = encode_labels(TARGET_WORDS, cfg.output_max_len)
        imgs = np.asarray(generate(gen_vars, stack, labels))
        texts, conf = teacher.predict(imgs)
        for i, w in enumerate(TARGET_WORDS):
            name = f"{wid}-{i}.{w}-{texts[i] or 'x'}.png"
            _save_png(os.path.join(args.out, name),
                      _normalize(imgs[i, :, :, 0]))
            rows.append((wid, w, texts[i], float(conf[i])))

    with open(os.path.join(args.out, "results.csv"), "w", newline="") as f:
        wcsv = csv.writer(f)
        wcsv.writerow(["writer", "word", "prediction", "confidence"])
        wcsv.writerows(rows)
    print(f"wrote {len(rows)} rows to {args.out}/results.csv")


if __name__ == "__main__":
    main()
