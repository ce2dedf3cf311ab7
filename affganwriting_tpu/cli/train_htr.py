"""Standalone word-recognizer training — the synthetic-word CER floor.

Rebuild of the pre-GANwriting recognizer project's entry
(GAN_word/recognizer/main_torch_latest.py: attention seq2seq alone on word
images, marcal augmentation, Adam 2e-4, scheduled teacher forcing) over the
same synthetic renderer the word GAN trains against.  Its held-out CER is
the floor the GAN's generated-word CER should be compared to — the word
analog of the line stack's 0.51% standalone-HWR calibration (VERDICT r4
weak #2):

    python -m affganwriting_tpu.cli.train_htr --epochs 30

Saves ``htr_final`` (orbax swap-write) + metrics.jsonl; prints the final
held-out CER as one JSON line.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--steps-per-epoch", type=int, default=50)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--train-writers", type=int, default=500,
                   help="writer seeds 0..N-1 render the train set")
    p.add_argument("--eval-words", type=int, default=256)
    p.add_argument("--no-augment", dest="augment", action="store_false",
                   default=True, help="disable the marcal pipeline")
    p.add_argument("--logdir", default="runs/htr_word")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from affganwriting_tpu.core.cache import enable_compile_cache

    enable_compile_cache()
    import json
    import os
    import shutil

    import orbax.checkpoint as ocp

    from affganwriting_tpu.core.config import VOCAB, default_config
    from affganwriting_tpu.data.augment import marcal_augment
    from affganwriting_tpu.data.iam import (
        default_reference_paths,
        parse_groundtruth,
    )
    from affganwriting_tpu.data.words import synthetic_word_image
    from affganwriting_tpu.eval.cer import cer_counts
    from affganwriting_tpu.train.htr_trainer import HTRTrainer
    from affganwriting_tpu.utils.logging import MetricsLogger

    cfg = default_config()
    trainer = HTRTrainer(cfg, seed=args.seed)
    logger = MetricsLogger(args.logdir)
    rng = np.random.default_rng(args.seed)

    paths = default_reference_paths()
    tr_words = sorted({e.word for ws in parse_groundtruth(
        paths["train_gt"]).values() for e in ws})
    te_words = sorted({e.word for ws in parse_groundtruth(
        paths["test_gt"]).values() for e in ws})
    # held-out protocol: test-GT words, writer seeds the train set never
    # rendered (>= train_writers), no augmentation
    te_pick = rng.choice(len(te_words), size=min(
        args.eval_words, len(te_words)), replace=False)

    def render(word, writer_seed, augment):
        img = synthetic_word_image(
            word, writer_seed, cfg.img_height, cfg.img_width)
        if augment:
            img01 = (img + 1.0) * 0.5
            img = marcal_augment(img01, rng).astype(np.float32) * 2.0 - 1.0
        return img

    def make_batch(words, writer_seeds, augment):
        img = np.stack([render(w, s, augment)
                        for w, s in zip(words, writer_seeds)])[..., None]
        lab = np.asarray([VOCAB.pad_label(w, cfg.output_max_len)
                          for w in words], np.int32)
        return img.astype(np.float32), lab

    eval_words = [te_words[int(i)] for i in te_pick]
    eval_seeds = [args.train_writers + 7 * i for i in range(len(eval_words))]

    img0, lab0 = make_batch(eval_words[:2], eval_seeds[:2], augment=False)
    state = trainer.init_state(img0, lab0, jax.random.key(args.seed))

    eval_fwd = jax.jit(lambda params, stats, img, lab: trainer.rec.apply(
        {"params": params, "batch_stats": stats}, img, lab,
        train=False)[0])

    def eval_cer(state):
        ed_sum, len_sum = 0, 0
        bs = args.batch_size
        for i in range(0, len(eval_words), bs):
            ws = eval_words[i: i + bs]
            ss = eval_seeds[i: i + bs]
            if len(ws) < bs:   # keep one compiled shape
                ws = ws + ws[: bs - len(ws)]
                ss = ss + ss[: bs - len(ss)]
            img, lab = make_batch(ws, ss, augment=False)
            logits = eval_fwd(state["params"], state["stats"],
                              jnp.asarray(img), jnp.asarray(lab))
            pred = jnp.argmax(logits, axis=-1)
            ed, ln = cer_counts(pred, jnp.asarray(lab)[:, 1:])
            ed_sum += int(ed)
            len_sum += int(ln)
        return 100.0 * ed_sum / max(len_sum, 1)

    def train_batches():
        for _ in range(args.steps_per_epoch):
            ws = [tr_words[int(i)] for i in rng.integers(
                len(tr_words), size=args.batch_size)]
            ss = [int(s) for s in rng.integers(
                args.train_writers, size=args.batch_size)]
            img, lab = make_batch(ws, ss, args.augment)
            yield {"image": img, "labels": lab}

    ck = ocp.StandardCheckpointer()
    path = os.path.abspath(os.path.join(args.logdir, "htr_final"))

    def save(state):
        tmp = path + ".new"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        ck.save(tmp, {"params": state["params"], "stats": state["stats"]})
        ck.wait_until_finished()
        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(tmp, path)

    best = float("inf")
    for epoch in range(args.epochs):
        state, m = trainer.train_epoch(
            state, train_batches(), epoch, total_epochs=args.epochs)
        cer_te = eval_cer(state)
        logger.log(epoch, {"loss": m["loss"], "cer_tr": m["cer"],
                           "cer_te": cer_te,
                           "teacher_rate": m["teacher_rate"]}, group="htr")
        if cer_te < best:
            best = cer_te
            save(state)

    print(json.dumps({"htr_floor_cer_te": round(best, 3),
                      "epochs": args.epochs,
                      "eval_words": len(eval_words),
                      "augment": args.augment}))


if __name__ == "__main__":
    main()
