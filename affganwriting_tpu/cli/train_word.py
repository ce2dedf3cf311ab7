"""Train the word-level AFFGAN: ``python -m affganwriting_tpu.cli.train_word``.

Mirrors the reference entry point (``python main_runold.py <start_epoch>``,
GAN_word/run_train_scratch.sh) with a real flag surface instead of module
constants.  Without ``--image-root`` the pipeline runs on deterministic
synthetic word images (useful for smoke/perf work; the reference's zero-image
fallback shows synthetic data flows through the model fine, SURVEY.md §4).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--epochs", type=int, default=5000)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--style-encoder", default="resnet50")
    p.add_argument("--recognizer", default="seq2seq",
                   choices=("seq2seq", "trocr"),
                   help="R: project seq2seq or the TrOCR drop-in "
                        "(reference main_runtransformer.py)")
    p.add_argument("--trocr-preset", default=None, choices=("tiny", "base"),
                   help="arch preset; default tiny, forced to base when "
                        "--trocr-ckpt is given (checkpoint dims are base)")
    p.add_argument("--trocr-ckpt", default=None,
                   help="local HF trocr checkpoint dir to import weights")
    p.add_argument("--oov", action="store_true", default=True)
    p.add_argument("--no-oov", dest="oov", action="store_false")
    p.add_argument("--image-root", default=None,
                   help="IAM word images dir (<img_id>.png); synthetic if unset")
    p.add_argument("--logdir", default="runs/word_gan")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval-every", type=int, default=20)
    p.add_argument("--save-every", type=int, default=100)
    p.add_argument("--patience", type=int, default=20)
    p.add_argument("--compute-dtype", default="bfloat16")
    p.add_argument("--no-merge-dg", dest="merge_dg", action="store_false",
                   default=True,
                   help="run the D and G phases as separate programs "
                        "instead of the fused vjp-shared default "
                        "(train/step.py merge_dg)")
    p.add_argument("--rec-plateau", action="store_true",
                   help="ReduceLROnPlateau on R's lr (main_run.py:279)")
    p.add_argument("--max-writers", type=int, default=None,
                   help="restrict to N writers (debug)")
    p.add_argument("--mesh", default="none",
                   help="device mesh: 'none' (single chip), 'auto' (all "
                        "chips on 'data'), 'N' (N-way DP) or 'NxM' "
                        "(DP x tensor-parallel)")
    p.add_argument("--restart-rss-gb", type=float, default=48.0,
                   help="host-RSS watchdog: save latest + re-exec (resume) "
                        "past this RSS — the tunneled runtime leaks every "
                        "transfer's host mirror (utils/memwatch.py); 0 "
                        "disables")
    args = p.parse_args(argv)

    from affganwriting_tpu.core.cache import enable_compile_cache

    enable_compile_cache()
    from affganwriting_tpu.core.config import default_config
    from affganwriting_tpu.data.iam import (
        default_reference_paths,
        load_corpus,
        parse_groundtruth,
        writer_label_map,
    )
    from affganwriting_tpu.data.words import WordStyleDataset
    from affganwriting_tpu.train.loop import WordGanTrainer

    # Pretrained-TrOCR import happens BEFORE the trainer exists: the real
    # tokenizer's char->token table must reach the recognizer the train
    # step is built with (reference trocr_recognizer.py:143-160), and the
    # checkpoint's dims are base — a tiny arch would swap in a mismatched
    # param tree that only errors at first apply.
    trocr_params = None
    trocr_map_vec: tuple = ()
    trocr_valid_mask: tuple = ()
    trocr_preset = args.trocr_preset or "tiny"
    if args.trocr_ckpt:
        if args.recognizer != "trocr":
            raise SystemExit(
                "--trocr-ckpt requires --recognizer trocr: the loaded "
                f"param tree cannot drive a '{args.recognizer}' recognizer")
        if args.trocr_preset == "tiny":
            raise SystemExit(
                "--trocr-ckpt holds base-handwritten dims; it cannot load "
                "into --trocr-preset tiny")
        trocr_preset = "base"
        from affganwriting_tpu.models.recognizer.trocr import load_pretrained

        loaded = load_pretrained(args.trocr_ckpt)
        if loaded is None:
            raise SystemExit(
                f"--trocr-ckpt {args.trocr_ckpt}: not a readable local HF "
                "checkpoint directory")
        trocr_params, mv, vm = loaded
        trocr_map_vec = tuple(int(x) for x in mv)
        trocr_valid_mask = tuple(bool(x) for x in vm)

    cfg = default_config().replace(
        batch_size=args.batch_size,
        style_encoder=args.style_encoder,
        oov=args.oov,
        compute_dtype=args.compute_dtype,
        recognizer=args.recognizer,
        # the TrOCR drop-in stays frozen (grads reach G only), matching
        # the reference's intent (trocr_recognizer.py:119-121)
        rec_frozen=args.recognizer == "trocr",
        trocr_preset=trocr_preset,
        trocr_map_vec=trocr_map_vec,
        trocr_valid_mask=trocr_valid_mask,
        merge_dg=args.merge_dg,
    )
    paths = default_reference_paths()
    tr = parse_groundtruth(paths["train_gt"])
    te = parse_groundtruth(paths["test_gt"])
    if args.max_writers:
        tr = dict(list(tr.items())[: args.max_writers])
        te = dict(list(te.items())[: args.max_writers])
    corpus = load_corpus(paths["corpus"])

    train_ds = WordStyleDataset(
        tr, writer_label_map(tr), cfg, corpus=corpus,
        image_root=args.image_root, seed=args.seed)
    test_ds = WordStyleDataset(
        te, writer_label_map(te), cfg, corpus=corpus,
        image_root=args.image_root, seed=args.seed + 1)

    from affganwriting_tpu.parallel.mesh import parse_mesh_spec

    mesh = parse_mesh_spec(args.mesh)
    if mesh is not None:
        print(f"mesh: {dict(mesh.shape)} over {mesh.devices.size} devices")
    trainer = WordGanTrainer(
        cfg, train_ds, test_ds, logdir=args.logdir, seed=args.seed,
        eval_every=args.eval_every, save_every=args.save_every,
        patience=args.patience, rec_plateau=args.rec_plateau, mesh=mesh,
        restart_rss_gb=args.restart_rss_gb)
    if trocr_params is not None:
        trainer.state = trainer.state.replace(
            rec=trainer.state.rec.replace(params={"core": trocr_params}))
    trainer.fit(args.epochs)


if __name__ == "__main__":
    main()
