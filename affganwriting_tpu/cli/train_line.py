"""Train the line-level GAN: ``python -m affganwriting_tpu.cli.train_line``.

Mirrors line_generation/train.py (``python train.py -c config.json``) with a
flag surface over the active config's settings; the curriculum is the
reference's count/gen/auto/disc rotation (configs/cf_IAMslant_...sMG.json).
Synthetic line data is used when no image root is given.

Runtime (reference base/base_trainer.py): latest checkpoint every
``--save-latest-every`` iterations, periodic keeps every ``--save-every``,
validation with monitor-best every ``--val-every``, SWA past
``--swa-start``, full resume (model + both optimizers + iteration + SWA)
from the latest checkpoint unless ``--no-resume``.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default=None,
                   help="cf_<name>.json recipe (core/line_config.py: the "
                        "reference's `python train.py -c config.json` "
                        "surface); its model/trainer/optimizer keys "
                        "override the flag defaults")
    p.add_argument("-a", dest="overrides", action="append", default=[],
                   metavar="KEY.PATH=VALUE",
                   help="dotted-path config override (generate.py:116-138)")
    p.add_argument("--iterations", type=int, default=240_000)
    p.add_argument("--batch-authors", type=int, default=2)
    p.add_argument("--a-batch-size", type=int, default=2)
    p.add_argument("--max-gen-length", type=int, default=500)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--logdir", default="runs/line_gan")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--xml-root", default=None,
                   help="IAM form-XML dir; enables the real line data path "
                        "(parseIAM semantics)")
    p.add_argument("--image-root", default=None,
                   help="IAM form images dir (<form>.png); synthetic "
                        "fallback per line when absent")
    p.add_argument("--split", default="train",
                   choices=("train", "valid", "test"))
    p.add_argument("--mesh", default="none",
                   help="device mesh: 'none', 'auto', 'N' (N-way DP); the "
                        "effective batch (batch-authors x a-batch-size) "
                        "must divide by N")
    p.add_argument("--save-every", type=int, default=2000,
                   help="periodic checkpoint cadence (save_step)")
    p.add_argument("--save-latest-every", type=int, default=250,
                   help="latest-checkpoint cadence (save_step_minor: a "
                        "crash loses at most this many iterations)")
    p.add_argument("--val-every", type=int, default=1000,
                   help="validation cadence (val_step); 0 disables")
    p.add_argument("--val-batches", type=int, default=4)
    p.add_argument("--swa-start", type=int, default=None,
                   help="iteration to start SWA weight averaging")
    p.add_argument("--no-resume", dest="resume", action="store_false",
                   default=True,
                   help="ignore an existing latest checkpoint")
    p.add_argument("--sheet-every", type=int, default=2000,
                   help="periodic real|recon|gen image-sheet cadence "
                        "(reference print_images); 0 disables")
    p.add_argument("--restart-rss-gb", type=float, default=48.0,
                   help="host-RSS watchdog: save latest + re-exec (resume) "
                        "past this RSS — the tunneled runtime leaks every "
                        "transfer's host mirror (utils/memwatch.py); 0 "
                        "disables")
    p.add_argument("--pretrained-hwr", default=None,
                   help="path to a cli/train_hwr.py 'hwr_final' checkpoint "
                        "to load (frozen) into the recognizer slot — the "
                        "reference's model.pretrained_hwr + hwr_frozen "
                        "(hw_with_style.py:182-194)")
    p.add_argument("--char-style-dim", type=int, default=0,
                   help="per-character private style size; > 0 selects the "
                        "multi-style extractor (char_style.py:210-310)")
    p.add_argument("--pretrained-ae", default=None,
                   help="path to a cli/train_auto.py 'ae_final' checkpoint "
                        "to load (frozen) into the perceptual-AE slot — "
                        "the reference's trainer encoder_weights "
                        "(hw_with_style_trainer.py:139-149)")
    args = p.parse_args(argv)

    if args.config:
        from affganwriting_tpu.core.line_config import load_config

        cf = load_config(args.config, args.overrides)
        m = cf.get("model", {})
        t = cf.get("trainer", {})
        d = cf.get("data_loader", {})
        args.char_style_dim = m.get("char_style_dim", args.char_style_dim)
        args.max_gen_length = m.get("max_gen_length", args.max_gen_length)
        args.pretrained_hwr = m.get("pretrained_hwr", args.pretrained_hwr)
        args.iterations = t.get("iterations", args.iterations)
        args.swa_start = t.get("swa_start", args.swa_start)
        args.val_every = t.get("val_step", args.val_every)
        args.save_every = t.get("save_step", args.save_every)
        args.save_latest_every = t.get(
            "save_step_minor", args.save_latest_every)
        args.pretrained_ae = t.get("encoder_weights", args.pretrained_ae)
        args.lr = cf.get("optimizer", {}).get("lr", args.lr)
        args.batch_authors = d.get("batch_size", args.batch_authors)
        args.a_batch_size = d.get("a_batch_size", args.a_batch_size)

    import jax

    from affganwriting_tpu.core.cache import enable_compile_cache

    enable_compile_cache()
    from affganwriting_tpu.core.checkpoint import (
        LineCheckpointManager,
        restore_line_trainer,
    )
    from affganwriting_tpu.data.lines import LineCharset, LineDataset
    from affganwriting_tpu.parallel.mesh import parse_mesh_spec
    from affganwriting_tpu.train.line_trainer import LineGanTrainer
    from affganwriting_tpu.utils.logging import MetricsLogger

    charset = LineCharset()

    def make_dataset(split: str, seed: int):
        if args.xml_root:
            from affganwriting_tpu.data.parse_iam import (
                AuthorLineDataset,
                AuthorLinesIndex,
            )

            index = AuthorLinesIndex(args.xml_root, split=split)
            return AuthorLineDataset(
                index, args.image_root or args.xml_root, charset,
                a_batch_size=args.a_batch_size, seed=seed)
        return LineDataset(charset, a_batch_size=args.a_batch_size,
                           width=args.width, seed=seed)

    ds = make_dataset(args.split, args.seed)
    val_ds = make_dataset("valid" if args.xml_root else args.split,
                          args.seed + 1)

    mesh = parse_mesh_spec(args.mesh)
    if mesh is not None:
        print(f"mesh: {dict(mesh.shape)} over {mesh.devices.size} devices")

    ckpt_dir = f"{args.logdir}/ckpt"
    ckpt = LineCheckpointManager(ckpt_dir)
    first = next(ds.batches(batch_authors=args.batch_authors))
    swa_state = None
    start_iteration = None
    if args.resume and ckpt.latest_exists():
        trainer, payload = restore_line_trainer(
            ckpt_dir, first, name="latest", mesh=mesh)
        state = payload["state"]
        swa_state = payload["swa"]
        if int(swa_state["count"]) == 0:
            swa_state = None   # placeholder slot, SWA never started
        start_iteration = int(payload["iteration"])
        print(f"resumed from latest at iteration {start_iteration}")
    else:
        trainer = LineGanTrainer(
            n_class=charset.n_class, max_gen_length=args.max_gen_length,
            lr=args.lr, seed=args.seed, iterations=args.iterations,
            mesh=mesh, pretrained_hwr=args.pretrained_hwr,
            pretrained_ae=args.pretrained_ae,
            char_style_dim=args.char_style_dim)
        state = trainer.init_state(first, jax.random.key(args.seed))
    logger = MetricsLogger(args.logdir)

    def stream():
        epoch = 0
        while True:
            yield from ds.batches(args.batch_authors, epoch=epoch)
            epoch += 1

    def val_batches():
        return val_ds.batches(args.batch_authors, epoch=0, )

    trainer.fit(
        state, stream(), args.iterations, logger=logger, ckpt=ckpt,
        save_every=args.save_every,
        save_latest_every=args.save_latest_every,
        val_batches_fn=val_batches if args.val_every else None,
        val_every=args.val_every, val_max_batches=args.val_batches,
        swa_start=args.swa_start, swa_state=swa_state,
        start_iteration=start_iteration,
        sheet_every=args.sheet_every,
        sheet_dir=f"{args.logdir}/sheets",
        restart_rss_gb=args.restart_rss_gb)


if __name__ == "__main__":
    main()
