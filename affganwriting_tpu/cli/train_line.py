"""Train the line-level GAN: ``python -m affganwriting_tpu.cli.train_line``.

Mirrors line_generation/train.py (``python train.py -c config.json``) with a
flag surface over the active config's settings; the curriculum is the
reference's count/gen/auto/disc rotation (configs/cf_IAMslant_...sMG.json).
Synthetic line data is used when no image root is given.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
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
    args = p.parse_args(argv)

    import jax

    from affganwriting_tpu.data.lines import LineCharset, LineDataset
    from affganwriting_tpu.train.line_trainer import LineGanTrainer
    from affganwriting_tpu.utils.logging import MetricsLogger

    charset = LineCharset()
    if args.xml_root:
        from affganwriting_tpu.data.parse_iam import (
            AuthorLineDataset,
            AuthorLinesIndex,
        )

        index = AuthorLinesIndex(args.xml_root, split=args.split)
        ds = AuthorLineDataset(
            index, args.image_root or args.xml_root, charset,
            a_batch_size=args.a_batch_size, seed=args.seed)
    else:
        ds = LineDataset(charset, a_batch_size=args.a_batch_size,
                         width=args.width, seed=args.seed)
    trainer = LineGanTrainer(
        n_class=charset.n_class, max_gen_length=args.max_gen_length,
        lr=args.lr, seed=args.seed)
    first = next(ds.batches(batch_authors=args.batch_authors))
    state = trainer.init_state(first, jax.random.key(args.seed))
    logger = MetricsLogger(args.logdir)

    def stream():
        epoch = 0
        while True:
            yield from ds.batches(args.batch_authors, epoch=epoch)
            epoch += 1

    trainer.fit(state, stream(), args.iterations, logger=logger)


if __name__ == "__main__":
    main()
