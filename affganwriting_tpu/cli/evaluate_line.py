"""Dataset-wide line evaluation: ``python -m affganwriting_tpu.cli.evaluate_line``.

The reference's ``new_eval.py`` surface (new_eval.py:29-45 +
evaluators/hwdataset_eval.py): one command over a split computes
reconstruction L1, recognizer CER/WER on real lines, CER on generated
lines (legibility), and writer-retrieval accuracy from the extracted style
vectors — printed as one JSON object and optionally written to a file.
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", default=None,
                   help="line checkpoint dir; random-init model if absent "
                        "(useful only for smoke runs)")
    p.add_argument("--ckpt-name", default="best",
                   choices=("latest", "best"))
    p.add_argument("--xml-root", default=None,
                   help="IAM form-XML dir (real data path); synthetic "
                        "lines when absent")
    p.add_argument("--image-root", default=None)
    p.add_argument("--split", default="valid",
                   choices=("train", "valid", "test"))
    p.add_argument("--batch-authors", type=int, default=2)
    p.add_argument("--a-batch-size", type=int, default=2)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--max-batches", type=int, default=8)
    p.add_argument("--out", default=None, help="write the JSON here too")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import itertools

    import jax

    from affganwriting_tpu.core.cache import enable_compile_cache

    enable_compile_cache()

    from affganwriting_tpu.data.lines import LineCharset, LineDataset
    from affganwriting_tpu.eval.line_eval import evaluate_lines
    from affganwriting_tpu.train.line_trainer import LineGanTrainer

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

    batches = ds.batches(batch_authors=args.batch_authors, epoch=0)
    if args.ckpt:
        from affganwriting_tpu.core.checkpoint import restore_line_trainer

        first = next(ds.batches(batch_authors=args.batch_authors))
        trainer, payload = restore_line_trainer(
            args.ckpt, first, name=args.ckpt_name)
        state = payload["state"]
        print(f"restored {args.ckpt_name} "
              f"(iteration {int(payload['iteration'])})")
    else:
        trainer = LineGanTrainer(n_class=charset.n_class,
                                 max_gen_length=64, seed=args.seed)
        first = next(ds.batches(batch_authors=args.batch_authors))
        state = trainer.init_state(first, jax.random.key(args.seed))

    out = evaluate_lines(
        trainer, state,
        itertools.islice(batches, args.max_batches), charset,
        max_batches=args.max_batches)
    line = json.dumps(out, indent=2, sort_keys=True)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line)


if __name__ == "__main__":
    main()
