"""Build a style library pickle: the get_styles.py surface.

``python -m affganwriting_tpu.cli.get_styles --out styles.pkl`` runs the
style extractor over a split and writes {styles, authors, ids}; add
``--eval-writer-id`` to also report top-1/5/20 writer retrieval
(line_generation/get_styles.py:19-140 + eval_writer_id.py:15-91).
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="styles.pkl")
    p.add_argument("--n-authors", type=int, default=8)
    p.add_argument("--a-batch-size", type=int, default=2)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval-writer-id", action="store_true")
    args = p.parse_args(argv)

    import jax

    from affganwriting_tpu.data.lines import LineCharset, LineDataset
    from affganwriting_tpu.gen.line_inference import (
        extract_styles,
        writer_retrieval,
    )
    from affganwriting_tpu.train.line_trainer import LineGanTrainer

    charset = LineCharset()
    authors = [f"a{i:03d}" for i in range(args.n_authors)]
    ds = LineDataset(charset, authors=authors,
                     a_batch_size=args.a_batch_size, width=args.width,
                     seed=args.seed)
    trainer = LineGanTrainer(n_class=charset.n_class, max_gen_length=64)
    first = next(ds.batches(batch_authors=2))
    state = trainer.init_state(first, jax.random.key(args.seed))
    library = extract_styles(trainer, state, ds.batches(batch_authors=2))
    library.save(args.out)
    print(f"wrote {len(library.styles)} styles "
          f"({len(library.by_author)} authors) to {args.out}")
    if args.eval_writer_id:
        print(json.dumps(writer_retrieval(library)))


if __name__ == "__main__":
    main()
