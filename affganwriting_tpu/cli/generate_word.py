"""Batched word generation sweep — the reference's 4-scenario test
(GAN_word/tt.test_single_writer.4_scenarios.py) plus the word ladder
(tt.word_ladder.py), as ONE batched XLA pipeline per writer.

Scenarios = {in-vocab corpus, oov corpus} x {train, test writers}, selected
by flags instead of comment toggles.  Per writer: build the 50-image style
stack (pad by repetition when fewer, :126-133), encode once, decode the
whole corpus in batches, recognize with R in the same program, write
``<wid>-<n>.<GT>-<pred>.png`` files that the FID/CER evaluators consume.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

WORD_LADDER = ["three", "threw", "shrew", "shred", "sired", "sides",
               "sites", "sines", "wines", "vines", "vised", "vised",
               "fires", "hires", "hived", "haven", "seven"]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", default=None, help="checkpoint dir (orbax)")
    p.add_argument("--ckpt-name", default="best")
    p.add_argument("--out", default="runs/generated")
    p.add_argument("--split", choices=["train", "test"], default="test")
    p.add_argument("--corpus", choices=["in_vocab", "oov", "ladder"],
                   default="oov")
    p.add_argument("--writers", nargs="*", default=None)
    p.add_argument("--max-writers", type=int, default=4)
    p.add_argument("--words-per-batch", type=int, default=128)
    p.add_argument("--image-root", default=None)
    p.add_argument("--style-encoder", default="resnet50")
    p.add_argument("--beam", type=int, default=0,
                   help="recognize generated words with beam search of this "
                        "width (the reference's beam 3, modules_tro.py:637);"
                        " 0 = greedy inside the gen+read program")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mesh", default="none",
                   help="DP-shard the gen+read pipeline over a device mesh "
                        "('auto', '8', '4x2' — parallel/mesh.py specs): "
                        "serving scale-out; word batches pad to the "
                        "data-axis multiple and trim after")
    args = p.parse_args(argv)

    import jax

    from affganwriting_tpu.core.checkpoint import CheckpointManager
    from affganwriting_tpu.core.config import VOCAB, default_config
    from affganwriting_tpu.data.iam import (
        default_reference_paths,
        load_corpus,
        parse_groundtruth,
        writer_label_map,
    )
    from affganwriting_tpu.data.words import WordStyleDataset
    from affganwriting_tpu.eval.sheets import _normalize, _save_png
    from affganwriting_tpu.gen.inference import (
        encode_labels,
        make_generate_and_read_fn,
        variables_of,
    )
    from affganwriting_tpu.train.state import init_state

    cfg = default_config().replace(style_encoder=args.style_encoder)
    paths = default_reference_paths()
    gt = parse_groundtruth(
        paths["train_gt" if args.split == "train" else "test_gt"])
    label_map = writer_label_map(gt)
    ds = WordStyleDataset(gt, label_map, cfg, corpus=None,
                          image_root=args.image_root, seed=args.seed)

    if args.corpus == "ladder":
        words = [w for w in WORD_LADDER]
    elif args.corpus == "oov":
        words = load_corpus(paths["oov_corpus"])
    else:
        words = load_corpus(
            os.path.join(os.path.dirname(paths["corpus"]),
                         "in_vocab.subset.tro.37"))
    words = [w for w in words if w and all(c in VOCAB.letters for c in w)]
    words = [w[: cfg.max_chars] for w in words]

    state = init_state(cfg, jax.random.key(args.seed))
    if args.ckpt:
        ck = CheckpointManager(args.ckpt)
        state = ck.restore(args.ckpt_name, state)

    run = make_generate_and_read_fn(cfg)
    mesh = None
    if args.mesh and args.mesh != "none":
        from affganwriting_tpu.parallel.mesh import DATA_AXIS, parse_mesh_spec

        mesh = parse_mesh_spec(args.mesh)
    if mesh is not None:
        from affganwriting_tpu.gen.inference import make_sharded_pipeline

        spipe = make_sharded_pipeline(cfg, mesh)
        n_data = mesh.shape[DATA_AXIS]
        # place weights once globally and the style stack once per writer
        # (spipe() would re-device_put all of them per 128-word chunk);
        # re-placing already-placed trees is a no-op, so passing the
        # cached placed weights back through place() keeps them resident
        _placed: dict = {}

        def run(gen_vars, rec_vars, stack, labels):  # noqa: F811
            if _placed.get("stack_obj") is not stack:
                gv, rv, st = spipe.place(
                    _placed.get("gv", gen_vars),
                    _placed.get("rv", rec_vars), stack)
                _placed.update(gv=gv, rv=rv, st=st, stack_obj=stack)
            b = labels.shape[0]
            pad = (-b) % n_data
            if pad:
                labels = np.concatenate(
                    [labels, np.repeat(labels[:1], pad, axis=0)])
            imgs, preds = spipe.base(
                _placed["gv"], _placed["rv"], _placed["st"],
                spipe.shard_labels(labels))
            return imgs[:b], preds[:b]

    gen_vars = variables_of(state.gen)
    rec_vars = variables_of(state.rec)
    beam_fn = None
    if args.beam > 0:
        import jax as _jax

        from affganwriting_tpu.train.state import build_recognizer

        rec = build_recognizer(cfg)
        beam_fn = _jax.jit(lambda v, im: rec.apply(
            v, im, beam_size=args.beam, method=rec.beam_search))

    writers = args.writers or list(gt.keys())[: args.max_writers]
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    total = 0
    for wid in writers:
        # 50-image style stack, padded by repetition
        entries = gt[wid][:]
        rng.shuffle(entries)
        while len(entries) < cfg.style_stack:
            entries = entries + entries[: cfg.style_stack - len(entries)]
        stack = np.stack(
            [ds._read(e, label_map[wid]) for e in entries[: cfg.style_stack]],
            axis=-1,
        )[None].astype(np.float32)

        for start in range(0, len(words), args.words_per_batch):
            chunk = words[start: start + args.words_per_batch]
            labels = encode_labels(chunk, cfg.output_max_len)
            imgs, pred_ids = run(gen_vars, rec_vars, stack, labels)
            imgs = np.asarray(imgs)
            if beam_fn is not None:
                pred_ids, _ = beam_fn(rec_vars, imgs)
            pred_ids = np.asarray(pred_ids)
            for i, w in enumerate(chunk):
                pred = VOCAB.decode(pred_ids[i]) or "x"
                name = f"{wid}-{start + i}.{w}-{pred}.png"
                _save_png(os.path.join(args.out, name),
                          _normalize(imgs[i, :, :, 0]))
                total += 1
    print(f"wrote {total} images to {args.out}")


if __name__ == "__main__":
    main()
