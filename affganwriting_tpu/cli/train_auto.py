"""Pretrain the perceptual autoencoder (the reference's AutoTrainer run).

line_generation pretrains the '2tight' Autoencoder with L1 reconstruction
plus CTC through the E_HWR head on its bottleneck (trainer/auto_trainer.py
+ configs/cf_IAM_auto_2tight_newCTC.json: lr 2e-4 betas (0.5, 0.999),
batch 8, loss_weights auto=1 recog=1, model {type: 2tight, hwr: 80}); the
GAN trainer then freezes the trained *encoder* as its perceptual-loss
feature space (hw_with_style_trainer.py:139-149, 735-758).  This CLI is
that stage over line batches (synthetic unless --image-root):

    python -m affganwriting_tpu.cli.train_auto --iterations 6000

The swap-saved ``ae_final`` checkpoint feeds ``cli.train_line
--pretrained-ae``.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--iterations", type=int, default=60_000,
                   help="reference recipe trains 60k (trainer.iterations)")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--variant", default="2tight")
    p.add_argument("--ctc-weight", type=float, default=1.0,
                   help="the 'newCTC' E_HWR regularizer weight "
                        "(loss_weights.recog); 0 trains pure-L1")
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--logdir", default="runs/auto")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--save-every", type=int, default=2000,
                   help="refresh ae_final every N iterations; 0 = end only")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from affganwriting_tpu.core.cache import enable_compile_cache

    enable_compile_cache()
    import os
    import shutil

    import orbax.checkpoint as ocp

    from affganwriting_tpu.data.lines import LineCharset, LineDataset
    from affganwriting_tpu.train.auto_trainer import AutoTrainer
    from affganwriting_tpu.utils.logging import MetricsLogger

    charset = LineCharset()
    ds = LineDataset(charset, a_batch_size=1, width=args.width,
                     seed=args.seed)
    trainer = AutoTrainer(lr=args.lr, seed=args.seed,
                          ctc_weight=args.ctc_weight,
                          n_class=charset.n_class, variant=args.variant)
    logger = MetricsLogger(args.logdir)

    first = next(ds.batches(batch_authors=args.batch_size))
    state = trainer.init_state(first["image"], jax.random.key(args.seed))

    ck = ocp.StandardCheckpointer()
    path = os.path.abspath(os.path.join(args.logdir, "ae_final"))

    def save(params):
        # swap-write: never leave a half-written ae_final
        tmp = path + ".new"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        ck.save(tmp, {"params": params})
        ck.wait_until_finished()
        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(tmp, path)

    def stream():
        epoch = 0
        while True:
            yield from ds.batches(args.batch_size, epoch=epoch)
            epoch += 1

    it = 0
    for batch in stream():
        if it >= args.iterations:
            break
        state, loss, l1 = trainer._step(
            state, jnp.asarray(batch["image"]),
            jnp.asarray(batch["label"]),
            jnp.asarray(batch["label_lengths"]))
        if it % args.log_every == 0:
            logger.log(it, {"ae_loss": float(loss), "ae_l1": float(l1)},
                       group="auto")
        it += 1
        if args.save_every and it % args.save_every == 0:
            save(state["params"])

    save(state["params"])
    print(f"saved {path}")


if __name__ == "__main__":
    main()
