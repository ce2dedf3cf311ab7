"""Pretrain the line CTC recognizer (the reference's run_hwr path).

line_generation pretrains a CNNOnly/CRNN recognizer with CTC alone
(hw_with_style_trainer.py:503-520, config cf_IAM_hwr_cnnOnly_batchnorm_aug)
and freezes it for GAN training.  This CLI does the same over line batches
(synthetic unless --image-root):

    python -m affganwriting_tpu.cli.train_hwr --iterations 1000
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--iterations", type=int, default=100_000)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--arch", choices=["cnn_only", "crnn"], default="cnn_only")
    p.add_argument("--norm", default="batch")
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--logdir", default="runs/hwr")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-every", type=int, default=25)
    p.add_argument("--save-every", type=int, default=2000,
                   help="refresh hwr_final every N iterations (a crash "
                        "then loses at most N iterations); 0 = end only")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from affganwriting_tpu.core.cache import enable_compile_cache

    enable_compile_cache()
    from affganwriting_tpu.data.lines import LineCharset, LineDataset
    from affganwriting_tpu.models.line.hwr import CNNOnlyHWR, CRNN
    from affganwriting_tpu.train.line_trainer import ctc_loss
    from affganwriting_tpu.utils.logging import MetricsLogger

    charset = LineCharset()
    model_cls = CNNOnlyHWR if args.arch == "cnn_only" else CRNN
    model = model_cls(nclass=charset.n_class, norm=args.norm)
    ds = LineDataset(charset, a_batch_size=1, width=args.width,
                     seed=args.seed)
    opt = optax.adam(args.lr)
    logger = MetricsLogger(args.logdir)

    first = next(ds.batches(batch_authors=args.batch_size))
    img0 = jnp.asarray(first["image"])
    variables = jax.jit(model.init)(jax.random.key(args.seed), img0)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    opt_state = opt.init(params)

    @jax.jit
    def step(params, stats, opt_state, img, labels, lengths, rng):
        def loss_fn(params):
            out = model.apply(
                {"params": params, "batch_stats": stats}, img, train=True,
                mutable=["batch_stats"], rngs={"dropout": rng})
            logp, upd = out
            return ctc_loss(logp, labels, lengths), upd["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = opt.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, new_stats, new_opt, loss

    def stream():
        epoch = 0
        while True:
            yield from ds.batches(args.batch_size, epoch=epoch)
            epoch += 1

    import os
    import shutil

    import orbax.checkpoint as ocp

    ck = ocp.StandardCheckpointer()
    path = os.path.abspath(os.path.join(args.logdir, "hwr_final"))

    def save(params, stats):
        # swap-write: never leave a half-written hwr_final
        tmp = path + ".new"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        ck.save(tmp, {"params": params, "batch_stats": stats})
        ck.wait_until_finished()
        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(tmp, path)

    rng = jax.random.key(args.seed)
    it = 0
    for batch in stream():
        if it >= args.iterations:
            break
        rng, key = jax.random.split(rng)
        params, stats, opt_state, loss = step(
            params, stats, opt_state, jnp.asarray(batch["image"]),
            jnp.asarray(batch["label"]),
            jnp.asarray(batch["label_lengths"]), key)
        if it % args.log_every == 0:
            logger.log(it, {"ctc": float(loss)}, group="hwr")
        it += 1
        if args.save_every and it % args.save_every == 0:
            save(params, stats)

    save(params, stats)
    print(f"saved {path}")


if __name__ == "__main__":
    main()
