"""The four-player train step as ONE compiled XLA program.

The reference runs four separate forward/backward passes per batch with
four ``optimizer.step()`` calls and re-uploads the batch to the device each
time (GAN_word/main_runold.py:122-137, network_tro.py:30-36).  Here the whole
R -> C -> D -> G update is a single jit'd function: four ``jax.grad`` calls
over disjoint parameter subsets, four optax updates, batch resident in HBM
once.  Under a ('data', 'model') mesh the batch is sharded over 'data' and
XLA inserts the gradient psums (SURVEY.md §5.8) — the semantics match the
reference's single-GPU step in expectation.

Update ordering matches the reference: each later phase sees the params the
earlier phases just wrote (R first, then C, then D, then G against the
freshly updated D/C/R).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from affganwriting_tpu.core.config import WordGanConfig
from affganwriting_tpu.train import losses
from affganwriting_tpu.train.state import (
    PlayerState,
    WordGanState,
    build_models,
    make_optimizers,
)


def make_train_step(config: WordGanConfig):
    gen, dis, cla, rec = build_models(config)
    opts = make_optimizers(config)

    def gen_forward(gen_params, gen_stats, labels, style, *, mutable):
        variables = {"params": gen_params, "batch_stats": gen_stats}
        return gen.apply(
            variables, style, labels, train=True,
            mutable=["batch_stats"] if mutable else False,
        )

    def train_step(state: WordGanState, batch: dict[str, Any], rng: jax.Array):
        style = batch["style_imgs"]          # (B, 64, 216, 50)
        img_ch0 = style[..., 0:1]
        img_ch1 = style[..., 1:2]
        writer_ids = batch["writer_ids"]     # (B,)
        labels_ch0 = batch["label_ch0"]      # (B, T)
        label_xt = batch["label_xt"]
        label_xt_swap = batch["label_xt_swap"]
        rng_rec, rng_gen = jax.random.split(rng)

        metrics = {}

        # ---- phase 1: recognizer on the real channel-0 image ------------
        def rec_loss_fn(rec_params):
            (logits, _), updates = rec.apply(
                {"params": rec_params, "batch_stats": state.rec.stats},
                img_ch0, labels_ch0, train=True,
                rngs={"dropout": rng_rec},
                mutable=["batch_stats"],
            )
            loss = losses.rec_loss(logits, labels_ch0, config.label_smoothing)
            return loss, (updates.get("batch_stats", {}), logits)

        if config.rec_frozen:
            # frozen R (e.g. the TrOCR drop-in keeps TrOCR weights fixed,
            # reference trocr_recognizer.py:119-121): forward for metrics
            # only, no grads / no update
            l_rec_tr, (rec_stats, rec_logits_tr) = rec_loss_fn(
                state.rec.params)
            rec_params, rec_opt = state.rec.params, state.rec.opt_state
        else:
            (l_rec_tr, (rec_stats, rec_logits_tr)), rec_grads = (
                jax.value_and_grad(rec_loss_fn, has_aux=True)(
                    state.rec.params))
            rec_upd, rec_opt = opts["rec"].update(
                rec_grads, state.rec.opt_state, state.rec.params)
            rec_params = jax.tree.map(
                lambda p, u: p + u, state.rec.params, rec_upd)
        metrics["l_rec_tr"] = l_rec_tr

        # ---- phase 2: writer classifier on the real image ---------------
        def cla_loss_fn(cla_params):
            logits = cla.apply({"params": cla_params}, img_ch0, train=True)
            return losses.writer_ce_loss(logits, writer_ids)

        l_cla_tr, cla_grads = jax.value_and_grad(cla_loss_fn)(state.cla.params)
        cla_upd, cla_opt = opts["cla"].update(
            cla_grads, state.cla.opt_state, state.cla.params)
        cla_params = jax.tree.map(
            lambda p, u: p + u, state.cla.params, cla_upd)
        metrics["l_cla_tr"] = l_cla_tr

        # ---- generate fakes once for the D phase (no grad through G) ----
        (xg_sg, xg_swap_sg) = jax.lax.stop_gradient(_generate_pair(
            gen, state.gen.params, state.gen.stats, style,
            label_xt, label_xt_swap))

        # ---- phase 3: discriminator --------------------------------------
        def dis_loss_fn(dis_params):
            def d(x):
                return dis.apply({"params": dis_params}, x, train=True)
            l_real = 0.5 * (losses.dis_real_loss(d(img_ch0))
                            + losses.dis_real_loss(d(img_ch1)))
            l_fake = 0.5 * (losses.dis_fake_loss(d(xg_sg))
                            + losses.dis_fake_loss(d(xg_swap_sg)))
            return l_real + l_fake

        l_dis_tr, dis_grads = jax.value_and_grad(dis_loss_fn)(state.dis.params)
        dis_upd, dis_opt = opts["dis"].update(
            dis_grads, state.dis.opt_state, state.dis.params)
        dis_params = jax.tree.map(
            lambda p, u: p + u, state.dis.params, dis_upd)
        metrics["l_dis_tr"] = l_dis_tr

        # ---- phase 4: generator (adv + writer + recognition) ------------
        def gen_loss_fn(gen_params):
            (xg, xg_swap), updates = _generate_pair(
                gen, gen_params, state.gen.stats, style,
                label_xt, label_xt_swap, mutable=True)

            def d(x):
                return dis.apply({"params": dis_params}, x, train=True)

            def c(x):
                return cla.apply({"params": cla_params}, x, train=True)

            def r(x, lab, key):
                # train-mode forward; stat updates discarded (R's running
                # averages advance only in its own phase).  Grads flow to
                # the image (hence to G) but R's params see stop_gradient
                # here — they are not the differentiated argument.
                (logits, _), _ = rec.apply(
                    {"params": rec_params, "batch_stats": rec_stats},
                    x, lab, train=True, rngs={"dropout": key},
                    mutable=["batch_stats"],
                )
                return logits

            l_dis = 0.5 * (losses.gen_adv_loss(d(xg))
                           + losses.gen_adv_loss(d(xg_swap)))
            l_cla = 0.5 * (losses.writer_ce_loss(c(xg), writer_ids)
                           + losses.writer_ce_loss(c(xg_swap), writer_ids))
            if config.oov:
                l_l1 = jnp.zeros((), jnp.float32)
            else:
                l_l1 = losses.recon_l1(xg, batch["img_xt"])
            k1, k2 = jax.random.split(rng_gen)
            logits_xt = r(xg, label_xt, k1)
            logits_swap = r(xg_swap, label_xt_swap, k2)
            l_rec = 0.5 * (
                losses.rec_loss(logits_xt, label_xt, config.label_smoothing)
                + losses.rec_loss(
                    logits_swap, label_xt_swap, config.label_smoothing))
            total = (config.w_dis * l_dis + config.w_cla * l_cla
                     + config.w_l1 * l_l1 + config.w_rec * l_rec)
            aux = {
                "l_dis": l_dis, "l_cla": l_cla, "l_l1": l_l1,
                "l_rec": l_rec, "l_total": total,
                "gen_stats": updates["batch_stats"],
                "logits_xt": logits_xt,
                "logits_swap": logits_swap,
                "xg": xg,
            }
            return total, aux

        (_, aux), gen_grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(state.gen.params)
        gen_upd, gen_opt = opts["gen"].update(
            gen_grads, state.gen.opt_state, state.gen.params)
        gen_params = jax.tree.map(
            lambda p, u: p + u, state.gen.params, gen_upd)
        gen_stats = aux.pop("gen_stats")
        logits_xt = aux.pop("logits_xt")
        logits_swap = aux.pop("logits_swap")
        xg = aux.pop("xg")
        metrics.update(aux)

        new_state = WordGanState(
            step=state.step + 1,
            gen=PlayerState(gen_params, gen_stats, gen_opt),
            dis=PlayerState(dis_params, state.dis.stats, dis_opt),
            cla=PlayerState(cla_params, state.cla.stats, cla_opt),
            rec=PlayerState(rec_params, rec_stats, rec_opt),
        )
        extras = {
            "rec_logits_tr": rec_logits_tr,
            "logits_xt": logits_xt,
            "logits_swap": logits_swap,
            "xg": xg,
        }
        return new_state, metrics, extras

    return train_step


def _generate_pair(gen, gen_params, gen_stats, style, label_xt,
                   label_xt_swap, mutable: bool = False):
    """Encode the style stack once, decode both target words
    (network_tro.py:60-74: xg and xg_swap share the style pyramid)."""
    variables = {"params": gen_params, "batch_stats": gen_stats}

    def fwd(v):
        pyramid = gen.apply(v, style, train=True, method=gen.encode_style)
        xg = gen.apply(v, pyramid, label_xt, train=True, method=gen.generate)
        xg_swap = gen.apply(
            v, pyramid, label_xt_swap, train=True, method=gen.generate)
        return xg, xg_swap

    if not mutable:
        # run in train mode but discard stat updates (the reference's
        # no-grad G forward in dis_update also touches BN stats; we keep
        # stat updates in the gen phase only)
        out, _ = gen.apply(
            variables, style, label_xt, label_xt_swap, train=True,
            method=_pair_method, mutable=["batch_stats"])
        return out
    return gen.apply(
        variables, style, label_xt, label_xt_swap, train=True,
        method=_pair_method, mutable=["batch_stats"])


def _pair_method(gen, style, label_xt, label_xt_swap, *, train: bool = True):
    pyramid = gen.encode_style(style, train=train)
    xg = gen.generate(pyramid, label_xt, train=train)
    xg_swap = gen.generate(pyramid, label_xt_swap, train=train)
    return xg, xg_swap
