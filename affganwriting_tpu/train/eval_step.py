"""Jit'd evaluation step (the reference's 'eval' mode, network_tro.py:140-177).

Generates both target words from the style stack in eval mode (running BN
averages, no dropout), scores them with D / C / R, and returns the losses
plus greedy recognizer predictions for the CER accumulators.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from affganwriting_tpu.core.config import WordGanConfig
from affganwriting_tpu.train import losses
from affganwriting_tpu.train.state import WordGanState, build_models


def make_eval_step(config: WordGanConfig):
    gen, dis, cla, rec = build_models(config)

    @jax.jit
    def eval_step(state: WordGanState, batch):
        gv = {"params": state.gen.params, "batch_stats": state.gen.stats}
        rv = {"params": state.rec.params, "batch_stats": state.rec.stats}
        style = batch["style_imgs"]
        label_xt = batch["label_xt"]
        label_swap = batch["label_xt_swap"]

        pyramid = gen.apply(gv, style, train=False, method=gen.encode_style)
        xg = gen.apply(gv, pyramid, label_xt, train=False, method=gen.generate)
        xg_swap = gen.apply(
            gv, pyramid, label_swap, train=False, method=gen.generate)

        def d(x):
            return dis.apply({"params": state.dis.params}, x, train=False)

        def c(x):
            return cla.apply({"params": state.cla.params}, x, train=False)

        logits_xt, _ = rec.apply(rv, xg, label_xt, train=False)
        logits_swap, _ = rec.apply(rv, xg_swap, label_swap, train=False)

        l_dis = 0.5 * (losses.gen_adv_loss(d(xg))
                       + losses.gen_adv_loss(d(xg_swap)))
        l_cla = 0.5 * (
            losses.writer_ce_loss(c(xg), batch["writer_ids"])
            + losses.writer_ce_loss(c(xg_swap), batch["writer_ids"]))
        l_rec = 0.5 * (
            losses.rec_loss(logits_xt, label_xt, config.label_smoothing)
            + losses.rec_loss(logits_swap, label_swap, config.label_smoothing))

        metrics = {"l_dis": l_dis, "l_cla": l_cla, "l_rec": l_rec}
        preds = {
            "pred_xt": jnp.argmax(logits_xt, axis=-1),
            "pred_swap": jnp.argmax(logits_swap, axis=-1),
        }
        images = {"xg": xg, "xg_swap": xg_swap}
        return metrics, preds, images

    return eval_step
