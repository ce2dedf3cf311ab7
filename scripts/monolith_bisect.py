"""Bisect the monolithic-train-step pathology (VERDICT r3 weak #6/#10).

The four-player R->C->D->G update as ONE XLA program runs ~19x slower on
TPU than its four phases as separate programs (docs/ARCHITECTURE.md) —
restructuring inside the monolith (vjp-sharing, batching D/C, unrolling
scans) changed nothing.  This script localizes WHERE the slowdown appears
by timing merged subsets of the phases as single programs:

  variants: phased | rec+cla merged | dis+gen merged | all merged
            | all merged without donation

Each variant runs the same semantics; we time streaming steps at the same
batch and report imgs/s.  Usage:
    timeout 3600 python scripts/monolith_bisect.py [batch]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    import jax

    from affganwriting_tpu.core.cache import enable_compile_cache

    enable_compile_cache()
    from affganwriting_tpu.core.config import VOCAB, default_config
    from affganwriting_tpu.train import losses
    from affganwriting_tpu.train.state import (
        PlayerState,
        build_models,
        init_state,
        make_optimizers,
    )
    from affganwriting_tpu.train.step import (
        _generate_pair,
        make_phased_train_step,
        make_train_step,
    )
    import jax.numpy as jnp

    cfg = default_config().replace(batch_size=batch)
    gen, dis, cla, rec = build_models(cfg)
    opts = make_optimizers(cfg)

    rng = np.random.default_rng(0)
    lab = lambda w: VOCAB.pad_label(w, cfg.output_max_len)  # noqa: E731
    bd = {
        "style_imgs": rng.normal(size=(
            batch, cfg.img_height, cfg.img_width,
            cfg.style_stack)).astype(np.float32),
        "img_xt": rng.normal(size=(
            batch, cfg.img_height, cfg.img_width, 1)).astype(np.float32),
        "writer_ids": (np.arange(batch) % cfg.num_writers).astype(np.int32),
        "label_xt": np.asarray([lab("deep")] * batch, np.int32),
        "label_xt_swap": np.asarray([lab("dep")] * batch, np.int32),
        "label_ch0": np.asarray([lab("word")] * batch, np.int32),
    }
    bd = jax.device_put(bd)
    jax.block_until_ready(bd)

    # --- merged sub-steps (same math as train_step's phases) -------------
    def rec_cla_body(rec_p, cla_p, img_ch0, labels_ch0, writer_ids, rng_):
        def rec_loss(p):
            (logits, _), upd = rec.apply(
                {"params": p, "batch_stats": rec_p.stats},
                img_ch0, labels_ch0, train=True, rngs={"dropout": rng_},
                mutable=["batch_stats"])
            return (losses.rec_loss(logits, labels_ch0,
                                    cfg.label_smoothing),
                    upd.get("batch_stats", {}))

        (l_r, stats), g = jax.value_and_grad(
            rec_loss, has_aux=True)(rec_p.params)
        u, o = opts["rec"].update(g, rec_p.opt_state, rec_p.params)
        new_rec = PlayerState(
            jax.tree.map(lambda a, b: a + b, rec_p.params, u), stats, o)

        def cla_loss(p):
            return losses.writer_ce_loss(
                cla.apply({"params": p}, img_ch0, train=True), writer_ids)

        l_c, g = jax.value_and_grad(cla_loss)(cla_p.params)
        u, o = opts["cla"].update(g, cla_p.opt_state, cla_p.params)
        new_cla = PlayerState(
            jax.tree.map(lambda a, b: a + b, cla_p.params, u),
            cla_p.stats, o)
        return new_rec, new_cla, l_r + l_c

    def dis_gen_body(dis_p, gen_p, rec_params, rec_stats, cla_params,
                     bd_, rng_):
        style = bd_["style_imgs"]
        img_ch0 = style[..., 0:1]
        img_ch1 = style[..., 1:2]
        xg_sg, xgs_sg = jax.lax.stop_gradient(_generate_pair(
            gen, gen_p.params, gen_p.stats, style,
            bd_["label_xt"], bd_["label_xt_swap"]))

        def d_loss(p):
            def d(x):
                return dis.apply({"params": p}, x, train=True)
            return (0.5 * (losses.dis_real_loss(d(img_ch0))
                           + losses.dis_real_loss(d(img_ch1)))
                    + 0.5 * (losses.dis_fake_loss(d(xg_sg))
                             + losses.dis_fake_loss(d(xgs_sg))))

        l_d, g = jax.value_and_grad(d_loss)(dis_p.params)
        u, o = opts["dis"].update(g, dis_p.opt_state, dis_p.params)
        new_dis = PlayerState(
            jax.tree.map(lambda a, b: a + b, dis_p.params, u),
            dis_p.stats, o)

        def g_loss(p):
            (xg, xgs), upd = _generate_pair(
                gen, p, gen_p.stats, style, bd_["label_xt"],
                bd_["label_xt_swap"], mutable=True)
            l_adv = 0.5 * (
                losses.gen_adv_loss(dis.apply(
                    {"params": new_dis.params}, xg, train=True))
                + losses.gen_adv_loss(dis.apply(
                    {"params": new_dis.params}, xgs, train=True)))
            l_cla_ = 0.5 * (
                losses.writer_ce_loss(cla.apply(
                    {"params": cla_params}, xg, train=True),
                    bd_["writer_ids"])
                + losses.writer_ce_loss(cla.apply(
                    {"params": cla_params}, xgs, train=True),
                    bd_["writer_ids"]))
            k1, k2 = jax.random.split(rng_)

            def r(x, la, key):
                (logits, _), _ = rec.apply(
                    {"params": rec_params, "batch_stats": rec_stats},
                    x, la, train=True, rngs={"dropout": key},
                    mutable=["batch_stats"])
                return logits

            l_rec_ = 0.5 * (
                losses.rec_loss(r(xg, bd_["label_xt"], k1),
                                bd_["label_xt"], cfg.label_smoothing)
                + losses.rec_loss(r(xgs, bd_["label_xt_swap"], k2),
                                  bd_["label_xt_swap"],
                                  cfg.label_smoothing))
            total = (cfg.w_dis * l_adv + cfg.w_cla * l_cla_
                     + cfg.w_rec * l_rec_)
            return total, upd["batch_stats"]

        (l_g, stats), g = jax.value_and_grad(
            g_loss, has_aux=True)(gen_p.params)
        u, o = opts["gen"].update(g, gen_p.opt_state, gen_p.params)
        new_gen = PlayerState(
            jax.tree.map(lambda a, b: a + b, gen_p.params, u), stats, o)
        return new_dis, new_gen, l_d + l_g

    jit_rc = jax.jit(rec_cla_body, donate_argnums=(0, 1))
    jit_dg = jax.jit(dis_gen_body, donate_argnums=(0, 1))

    def stream_rate(name, step_once, n=10):
        state = init_state(cfg, jax.random.key(0))
        # warm/compile
        state, probe = step_once(state, jax.random.key(99))
        float(np.asarray(probe))
        t0 = time.perf_counter()
        last = None
        for i in range(n):
            state, last = step_once(state, jax.random.key(i))
        float(np.asarray(last))
        dt = time.perf_counter() - t0
        print(json.dumps({"variant": name, "batch": batch,
                          "imgs_per_sec": round(n * batch / dt, 1),
                          "sec_per_step": round(dt / n, 3)}), flush=True)

    # 1. phased baseline
    phased = make_phased_train_step(cfg)

    def run_phased(state, key):
        state, metrics, _ = phased(state, bd, key)
        return state, metrics["l_total"]

    stream_rate("phased (4 programs)", run_phased)

    # 2. rec+cla merged, dis+gen phased-equivalent (2 programs)
    def run_two(state, key):
        k1, k2 = jax.random.split(key)
        img_ch0 = bd["style_imgs"][..., 0:1]
        new_rec, new_cla, l1 = jit_rc(
            state.rec, state.cla, img_ch0, bd["label_ch0"],
            bd["writer_ids"], k1)
        new_dis, new_gen, l2 = jit_dg(
            state.dis, state.gen, new_rec.params, new_rec.stats,
            new_cla.params, bd, k2)
        state = state.replace(step=state.step + 1, rec=new_rec,
                              cla=new_cla, dis=new_dis, gen=new_gen)
        return state, l1 + l2

    stream_rate("merged pairs (2 programs: R+C | D+G)", run_two)

    # 3. full monolith, donated
    mono = jax.jit(make_train_step(cfg), donate_argnums=0)

    def run_mono(state, key):
        state, metrics, _ = mono(state, bd, key)
        return state, metrics["l_total"]

    stream_rate("monolith (donated)", run_mono, n=4)

    # 4. full monolith, no donation
    mono_nd = jax.jit(make_train_step(cfg))

    def run_mono_nd(state, key):
        state, metrics, _ = mono_nd(state, bd, key)
        return state, metrics["l_total"]

    stream_rate("monolith (no donation)", run_mono_nd, n=4)


if __name__ == "__main__":
    main()
