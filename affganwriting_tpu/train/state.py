"""Training state for the four-player step.

One pytree holding the params / batch stats / optimizer state of all four
players (G, D, writer classifier C, recognizer R).  The reference spreads
this across four torch optimizers and implicit module state
(GAN_word/main_runold.py:244-247); here it is a single value that moves
through the jit'd step and into orbax checkpoints wholesale.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from affganwriting_tpu.core.config import WordGanConfig
from affganwriting_tpu.models.discriminator import Discriminator
from affganwriting_tpu.models.generator import Generator
from affganwriting_tpu.models.recognizer.seq2seq import Recognizer
from affganwriting_tpu.models.writer_cla import WriterClassifier


@flax.struct.dataclass
class PlayerState:
    params: Any
    stats: Any          # batch_stats collection ({} if none)
    opt_state: Any


@flax.struct.dataclass
class WordGanState:
    step: jnp.ndarray
    gen: PlayerState
    dis: PlayerState
    cla: PlayerState
    rec: PlayerState


def build_models(config: WordGanConfig):
    dtype = jnp.dtype(config.compute_dtype)
    gen = Generator(config)
    dis = Discriminator(config.img_height, config.img_width,
                        config.dis_final_size, config.dis_layers, dtype)
    cla = WriterClassifier(config.num_writers, config.img_height,
                           config.img_width, config.dis_layers, dtype)
    rec = build_recognizer(config, dtype)
    return gen, dis, cla, rec


def build_recognizer(config: WordGanConfig, dtype=None):
    """R behind a registry key: the project seq2seq (default) or the TrOCR
    drop-in (reference main_runtransformer.py wiring)."""
    dtype = dtype or jnp.dtype(config.compute_dtype)
    if config.recognizer == "seq2seq":
        return Recognizer(config.vocab_size, config.rec_hidden,
                          config.rec_embed, config.output_max_len,
                          dtype=dtype, unroll=config.rec_scan_unroll)
    if config.recognizer == "trocr":
        from affganwriting_tpu.models.recognizer.trocr import (
            TrOCRArch,
            TrOCRRecognizer,
        )

        arch = (TrOCRArch.base_handwritten()
                if config.trocr_preset == "base" else TrOCRArch.tiny())
        return TrOCRRecognizer(
            arch, output_max_len=config.output_max_len,
            map_vec=tuple(config.trocr_map_vec),
            valid_mask=tuple(config.trocr_valid_mask))
    raise ValueError(f"unknown recognizer {config.recognizer!r}")


def make_optimizers(config: WordGanConfig):
    # Adam with torch defaults, lrs from main_runold.py:41-44.  A frozen R
    # (TrOCR drop-in) gets a no-op optimizer; otherwise R's lr is injected
    # as state so ReduceLROnPlateau (main_run.py:279) can rescale it
    # host-side between jitted steps.
    base = optax.adam if config.optimizer == "adam" else optax.sgd
    rec_opt = (optax.set_to_zero() if config.rec_frozen
               else optax.inject_hyperparams(base)(
                   learning_rate=config.lr_rec))
    return {
        "gen": base(config.lr_gen),
        "dis": base(config.lr_dis),
        "cla": base(config.lr_cla),
        "rec": rec_opt,
    }


def init_state(config: WordGanConfig, rng: jax.Array) -> WordGanState:
    gen, dis, cla, rec = build_models(config)
    opts = make_optimizers(config)
    b = 2  # init batch size is irrelevant to param shapes
    style = jnp.zeros((b, config.img_height, config.img_width,
                       config.style_stack), jnp.float32)
    img = jnp.zeros((b, config.img_height, config.img_width, 1), jnp.float32)
    labels = jnp.zeros((b, config.output_max_len), jnp.int32)

    kg, kd, kc, kr = jax.random.split(rng, 4)
    # jit the inits: on a remote-TPU backend eager per-op dispatch makes
    # unjitted init pathologically slow
    gen_vars = jax.jit(gen.init)(kg, style, labels)
    dis_vars = jax.jit(dis.init)(kd, img)
    cla_vars = jax.jit(cla.init)(kc, img)
    rec_vars = jax.jit(rec.init)(kr, img, labels)

    def player(variables, name):
        params = variables["params"]
        stats = variables.get("batch_stats", {})
        return PlayerState(params, stats, opts[name].init(params))

    return WordGanState(
        step=jnp.zeros((), jnp.int32),
        gen=player(gen_vars, "gen"),
        dis=player(dis_vars, "dis"),
        cla=player(cla_vars, "cla"),
        rec=player(rec_vars, "rec"),
    )


def param_count(state: WordGanState) -> dict[str, int]:
    def count(tree):
        return sum(int(x.size) for x in jax.tree.leaves(tree))

    return {
        "gen": count(state.gen.params),
        "dis": count(state.dis.params),
        "cla": count(state.cla.params),
        "rec": count(state.rec.params),
    }
