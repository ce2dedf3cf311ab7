"""Batched, deterministic inference.

The reference generates test images one word at a time with the model
re-loaded per writer (GAN_word/tt.test_single_writer.4_scenarios.py:142-181);
here the style stack is encoded once and an arbitrary batch of words is
decoded in a single jit call.  Everything is a pure function of
(params, style stack, labels): same inputs -> same images, which is the
determinism contract (BASELINE.md).

Inference runs the generator in eval mode (BatchNorm running averages), so
no RNG is consumed at all on this path.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from affganwriting_tpu.core.config import VOCAB, WordGanConfig
from affganwriting_tpu.train.state import build_models


def encode_labels(words: list[str], max_len: int) -> np.ndarray:
    return np.asarray(
        [VOCAB.pad_label(w[: max_len - 2], max_len) for w in words], np.int32)


def make_generate_fn(config: WordGanConfig):
    """Returns jit fn (gen_variables, style_stack (S,...), labels (B, T))
    -> images (B, 64, 216, 1).

    ``style_stack`` holds S writers' stacks; labels are decoded against
    writer ``i % S`` when B > S (the common case is S == 1: one writer,
    many words — encode once, decode many)."""
    gen, _, _, _ = build_models(config)

    @jax.jit
    def generate(variables: dict[str, Any], style_stack, labels):
        pyramid = gen.apply(
            variables, style_stack, train=False, method=gen.encode_style)
        b = labels.shape[0]
        s = style_stack.shape[0]
        if s != b and s != 1:
            # multi-writer stacks: tile so writer i%S styles word i
            # (jnp.repeat would pair word i with writer i//reps, and any
            # B % S != 0 must fail loudly, not as a broadcast error)
            if b % s:
                raise ValueError(
                    f"labels batch {b} is not a multiple of the {s} style "
                    "stacks; pad or trim the word list")
            reps = b // s
            pyramid = [jnp.tile(tap, (reps,) + (1,) * (tap.ndim - 1))
                       for tap in pyramid]
        # s == 1 needs no tiling: the batch-1 pyramid broadcasts through
        # the split mix and the iAFF skip fusion
        return gen.apply(
            variables, pyramid, labels, train=False, method=gen.generate)

    return generate


def make_generate_and_read_fn(config: WordGanConfig):
    """Generation + recognition: the tt.* pipeline (generate, OCR with R,
    keep) as TWO pipelined XLA programs returning images and greedy-decoded
    label ids.

    Two programs, not one: fusing G and R into a single XLA computation
    measured ~10x SLOWER on v5e (205 vs 2687 imgs/s at batch 1024) — the
    combined program's live set (G's batch-tiled style pyramid + R's VGG
    activations) blows past HBM and XLA spills.  Two back-to-back jits keep
    each program's working set resident and the dispatch overhead is
    amortized by async execution.
    """
    gen, _, _, rec = build_models(config)

    @jax.jit
    def run_gen(gen_variables, style_stack, labels):
        pyramid = gen.apply(
            gen_variables, style_stack, train=False, method=gen.encode_style)
        b = labels.shape[0]
        s = style_stack.shape[0]
        if s != b and s != 1:
            # multi-writer stacks: tile so writer i%S styles word i
            # (batch-1 pyramids broadcast through mix/iAFF — no tiling)
            if b % s:
                raise ValueError(
                    f"labels batch {b} is not a multiple of the {s} style "
                    "stacks; pad or trim the word list")
            reps = b // s
            pyramid = [jnp.tile(tap, (reps,) + (1,) * (tap.ndim - 1))
                       for tap in pyramid]
        return gen.apply(
            gen_variables, pyramid, labels, train=False, method=gen.generate)

    @jax.jit
    def run_rec(rec_variables, images, labels):
        logits, _ = rec.apply(rec_variables, images, labels, train=False)
        return jnp.argmax(logits, axis=-1)

    def run(gen_variables, rec_variables, style_stack, labels):
        images = run_gen(gen_variables, style_stack, labels)
        pred_ids = run_rec(rec_variables, images, labels)
        return images, pred_ids

    run.run_gen = run_gen
    run.run_rec = run_rec
    return run


def calibrate_gen_quant(config: WordGanConfig, gen_variables, style_stack,
                        labels):
    """Record per-conv-site activation amaxes for G's static int8 mode.

    Runs the decoder in ``calib`` quant mode (bf16 convs that sow
    ``max(|input|)`` into the "quant" collection) on a representative
    (style, labels) batch and returns ``gen_variables`` with the
    calibrated "quant" collection merged — feed that to
    ``make_generate_and_read_quant_fn(quant_gen="static")``.
    """
    from affganwriting_tpu.models.generator import Generator

    gen_c = Generator(config, quant=True, quant_mode="calib")

    @jax.jit
    def _calib(variables, style, lab):
        pyramid = gen_c.apply(variables, style, train=False,
                              method=gen_c.encode_style)
        _, mut = gen_c.apply(variables, pyramid, lab, train=False,
                             method=gen_c.generate, mutable=["quant"])
        return mut["quant"]

    quant = _calib(gen_variables, style_stack, labels)
    return {**gen_variables, "quant": quant}


def make_generate_and_read_quant_fn(config: WordGanConfig, *,
                                    quant_gen: bool | str = False):
    """The gen+read pipeline with the hot convs in int8 (w8a8 serving mode).

    Same two-program structure as ``make_generate_and_read_fn``:

    * the recognize program swaps R's bf16 VGG trunk for ``ops/quant.py:
      vgg_quant_apply`` (int8 MXU path, static calibrated scales) and feeds
      the features into the unchanged bf16/f32 BiGRU+decoder tail
      (``Recognizer.read_features``).  ``qparams`` comes from
      ``prepare_vgg_quant(rec_variables, calib_images)`` — calibrate on a
      batch of generated words.
    * ``quant_gen`` runs the decoder's res-block and upsample convs on the
      int8 MXU path too: ``"dynamic"`` (or True) uses per-sample amax
      scales; ``"static"`` uses calibrated per-tensor scales (pass
      ``gen_variables`` through :func:`calibrate_gen_quant` first — the
      quantize then fuses into the producer epilogues with no amax pass).
      Default OFF for compatibility, but ``"static"`` WINS on v5e (1.34x
      gen-only, 1.43x pipeline with the int8 R trunk); ``"dynamic"``
      loses (0.90x — the amax pass eats the MXU win).  Measured A/B:
      docs/ARCHITECTURE.md int8 section / scripts/ab_int8_static.py.

    Opt-in serving mode; quality gates in tests/test_quant.py, measured
    A/B in docs/ARCHITECTURE.md.
    """
    from affganwriting_tpu.models.generator import Generator
    from affganwriting_tpu.ops.quant import vgg_quant_apply

    gen_and_read = make_generate_and_read_fn(config)
    run_gen = gen_and_read.run_gen
    _, _, _, rec = build_models(config)

    if quant_gen:
        mode = "dynamic" if quant_gen is True else quant_gen
        gen_q = Generator(config, quant=True, quant_mode=mode)

        @jax.jit
        def run_gen(gen_variables, style_stack, labels):  # noqa: F811
            pyramid = gen_q.apply(gen_variables, style_stack, train=False,
                                  method=gen_q.encode_style)
            b, s = labels.shape[0], style_stack.shape[0]
            if s != b and s != 1:
                if b % s:
                    raise ValueError(
                        f"labels batch {b} is not a multiple of the {s} "
                        "style stacks; pad or trim the word list")
                reps = b // s
                pyramid = [jnp.tile(tap, (reps,) + (1,) * (tap.ndim - 1))
                           for tap in pyramid]
            return gen_q.apply(gen_variables, pyramid, labels, train=False,
                               method=gen_q.generate)

    @jax.jit
    def run_rec_q(rec_variables, qparams, images, labels):
        feat = vgg_quant_apply(qparams, images)
        logits, _ = rec.apply(rec_variables, feat, labels,
                              method=rec.read_features)
        return jnp.argmax(logits, axis=-1)

    def run(gen_variables, rec_variables, qparams, style_stack, labels):
        images = run_gen(gen_variables, style_stack, labels)
        pred_ids = run_rec_q(rec_variables, qparams, images, labels)
        return images, pred_ids

    run.run_gen = run_gen
    run.run_rec = run_rec_q
    return run


def make_sharded_pipeline(config: WordGanConfig, mesh):
    """Serving scale-out: generate+recognize DP-sharded over a device Mesh.

    The multi-chip form of the offline sweep (reference:
    GAN_word/tt.test_single_writer.4_scenarios.py:152-181 is single-GPU;
    the reference has no multi-device inference at all).  The word batch
    shards over the mesh's 'data' axis; model variables replicate except
    where the TP rules apply (G's text-encoder FC pyramid rides the
    'model' axis, parallel/mesh.py), and a batch-1 style stack replicates
    so the per-shard pyramid broadcast still holds.  Pure DP inserts no
    collectives — each chip runs the same two programs the single-chip
    pipeline uses, on its slice of the batch.

    Returns ``run(gen_variables, rec_variables, style_stack, labels)``.
    ``run.place(gen_variables, rec_variables, style_stack)`` pre-places
    the weights/style once (reuse across batches to avoid re-transfer);
    ``run.shard_labels(labels)`` places a label batch.  The label batch
    must divide by the mesh's 'data' extent.
    """
    from affganwriting_tpu.parallel.mesh import (
        DATA_AXIS, batch_sharding, replicated, shard_params)

    base = make_generate_and_read_fn(config)
    n_data = mesh.shape[DATA_AXIS]

    def place(gen_variables, rec_variables, style_stack):
        # gen carries the TP-ruled layers (coverage asserted); the
        # recognizer legitimately replicates
        gv = shard_params(mesh, gen_variables, expect_tp=True)
        rv = shard_params(mesh, rec_variables)
        s = style_stack.shape[0]
        sh = replicated(mesh) if s == 1 else batch_sharding(mesh)
        if s != 1 and s % n_data:
            raise ValueError(
                f"style stack batch {s} does not divide over the "
                f"{n_data}-way data axis; use one stack or pad")
        return gv, rv, jax.device_put(style_stack, sh)

    def shard_labels(labels):
        b = labels.shape[0]
        if b % n_data:
            raise ValueError(
                f"label batch {b} does not divide over the {n_data}-way "
                "data axis; pad or trim the word list")
        return jax.device_put(jnp.asarray(labels), batch_sharding(mesh))

    def run(gen_variables, rec_variables, style_stack, labels):
        gv, rv, st = place(gen_variables, rec_variables, style_stack)
        return base(gv, rv, st, shard_labels(labels))

    run.place = place
    run.shard_labels = shard_labels
    run.base = base
    return run


def variables_of(player) -> dict[str, Any]:
    """PlayerState -> flax variables dict."""
    v = {"params": player.params}
    if player.stats:
        v["batch_stats"] = player.stats
    return v
