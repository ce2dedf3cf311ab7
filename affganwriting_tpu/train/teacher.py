"""Teacher-guided recognizer phase (the reference's TrOCR teacher).

Rebuild of GAN_word/main_run.py:310-410 + trocr_teacher.py + helpers.py:
after a warmup epoch threshold, only the recognizer R trains for <= 200
steps per eval: fakes are generated with eval-mode G (no grad), a frozen
teacher OCRs them into pseudo labels with confidences, samples with
confidence >= 0.6 are kept, and R takes a confidence-weighted recognition
loss with gradient-norm clipping 1.0 under its own Adam(1e-5).

The teacher is pluggable:
  * ``TrOCRTeacher`` wraps a local HF VisionEncoderDecoder checkpoint
    (microsoft/trocr-base-handwritten layout) on the host via transformers
    (torch CPU) — nothing is downloaded; absent weights raise.
  * ``SelfTeacher`` uses the framework's own recognizer with batched beam
    search; confidence is the mean max softmax probability per step — the
    same statistic TrOCR's wrapper computes (trocr_teacher.py:63-103).
    This keeps the whole phase runnable/testable without external weights.

TPU notes: generation + teacher-filtered R update are two jit programs; the
confidence filter is a static-shape sample mask (no dynamic gathers).
"""

from __future__ import annotations

from typing import Protocol

import jax
import jax.numpy as jnp
import numpy as np
import optax

from affganwriting_tpu.core.config import VOCAB, WordGanConfig
from affganwriting_tpu.train import losses
from affganwriting_tpu.train.state import WordGanState, build_models


class Teacher(Protocol):
    def predict(self, images: np.ndarray) -> tuple[list[str], np.ndarray]:
        """images (B, H, W, 1) in [-1, 1] -> (texts, confidences)."""
        ...


class SelfTeacher:
    """Pseudo-labels from the framework's own recognizer (beam search)."""

    def __init__(self, config: WordGanConfig, rec_variables, beam_size=3):
        _, _, _, rec = build_models(config)
        self.config = config

        @jax.jit
        def run(variables, images):
            seqs, _ = rec.apply(
                variables, images, beam_size=beam_size,
                method=rec.beam_search)
            go = jnp.full((images.shape[0], 1), VOCAB.go, jnp.int32)
            logits, _ = rec.apply(
                variables, images, jnp.concatenate([go, seqs], axis=1),
                train=False)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            conf = jnp.mean(jnp.max(probs, axis=-1), axis=-1)
            return seqs, conf

        self._run = run
        self.variables = rec_variables

    def predict(self, images):
        seqs, conf = self._run(self.variables, np.asarray(images))
        texts = [VOCAB.decode(s) for s in np.asarray(seqs)]
        return texts, np.asarray(conf)


class TrOCRTeacher:
    """Frozen HF TrOCR from a LOCAL checkpoint directory.

    Mirrors trocr_teacher.py:63-103: generate with beam search, confidence =
    mean max token probability, strip banned strings (' ', '.', ',')."""

    BANNED = (" ", ".", ",")

    def __init__(self, ckpt_dir: str, max_new_tokens: int = 16):
        import torch  # host-side, CPU
        from transformers import TrOCRProcessor, VisionEncoderDecoderModel

        self.processor = TrOCRProcessor.from_pretrained(
            ckpt_dir, local_files_only=True)
        self.model = VisionEncoderDecoderModel.from_pretrained(
            ckpt_dir, local_files_only=True)
        self.model.eval()
        for p in self.model.parameters():
            p.requires_grad_(False)
        self.max_new_tokens = max_new_tokens
        self._torch = torch

    def predict(self, images):
        torch = self._torch
        arr = np.asarray(images)[..., 0]              # (B, H, W) in [-1, 1]
        arr = ((arr * 0.5 + 0.5) * 255).clip(0, 255).astype(np.uint8)
        rgb = np.stack([255 - arr] * 3, axis=-1)      # invert back to ink
        pixel_values = self.processor(
            images=list(rgb), return_tensors="pt").pixel_values
        with torch.no_grad():
            out = self.model.generate(
                pixel_values, max_new_tokens=self.max_new_tokens,
                output_scores=True, return_dict_in_generate=True)
        texts = self.processor.batch_decode(
            out.sequences, skip_special_tokens=True)
        confs = []
        for b in range(len(texts)):
            step_probs = []
            for score in out.scores:
                p = torch.softmax(score[b], dim=-1).max().item()
                step_probs.append(p)
            confs.append(float(np.mean(step_probs)) if step_probs else 0.0)
        cleaned = []
        for t in texts:
            for ban in self.BANNED:
                t = t.replace(ban, "")
            cleaned.append(t)
        return cleaned, np.asarray(confs, np.float32)


class FlaxTrOCRTeacher:
    """TPU-native TrOCR teacher: the framework's own flax ViT/TrOCR stack
    (models/recognizer/trocr.py) decoded greedily ON DEVICE — no host
    torch round-trip per batch.  ``ckpt_dir`` imports real HF weights when
    available; otherwise runs the given arch from random init (useful only
    for wiring tests, like SelfTeacher without a trained R).

    Confidence = mean max-probability over decode steps, the same statistic
    the HF wrapper computes (trocr_teacher.py:63-103).  Decoding maps back
    to the project charset through the char->token table, so banned
    punctuation never appears.
    """

    def __init__(self, config: WordGanConfig, ckpt_dir: str | None = None,
                 arch=None, params=None):
        from affganwriting_tpu.models.recognizer.trocr import (
            TrOCRArch,
            TrOCRCore,
            default_char_token_table,
            load_pretrained,
            preprocess_for_trocr,
        )

        if ckpt_dir is not None:
            loaded = load_pretrained(ckpt_dir)
            if loaded is None:
                raise FileNotFoundError(ckpt_dir)
            params, mv, vm = loaded
            arch = arch or TrOCRArch.base_handwritten()
        else:
            arch = arch or TrOCRArch.tiny()
            mv, vm = default_char_token_table(arch.vocab_tro)
            if params is None:
                core0 = TrOCRCore(arch)
                params = core0.init(
                    jax.random.key(0),
                    jnp.zeros((1, arch.image_size, arch.image_size, 3)),
                    jnp.zeros((1, 2), jnp.int32))["params"]
        core = TrOCRCore(arch)
        max_steps = config.max_chars + 1
        mv_j = jnp.asarray(mv, jnp.int32)
        vm_j = jnp.asarray(vm)

        @jax.jit
        def run(params, images):
            pixels = preprocess_for_trocr(images, arch.image_size)
            b = images.shape[0]
            # greedy decode over the 55-vocab: tokens buffer starts at GO
            tokens = jnp.full((b, max_steps + 1), VOCAB.pad, jnp.int32)
            tokens = tokens.at[:, 0].set(VOCAB.go)

            def step(carry, t):
                tokens, conf_sum, n_alive, alive = carry
                dec_in = jnp.take(mv_j, tokens, axis=0)     # (B, S)
                logits = core.apply({"params": params}, pixels, dec_in)
                step_logits = logits[:, t]                  # (B, Vt)
                vocab_logits = jnp.take(step_logits, mv_j, axis=-1)
                vocab_logits = jnp.where(vm_j[None], vocab_logits, -30.0)
                probs = jax.nn.softmax(vocab_logits, axis=-1)
                nxt = jnp.argmax(vocab_logits, axis=-1).astype(jnp.int32)
                tokens = jax.lax.dynamic_update_index_in_dim(
                    tokens, nxt, t + 1, axis=1)
                # confidence = mean max-prob over EMITTED tokens only (the
                # HF wrapper statistic, trocr_teacher.py:63-103): the step
                # that emits END still counts, steps after it don't —
                # otherwise post-END steps dilute short words' confidence
                conf_sum = conf_sum + alive * jnp.max(probs, axis=-1)
                n_alive = n_alive + alive
                alive = alive * (nxt != VOCAB.end).astype(jnp.float32)
                return (tokens, conf_sum, n_alive, alive), None

            (tokens, conf_sum, n_alive, _), _ = jax.lax.scan(
                step,
                (tokens, jnp.zeros((b,), jnp.float32),
                 jnp.zeros((b,), jnp.float32), jnp.ones((b,), jnp.float32)),
                jnp.arange(max_steps))
            return tokens[:, 1:], conf_sum / jnp.maximum(n_alive, 1.0)

        self._run = run
        self._params = params

    def predict(self, images):
        seqs, conf = self._run(self._params, jnp.asarray(images))
        seqs = np.asarray(seqs)
        texts = []
        for row in seqs:
            # stop at END
            out = []
            for tid in row:
                if int(tid) == VOCAB.end:
                    break
                out.append(int(tid))
            texts.append(VOCAB.decode(out))
        return texts, np.asarray(conf)


def texts_to_labels(texts: list[str], config: WordGanConfig) -> np.ndarray:
    """Pseudo-label texts -> padded label ids, dropping out-of-charset chars
    and clipping to max_chars (helpers.py texts_to_labels semantics)."""
    out = []
    for t in texts:
        t = "".join(c for c in t if c in VOCAB.letters)[: config.max_chars]
        out.append(VOCAB.pad_label(t or "a", config.output_max_len))
    return np.asarray(out, np.int32)


def make_teacher_update(config: WordGanConfig):
    """R-only confidence-weighted update with grad clip 1.0 + Adam 1e-5."""
    _, _, _, rec = build_models(config)
    opt = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adam(1e-5),
    )

    @jax.jit
    def update(rec_params, rec_stats, opt_state, images, labels,
               sample_mask, weight, rng):
        def loss_fn(params):
            (logits, _), updates = rec.apply(
                {"params": params, "batch_stats": rec_stats},
                images, labels, train=True, rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            v = logits.shape[-1]
            per_tok = losses.label_smoothing_kl_per_row(
                logits.reshape(-1, v), labels[:, 1:].reshape(-1),
                config.label_smoothing)
            per_tok = per_tok.reshape(labels.shape[0], -1)
            masked = per_tok * sample_mask[:, None]
            return weight * jnp.sum(masked), updates["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(rec_params)
        upd, new_opt = opt.update(grads, opt_state, rec_params)
        new_params = jax.tree.map(lambda p, u: p + u, rec_params, upd)
        return new_params, new_stats, new_opt, loss

    return update, opt


def run_teacher_phase(
    state: WordGanState,
    config: WordGanConfig,
    teacher: Teacher,
    batches,
    rng: jax.Array,
    max_steps: int = 200,
    conf_threshold: float = 0.6,
) -> tuple[WordGanState, dict]:
    """Generate -> teacher-label -> filtered R update (main_run.py:336-383)."""
    from affganwriting_tpu.gen.inference import make_generate_fn, variables_of

    generate = make_generate_fn(config)
    update, opt = make_teacher_update(config)
    gv = variables_of(state.gen)

    rec_params = state.rec.params
    rec_stats = state.rec.stats
    opt_state = opt.init(rec_params)

    stats = {"used_batches": 0, "used_samples": 0, "skipped_small": 0,
             "loss_sum": 0.0, "conf_sum": 0.0}
    steps = 0
    for batch in batches:
        if steps >= max_steps:
            break
        xg = generate(gv, batch["style_imgs"], batch["label_xt"])
        texts, conf = teacher.predict(np.asarray(xg))
        mask = conf >= conf_threshold
        n_used = int(mask.sum())
        if n_used < 2:
            stats["skipped_small"] += 1
            continue
        labels = texts_to_labels(texts, config)
        mean_conf = float(conf[mask].mean())
        weight = float(np.clip(mean_conf, conf_threshold, 1.0))
        rng, key = jax.random.split(rng)
        rec_params, rec_stats, opt_state, loss = update(
            rec_params, rec_stats, opt_state, np.asarray(xg), labels,
            mask.astype(np.float32), weight, key)
        stats["used_batches"] += 1
        stats["used_samples"] += n_used
        stats["loss_sum"] += float(loss)
        stats["conf_sum"] += mean_conf
        steps += 1

    new_state = state.replace(
        rec=state.rec.replace(params=rec_params, stats=rec_stats))
    n = max(stats["used_batches"], 1)
    return new_state, {
        "avg_pseudo_loss": stats["loss_sum"] / n,
        "avg_confidence": stats["conf_sum"] / n,
        "used_batches": stats["used_batches"],
        "used_samples": stats["used_samples"],
        "skipped_small_batches": stats["skipped_small"],
    }
