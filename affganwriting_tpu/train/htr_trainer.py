"""Standalone HTR trainer — the pre-GANwriting recognizer project.

Rebuild of GAN_word/recognizer/main_torch_latest.py (W17, SURVEY.md §2.1):
trains the attention seq2seq recognizer alone on word images with marcal
augmentation, batch 32, Adam 2e-4 with milestone LR decay, an
epoch-scheduled teacher-forcing rate, label smoothing, and CER/WER
tracking.  One jit step; augmentation runs in the host pipeline.
"""

from __future__ import annotations

from typing import Iterator

import jax
import jax.numpy as jnp
import optax

from affganwriting_tpu.core.config import WordGanConfig
from affganwriting_tpu.eval.cer import cer_counts
from affganwriting_tpu.models.recognizer.seq2seq import Recognizer
from affganwriting_tpu.train import losses


def teacher_rate_schedule(epoch: int, total: int = 200) -> float:
    """Linear decay 0.5 -> 0 over training (main_torch_latest.py teacher
    forcing schedules)."""
    return max(0.0, 0.5 * (1.0 - epoch / total))


class HTRTrainer:
    def __init__(self, config: WordGanConfig, lr: float = 2e-4,
                 milestones: tuple[int, ...] = (60, 100, 140),
                 gamma: float = 0.5, seed: int = 0):
        self.config = config
        self.rec = Recognizer(
            config.vocab_size, config.rec_hidden, config.rec_embed,
            config.output_max_len, dtype=jnp.dtype(config.compute_dtype))
        boundaries = {}
        scale = 1.0
        steps_per_epoch = 1000  # approximate; milestones are per-epoch
        for m in milestones:
            scale *= gamma
            boundaries[m * steps_per_epoch] = gamma
        schedule = optax.piecewise_constant_schedule(lr, boundaries)
        self.opt = optax.adam(schedule)
        self.rng = jax.random.key(seed)
        self._step = None

    def init_state(self, sample_img, sample_labels, key):
        variables = jax.jit(self.rec.init)(
            key, jnp.asarray(sample_img), jnp.asarray(sample_labels))
        params = variables["params"]
        stats = variables.get("batch_stats", {})
        return {"params": params, "stats": stats,
                "opt": self.opt.init(params),
                "step": jnp.zeros((), jnp.int32)}

    def _build(self):
        rec, opt, cfg = self.rec, self.opt, self.config

        @jax.jit
        def step(state, img, labels, teacher_rate, rng):
            k1, k2 = jax.random.split(rng)

            def loss_fn(params):
                (logits, _), upd = rec.apply(
                    {"params": params, "batch_stats": state["stats"]},
                    img, labels, train=True, teacher_rate=teacher_rate,
                    rngs={"dropout": k1, "teacher": k2},
                    mutable=["batch_stats"])
                loss = losses.rec_loss(logits, labels, cfg.label_smoothing)
                return loss, (upd["batch_stats"], logits)

            (loss, (stats, logits)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state["params"])
            upd, new_opt = opt.update(grads, state["opt"], state["params"])
            params = jax.tree.map(lambda p, u: p + u, state["params"], upd)
            new_state = {"params": params, "stats": stats, "opt": new_opt,
                         "step": state["step"] + 1}
            return new_state, loss, logits

        self._step = step

    def train_epoch(self, state, batches: Iterator[dict], epoch: int,
                    total_epochs: int = 200):
        if self._step is None:
            self._build()
        tr = teacher_rate_schedule(epoch, total_epochs)
        tot_loss, n = 0.0, 0
        ed_sum, len_sum = 0, 0
        for batch in batches:
            self.rng, key = jax.random.split(self.rng)
            state, loss, logits = self._step(
                state, jnp.asarray(batch["image"]),
                jnp.asarray(batch["labels"]), tr, key)
            tot_loss += float(loss)
            n += 1
            pred = jnp.argmax(logits, axis=-1)
            ed, ln = cer_counts(pred, jnp.asarray(batch["labels"])[:, 1:])
            ed_sum += int(ed)
            len_sum += int(ln)
        cer = 100.0 * ed_sum / max(len_sum, 1)
        return state, {"loss": tot_loss / max(n, 1), "cer": cer,
                       "teacher_rate": tr}
