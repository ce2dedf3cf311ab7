"""LR-schedule family + name-based optimizer param partitioning.

Rebuild of the reference BaseTrainer's optimizer setup
(line_generation/base/base_trainer.py):

- :49-110 partitions ``model.named_parameters()`` by substring into
  main / discriminator / slow (0.1x lr) / frozen groups feeding up to four
  torch optimizers.  Here the same name-match semantics produce an optax
  ``multi_transform`` label tree over the flax param pytree — one
  GradientTransformation instead of optimizer bookkeeping.
- :113-166 defines the LambdaLR schedule family (LR_test, cyclic,
  cyclic-full, 1cycle, detector warmup, rampup, and the default "custom"
  warmup).  Each is a pure step->multiplier function here (optax
  ``scale_by_schedule`` composes it with the base lr), bit-matching the
  reference lambdas.

``ReduceLROnPlateau`` on the word recognizer (GAN_word/main_run.py:279)
is :func:`plateau_scaler` — a host-side multiplier tracker (the reference's
is host-side state in torch too).
"""

from __future__ import annotations

from typing import Any, Callable, Iterable

import jax
import numpy as np
import optax


# --------------------------------------------------------------------------
# schedule family (step -> lr multiplier)
# --------------------------------------------------------------------------


def make_schedule(name: str | bool, iterations: int,
                  **kw) -> Callable[[Any], Any]:
    """step -> multiplier, matching base_trainer.py:113-166 lambdas."""
    import jax.numpy as jnp

    if name in (None, False, "none", "constant"):
        return lambda step: jnp.asarray(1.0, jnp.float32)

    if name == "LR_test":
        start = 1e-6
        slope = (1 - start) / iterations

        return lambda step: start + slope * step

    if name == "cyclic":
        min_mul = kw.get("min_lr_mul", 0.001)
        cycle = kw.get("cycle_size", 500)

        return lambda step: (
            1 - (1 - min_mul) * ((step - 1) % cycle) / (cycle - 1))

    if name == "cyclic-full":
        min_mul = kw.get("min_lr_mul", 0.25)
        cycle = kw.get("cycle_size", 500)

        def full_cycle(step):
            cycle_num = step // cycle
            rising = ((1 - min_mul) * (step % cycle) / (cycle - 1)) + min_mul
            falling = 1 - (1 - min_mul) * (step % cycle) / (cycle - 1)
            return jnp.where(cycle_num % 2 == 0, rising, falling)

        return full_cycle

    if name == "1cycle":
        low_mul = kw.get("low_lr_mul", 0.25)
        min_mul = kw.get("min_lr_mul", 0.0001)
        cycle = kw.get("cycle_size", 1000)
        trail = max(1, iterations - 2 * cycle)

        def one_cycle(step):
            rising = ((1 - low_mul) * (step % cycle) / (cycle - 1)) + low_mul
            falling = 1 - (1 - low_mul) * (step % cycle) / (cycle - 1)
            t = step - 2 * cycle
            trail_off = (low_mul * (trail - t) / trail + min_mul * t / trail)
            return jnp.where(step < cycle, rising,
                             jnp.where(step < 2 * cycle, falling, trail_off))

        return one_cycle

    if name == "detector":
        warm = kw.get("warmup_steps", 1000)

        return lambda step: jnp.minimum(
            (step + 1.0) ** -0.3, (step + 1.0) * warm ** -1.3)

    if name == "rampup":
        warm = kw.get("warmup_steps", 1000)

        return lambda step: jnp.minimum(1.0, (step + 0.001) / warm)

    if name is True or name == "custom":
        warm = kw.get("warmup_steps", 1000)

        return lambda step: jnp.minimum(
            (jnp.maximum(1e-6, step - (warm - 3)) / 100) ** -0.1,
            step * (1.485 / warm) + 0.01)

    raise ValueError(f"unrecognized learning schedule {name!r}")


# --------------------------------------------------------------------------
# name-based partitioning
# --------------------------------------------------------------------------


def _path_str(keypath) -> str:
    parts = []
    for k in keypath:
        parts.append(str(getattr(k, "key", getattr(k, "idx", k))))
    return "/".join(parts)


def partition_labels(params: Any, slow_patterns: Iterable[str] = (),
                     freeze_patterns: Iterable[str] = (),
                     default: str = "main") -> Any:
    """Label tree for ``optax.multi_transform``: every leaf whose path
    contains a freeze pattern -> 'frozen', a slow pattern -> 'slow', else
    ``default`` (base_trainer.py:62-95 substring semantics; freeze wins
    over slow, as in the reference's if-ordering)."""
    slow = tuple(slow_patterns)
    freeze = tuple(freeze_patterns)

    def label(keypath, _leaf):
        path = _path_str(keypath)
        if any(p in path for p in freeze):
            return "frozen"
        if any(p in path for p in slow):
            return "slow"
        return default

    return jax.tree_util.tree_map_with_path(label, params)


def partitioned_optimizer(
    base_lr: float,
    iterations: int,
    params: Any,
    schedule: str | bool = "none",
    slow_patterns: Iterable[str] = (),
    freeze_patterns: Iterable[str] = (),
    b1: float = 0.5,
    b2: float = 0.999,
    slow_mul: float = 0.1,
    **sched_kw,
) -> optax.GradientTransformation:
    """Adam over main/slow/frozen name groups with a shared schedule.

    slow group runs at ``slow_mul * lr`` (base_trainer.py:95: to_opt slow
    lr 0.1x); frozen leaves get zero updates.
    """
    sched = make_schedule(schedule, iterations, **sched_kw)

    def adam_at(mul):
        return optax.chain(
            optax.scale_by_adam(b1=b1, b2=b2),
            optax.scale_by_schedule(lambda s: sched(s)),
            optax.scale(-base_lr * mul),
        )

    labels = partition_labels(params, slow_patterns, freeze_patterns)
    return optax.multi_transform(
        {"main": adam_at(1.0), "slow": adam_at(slow_mul),
         "frozen": optax.set_to_zero()},
        labels)


# --------------------------------------------------------------------------
# ReduceLROnPlateau (host-side multiplier, GAN_word/main_run.py:279)
# --------------------------------------------------------------------------


class PlateauScaler:
    """Tracks a monitored metric; multiplies lr by ``factor`` when it fails
    to improve for ``patience`` evals (torch ReduceLROnPlateau defaults:
    factor 0.1, patience 10, min mode)."""

    def __init__(self, factor: float = 0.1, patience: int = 10,
                 min_mul: float = 1e-4):
        self.factor = factor
        self.patience = patience
        self.min_mul = min_mul
        self.best = np.inf
        self.bad = 0
        self.mul = 1.0

    def update(self, metric: float) -> float:
        if metric < self.best:
            self.best = metric
            self.bad = 0
        else:
            self.bad += 1
            if self.bad > self.patience:
                self.mul = max(self.min_mul, self.mul * self.factor)
                self.bad = 0
        return self.mul
