"""Checkpointing via orbax: latest + periodic + best trio.

The reference has two schemes — bare ``state_dict`` files per epoch for the
word GAN (GAN_word/main_runold.py:251-272, optimizer state lost) and a rich
{arch, iteration, optimizers, monitor_best, config, state} checkpoint for
line_generation (base_trainer.py:340-399).  Here one scheme covers both:
the full ``WordGanState`` pytree (params + 4 optimizer states + BN stats +
step) plus the serialized config, with "latest" overwritten every
``save_minor`` steps (crash loses <= that many), periodic keeps, and a
tracked best (SURVEY.md §5.4).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from affganwriting_tpu.core.config import WordGanConfig


class CheckpointManager:
    def __init__(self, directory: str, keep_periodic: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self.keep_periodic = keep_periodic
        self._best_metric: Optional[float] = None

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def save(self, name: str, state: Any, config: WordGanConfig) -> None:
        import shutil

        path = self._path(name)
        # a killed process can leave an orbax tmp dir behind; clear it
        tmp = f"{path}.orbax-checkpoint-tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        if os.path.exists(path):
            # orbax refuses to overwrite; replace atomically-ish
            shutil.rmtree(path)
        self._ckptr.save(path, state)
        self._ckptr.wait_until_finished()
        with open(self._path(f"{name}.config.json"), "w") as f:
            f.write(config.to_json())

    def save_latest(self, state, config):
        self.save("latest", state, config)

    def save_step(self, state, config, step: int):
        self.save(f"step_{step:08d}", state, config)
        self._prune()

    def maybe_save_best(self, state, config, metric: float) -> bool:
        """Lower is better (validation CER)."""
        if self._best_metric is None or metric < self._best_metric:
            self._best_metric = metric
            self.save("best", state, config)
            with open(self._path("best.metric.json"), "w") as f:
                json.dump({"metric": metric}, f)
            return True
        return False

    def _prune(self):
        steps = sorted(
            d for d in os.listdir(self.directory) if d.startswith("step_")
            and not d.endswith(".json")
        )
        for d in steps[: -self.keep_periodic]:
            import shutil

            shutil.rmtree(self._path(d))
            cfg = self._path(f"{d}.config.json")
            if os.path.exists(cfg):
                os.remove(cfg)

    def restore(self, name: str, target: Any):
        """Restore into the structure of ``target`` (an abstract or concrete
        state pytree)."""
        shapes = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), target)
        return self._ckptr.restore(self._path(name), shapes)

    def load_config(self, name: str) -> WordGanConfig:
        with open(self._path(f"{name}.config.json")) as f:
            return WordGanConfig.from_json(f.read())

    def latest_exists(self) -> bool:
        return os.path.exists(self._path("latest"))
