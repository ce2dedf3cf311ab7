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
        # best-so-far survives a resume (the reference restores
        # monitor_best from the checkpoint, base_trainer.py:445)
        best_path = self._path("best.metric.json")
        if os.path.exists(best_path):
            with open(best_path) as f:
                self._best_metric = float(json.load(f)["metric"])

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def _save_swap(self, path: str, payload: Any) -> None:
        """Write the new checkpoint fully before touching the old one: a
        crash (or SIGINT save-in-flight) must never lose the previous
        checkpoint.  orbax refuses to overwrite, so save to ``<path>.new``
        then swap — the destructive window shrinks from the whole
        multi-second device->host serialization to an rmtree+rename."""
        import shutil

        new = f"{path}.new"
        for stale in (f"{path}.orbax-checkpoint-tmp", new,
                      f"{new}.orbax-checkpoint-tmp"):
            if os.path.exists(stale):
                shutil.rmtree(stale)
        self._ckptr.save(new, payload)
        self._ckptr.wait_until_finished()
        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(new, path)

    def save(self, name: str, state: Any, config: WordGanConfig) -> None:
        self._save_swap(self._path(name), state)
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


class LineCheckpointManager(CheckpointManager):
    """The line-stack trio (reference base_trainer.py:340-399): payload is
    ``{"state": LineState, "swa": {"avg": params, "count": n}}`` — model +
    both optimizer states + iteration (``state.step``) + SWA average — and
    the trainer's constructor config rides along as JSON, which is what
    ``generate.py``/``app.py``-equivalents rebuild the model from
    (reference generate.py:88-97)."""

    def save(self, name: str, payload: Any, config: dict) -> None:
        self._save_swap(self._path(name), payload)
        with open(self._path(f"{name}.config.json"), "w") as f:
            json.dump(config, f, indent=2, sort_keys=True)

    def load_config(self, name: str) -> dict:
        with open(self._path(f"{name}.config.json")) as f:
            return json.load(f)


def restore_line_trainer(ckpt_dir: str, sample_batch: dict,
                         name: str = "latest", mesh=None, curriculum=None):
    """Checkpoint dir -> (trainer, restored payload).

    Rebuilds the trainer from the embedded config, initializes a skeleton
    state from ``sample_batch`` (shapes only), and restores the payload
    into it — the full resume path (reference base_trainer.py:410-479 +
    generate.py:88-97).  ``payload["state"].step`` carries the iteration.
    """
    import jax

    from affganwriting_tpu.train.line_trainer import LineGanTrainer
    from affganwriting_tpu.train.swa import swa_init

    import jax.numpy as jnp

    mgr = LineCheckpointManager(ckpt_dir)
    config = mgr.load_config(name)
    trainer = LineGanTrainer.from_config(
        config, mesh=mesh, curriculum=curriculum)
    skeleton = trainer.init_state(sample_batch, jax.random.key(0))
    target = {"state": skeleton, "swa": swa_init(skeleton.main_params),
              "iteration": jnp.zeros((), jnp.int32)}
    try:
        payload = mgr.restore(name, target)
    except Exception:
        # pre-round-3 checkpoints carry no explicit iteration; fall back
        # to the (under-counting) optimizer step
        del target["iteration"]
        payload = mgr.restore(name, target)
        payload["iteration"] = payload["state"].step
    if mesh is not None:
        # orbax restored onto the default device; put back on the mesh
        from affganwriting_tpu.parallel.mesh import shard_state

        payload = shard_state(mesh, payload)
    return trainer, payload
