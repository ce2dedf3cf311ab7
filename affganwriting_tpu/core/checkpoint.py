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

    def _recover_swap(self, path: str) -> None:
        """Finish a swap that crashed mid-way.  After ``_save_swap`` writes
        ``<path>.new``, the commit is two renames; a crash between them
        leaves ``<path>`` missing with the fully-written ``.new`` (orbax
        finalizes its own tmp dir atomically, so an existing ``.new`` is
        complete) — promote it rather than treating it as stale."""
        import shutil

        new, old = f"{path}.new", f"{path}.old"
        if not os.path.exists(path) and os.path.exists(new):
            os.rename(new, path)
        if os.path.exists(old):
            shutil.rmtree(old)

    def _save_swap(self, path: str, payload: Any) -> None:
        """Write the new checkpoint fully before touching the old one: a
        crash (or SIGINT save-in-flight) must never lose the previous
        checkpoint.  orbax refuses to overwrite, so save to ``<path>.new``
        and commit with two renames (old aside, new into place); at every
        instant either ``<path>`` or a complete ``<path>.new`` exists, and
        ``_recover_swap`` promotes the latter after a crash."""
        import glob
        import shutil

        self._recover_swap(path)
        new = f"{path}.new"
        stale = [new] + glob.glob(f"{path}*.orbax-checkpoint-tmp*")
        for s in stale:
            if os.path.exists(s):
                shutil.rmtree(s)
        self._ckptr.save(new, payload)
        self._ckptr.wait_until_finished()
        old = f"{path}.old"
        if os.path.exists(path):
            os.rename(path, old)
        os.rename(new, path)
        if os.path.exists(old):
            shutil.rmtree(old)

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
        state pytree).

        The abstract target carries an explicit single-device sharding on
        THIS backend: orbax otherwise falls back to the sharding recorded
        at save time, which cannot be reconstructed across backends — a
        TPU-trained checkpoint would refuse to load in a CPU process
        ("sharding ... Got None"), breaking the train-on-TPU /
        drive-REPL-or-eval-on-CPU path.  Mesh placement after restore is
        the caller's job (``shard_state``)."""
        self._recover_swap(self._path(name))
        sh = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        shapes = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sh),
            target)
        return self._ckptr.restore(self._path(name), shapes)

    def load_config(self, name: str) -> WordGanConfig:
        with open(self._path(f"{name}.config.json")) as f:
            return WordGanConfig.from_json(f.read())

    def latest_exists(self) -> bool:
        self._recover_swap(self._path("latest"))
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
    except Exception as e:
        # pre-round-3 checkpoints carry no explicit iteration; fall back
        # to the (under-counting) optimizer step.  If the checkpoint fails
        # even without the iteration slot the problem is real (corruption,
        # shape mismatch) — surface the ORIGINAL error, not a confusing
        # missing-iteration one.
        del target["iteration"]
        try:
            payload = mgr.restore(name, target)
        except Exception:
            raise e
        import sys

        print("warning: checkpoint has no 'iteration' (pre-round-3 "
              "format); resuming the curriculum clock from state.step, "
              "which under-counts multi-part lessons", file=sys.stderr)
        payload["iteration"] = payload["state"].step
    if mesh is not None:
        # orbax restored onto the default device; put back on the mesh
        from affganwriting_tpu.parallel.mesh import shard_state

        payload = shard_state(mesh, payload)
    return trainer, payload
