"""Word-GAN training loop: epochs, eval cadence, early stopping, checkpoints.

Orchestration mirrors GAN_word/main_runold.py:234-272 — per-batch four-phase
update (one jit call here), CER accumulators per epoch, eval every
``eval_every`` epochs with EarlyStopping(patience) on summed validation CER,
model saves every ``save_every`` epochs — with the TPU additions: device-
resident batches, metrics JSONL, orbax latest/periodic/best checkpoints and
a deterministic (seed, epoch)-keyed data stream so resume reproduces the
exact batch order.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import numpy as np

from affganwriting_tpu.core.checkpoint import CheckpointManager
from affganwriting_tpu.core.config import WordGanConfig
from affganwriting_tpu.parallel.mesh import (
    DATA_AXIS,
    shard_batch,
    shard_state,
)
from affganwriting_tpu.data.prefetch import prefetch
from affganwriting_tpu.data.words import WordStyleDataset
from affganwriting_tpu.eval.cer import CERAccumulator, cer_counts
from affganwriting_tpu.train.eval_step import make_eval_step
from affganwriting_tpu.train.state import init_state
from affganwriting_tpu.train.step import make_phased_train_step
from affganwriting_tpu.utils.logging import MetricsLogger


@dataclasses.dataclass
class EarlyStopping:
    """Stop when the monitored value hasn't improved for ``patience`` evals
    (GAN_word/main_runold.py:201-231)."""

    patience: int = 20
    best: float = float("inf")
    count: int = 0
    should_stop: bool = False

    def update(self, value: float) -> None:
        if value < self.best:
            self.best = value
            self.count = 0
        else:
            self.count += 1
            if self.count >= self.patience:
                self.should_stop = True


class WordGanTrainer:
    def __init__(
        self,
        config: WordGanConfig,
        train_data: WordStyleDataset,
        test_data: Optional[WordStyleDataset] = None,
        logdir: str = "runs/word_gan",
        seed: int = 0,
        eval_every: int = 20,
        save_every: int = 100,
        save_latest_every_steps: int = 250,
        patience: int = 20,
        rec_plateau: bool = False,
        mesh=None,
        restart_rss_gb: float = 48.0,
    ):
        self.config = config
        self.train_data = train_data
        self.test_data = test_data
        self.logger = MetricsLogger(logdir)
        self.ckpt = CheckpointManager(f"{logdir}/ckpt")
        self.eval_every = eval_every
        self.save_every = save_every
        self.save_latest_every_steps = save_latest_every_steps
        self.early = EarlyStopping(patience)
        # host-RSS watchdog: the tunneled runtime leaks every transfer's
        # host mirror (~one batch/step); save+re-exec before the kernel
        # OOM-kills a long run (utils/memwatch.py).  0 disables.
        self.restart_rss_gb = restart_rss_gb
        if rec_plateau and not config.rec_frozen:
            from affganwriting_tpu.train.schedules import PlateauScaler

            self.plateau = PlateauScaler()
        else:
            self.plateau = None
        self.rng = jax.random.key(seed)

        # Multi-chip: params/opt-state placed on the mesh once (TP rules on
        # the big dense layers, DP replication elsewhere); every batch is
        # sharded over 'data'.  GSPMD then partitions the same train_step —
        # gradient psum over ICI — with no other trainer change (SURVEY.md
        # §5.8; the north-star contract in BASELINE.json).
        self.mesh = mesh
        if mesh is not None:
            n_data = mesh.shape[DATA_AXIS]
            if config.batch_size % n_data:
                raise ValueError(
                    f"batch_size {config.batch_size} not divisible by the "
                    f"mesh 'data' axis ({n_data})")

        self.state = init_state(config, jax.random.key(seed))
        # four chained programs, not one: the monolithic step is an XLA
        # scheduling pathology on TPU (19x slower at batch 64 — see
        # train/step.py:make_phased_train_step and docs/ARCHITECTURE.md)
        self.train_step = make_phased_train_step(
            config, merge_dg=config.merge_dg)
        self.eval_step = make_eval_step(config)
        self.start_epoch = 0
        if self.ckpt.latest_exists():
            self.state = self.ckpt.restore("latest", self.state)
            self.start_epoch = int(self.state.step) // max(
                1, len(train_data) // config.batch_size)
            print(f"resumed from latest at epoch ~{self.start_epoch}")
        if mesh is not None:
            self.state = shard_state(mesh, self.state)

    def _place(self, batch: dict) -> dict:
        if self.mesh is None:
            return batch
        if jax.process_count() > 1:
            # multi-host DP: each process feeds its local slice of the
            # global batch (parallel/multihost.py)
            from affganwriting_tpu.parallel.multihost import global_batch

            return global_batch(self.mesh, batch)
        return shard_batch(self.mesh, batch)

    def train_epoch(self, epoch: int) -> dict:
        cer_tr = CERAccumulator()
        cer_te = CERAccumulator()
        cer_te2 = CERAccumulator()
        n = 0
        t0 = time.time()
        # Dispatch the whole epoch without synchronizing: metrics/logits
        # stay device arrays until the end, so steps pipeline behind host
        # batch prep instead of paying a device round-trip per step (the
        # reference syncs per loss print; over a tunneled runtime that
        # round-trip can dominate the step)
        pending: list[tuple[dict, dict, dict]] = []
        gsteps = getattr(self, "_gsteps", 0)
        # host batch prep (augmentation/rendering) overlaps device compute
        # on a background thread — the reference's num_workers equivalent
        # (data/prefetch.py)
        for batch in prefetch(self.train_data.batches(epoch=epoch)):
            self.rng, step_key = jax.random.split(self.rng)
            self.state, metrics, extras = self.train_step(
                self.state, self._place(batch), step_key)
            # retain only what the post-loop CER pass reads: keeping the
            # whole batch would pin every style stack (~22MB/step at batch
            # 8) in memory for the entire epoch
            labels = {k: batch[k]
                      for k in ("label_ch0", "label_xt", "label_xt_swap")}
            pending.append((metrics, extras, labels))
            n += 1
            gsteps += 1
            if gsteps % self.save_latest_every_steps == 0:
                self.ckpt.save_latest(self.state, self.config)
        self._gsteps = gsteps
        sums: dict[str, float] = {}
        for metrics, extras, batch in pending:
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            # CER accumulators on host, matching network_tro.py:46, 94-95
            cer_tr.add_logits(extras["rec_logits_tr"], batch["label_ch0"])
            cer_te.add_logits(extras["logits_xt"], batch["label_xt"])
            cer_te2.add_logits(extras["logits_swap"], batch["label_xt_swap"])
        out = {k: v / max(n, 1) for k, v in sums.items()}
        out["cer_tr"] = cer_tr.value()
        out["cer_te"] = cer_te.value()
        out["cer_te2"] = cer_te2.value()
        out["epoch_seconds"] = time.time() - t0
        out["steps_per_sec"] = n / max(out["epoch_seconds"], 1e-9)
        self.logger.log(epoch, out, group="train")
        return out

    def evaluate(self, epoch: int) -> float:
        """Returns summed validation CER (the early-stop monitor,
        main_runold.py:261-268).  The first batch also dumps a debug image
        sheet (the reference's write_image, modules_tro.py:47-105)."""
        assert self.test_data is not None
        cer_te = CERAccumulator()
        cer_te2 = CERAccumulator()
        sums: dict[str, float] = {}
        n = 0
        # dispatch every eval batch before fetching anything (same
        # pipelining as train_epoch: a float per batch would pay the
        # tunnel sync floor per batch)
        pending: list[tuple[dict, dict, dict]] = []
        first = None
        for batch in self.test_data.batches(epoch=epoch, shuffle=False):
            metrics, preds, images = self.eval_step(
                self.state, self._place(batch))
            if n == 0:
                first = (batch, preds, images)
            labels = {k: batch[k] for k in ("label_xt", "label_xt_swap")}
            pending.append((metrics, preds, labels))
            n += 1
        if first is not None:
            self._dump_sheet(epoch, first[0], first[1], first[2])
        for metrics, preds, labels in pending:
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            ed, ln = cer_counts(preds["pred_xt"], labels["label_xt"])
            cer_te.ed += int(ed)
            cer_te.length += int(ln)
            ed, ln = cer_counts(preds["pred_swap"], labels["label_xt_swap"])
            cer_te2.ed += int(ed)
            cer_te2.length += int(ln)
        out = {k: v / max(n, 1) for k, v in sums.items()}
        out["cer_te"] = cer_te.value()
        out["cer_te2"] = cer_te2.value()
        self.logger.log(epoch, out, group="eval")
        return out["cer_te"] + out["cer_te2"]

    def _dump_sheet(self, epoch, batch, preds, images) -> None:
        import numpy as np

        from affganwriting_tpu.core.config import VOCAB
        from affganwriting_tpu.eval.sheets import write_sheet

        decode = lambda rows: [VOCAB.decode(r) for r in np.asarray(rows)]  # noqa: E731
        try:
            write_sheet(
                f"{self.logger.path.rsplit('/', 1)[0]}/sheets",
                f"eval_{epoch}",
                np.asarray(images["xg"]),
                decode(preds["pred_xt"]),
                np.asarray(batch["img_xt"]),
                decode(batch["label_xt"]),
                np.asarray(batch["style_imgs"]),
                np.asarray(images["xg_swap"]),
                decode(preds["pred_swap"]),
                decode(batch["label_xt_swap"]),
            )
        except Exception as e:  # sheet dumping must never kill training
            print(f"sheet dump failed: {e}")

    def _plateau_step(self, monitor: float) -> None:
        """ReduceLROnPlateau on R's lr (GAN_word/main_run.py:279): the lr
        is injected optimizer state, so scaling it is a host-side pytree
        edit — no recompile."""
        if self.plateau is None:
            return
        import jax.numpy as jnp

        mul = self.plateau.update(monitor)
        opt_state = self.state.rec.opt_state
        if not hasattr(opt_state, "hyperparams"):   # frozen R: no-op opt
            return
        hp = dict(opt_state.hyperparams)
        hp["learning_rate"] = jnp.asarray(
            self.config.lr_rec * mul, jnp.float32)
        self.state = self.state.replace(
            rec=self.state.rec.replace(
                opt_state=opt_state._replace(hyperparams=hp)))

    def fit(self, epochs: int) -> None:
        # SIGINT -> save a latest checkpoint before exiting (reference
        # line_generation/train.py:75-78); the saved state is the last
        # completed step, so an interrupt loses at most one step
        import signal

        def _sigint(signum, frame):
            print("SIGINT: saving latest checkpoint before exit")
            self.ckpt.save_latest(self.state, self.config)
            raise KeyboardInterrupt

        prev = signal.signal(signal.SIGINT, _sigint)
        try:
            for epoch in range(self.start_epoch, epochs):
                self.train_epoch(epoch)
                if (self.test_data is not None
                        and epoch % self.eval_every == 0):
                    monitor = self.evaluate(epoch)
                    self._plateau_step(monitor)
                    self.ckpt.maybe_save_best(
                        self.state, self.config, monitor)
                    self.early.update(monitor)
                    if self.early.should_stop:
                        print(f"early stop at epoch {epoch} "
                              f"(best {self.early.best:.3f})")
                        break
                if epoch % self.save_every == 0 and epoch > 0:
                    self.ckpt.save_step(self.state, self.config, epoch)
                # re-exec before the runtime's transfer-mirror leak OOMs
                # the host; the relaunch resumes from 'latest'
                from affganwriting_tpu.utils.memwatch import maybe_restart

                maybe_restart(
                    self.restart_rss_gb,
                    lambda: self.ckpt.save_latest(self.state, self.config),
                    label="word-gan")
            self.ckpt.save_latest(self.state, self.config)
        finally:
            signal.signal(signal.SIGINT, prev)
