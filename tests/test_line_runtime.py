"""Line-stack runtime: checkpoint trio + resume, validation loop, SWA
wiring, curriculum valid/eval sets (reference base/base_trainer.py:180-186,
278-311, 340-479; utils/curriculum.py:51-60)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from affganwriting_tpu.core.checkpoint import (
    LineCheckpointManager,
    restore_line_trainer,
)
from affganwriting_tpu.train.curriculum import Curriculum


def test_curriculum_valid_eval_sets():
    c = Curriculum()   # count | no-step,gen | auto,auto-gen | disc ...
    valid = c.get_valid()
    assert valid[-1] == "valid"
    assert "count" in valid and "auto" in valid
    assert not any("gen" in t or "disc" in t for t in valid[:-1])
    ev = c.get_eval()
    assert ev[-1] == "eval"
    assert "gen" in ev and "auto-gen" in ev
    assert not any("disc" in t for t in ev[:-1])


def test_line_checkpoint_trio_and_best(tmp_path):
    mgr = LineCheckpointManager(str(tmp_path / "ck"), keep_periodic=2)
    payload = {"state": {"w": jnp.arange(4, dtype=jnp.float32),
                         "step": jnp.asarray(7, jnp.int32)},
               "swa": {"avg": jnp.ones((4,)),
                       "count": jnp.asarray(3, jnp.int32)}}
    cfg = {"n_class": 80, "lr": 2e-4}
    mgr.save_latest(payload, cfg)
    assert mgr.latest_exists()
    for it in (2, 4, 6):
        mgr.save_step(payload, cfg, it)
    kept = sorted(d for d in os.listdir(tmp_path / "ck")
                  if d.startswith("step_") and not d.endswith(".json"))
    assert len(kept) == 2   # pruned to keep_periodic

    assert mgr.maybe_save_best(payload, cfg, 5.0)
    assert not mgr.maybe_save_best(payload, cfg, 6.0)
    assert mgr.maybe_save_best(payload, cfg, 4.0)

    restored = mgr.restore("latest", payload)
    np.testing.assert_array_equal(
        np.asarray(restored["state"]["w"]), np.arange(4, dtype=np.float32))
    assert int(restored["swa"]["count"]) == 3
    assert mgr.load_config("latest") == cfg

    # best metric survives a new manager on the same dir (resume)
    mgr2 = LineCheckpointManager(str(tmp_path / "ck"))
    assert not mgr2.maybe_save_best(payload, cfg, 4.5)
    assert mgr2.maybe_save_best(payload, cfg, 3.0)


@pytest.mark.slow  # compiles the line lesson steps on the 1-core CPU
def test_line_fit_checkpoints_validates_and_resumes(tmp_path):
    from affganwriting_tpu.data.lines import LineCharset, LineDataset
    from affganwriting_tpu.train.line_trainer import LineGanTrainer

    cs = LineCharset()
    ds = LineDataset(cs, a_batch_size=2, width=256, label_len=24, seed=0)
    val_ds = LineDataset(cs, a_batch_size=2, width=256, label_len=24, seed=1)
    cur = Curriculum({0: [["count"], ["auto"]]})
    trainer = LineGanTrainer(n_class=cs.n_class, max_gen_length=64,
                             seed=0, curriculum=cur)
    first = next(ds.batches(batch_authors=1))
    state = trainer.init_state(first, jax.random.key(0))

    ckpt = LineCheckpointManager(str(tmp_path / "ck"))

    def stream():
        epoch = 0
        while True:
            yield from ds.batches(1, epoch=epoch)
            epoch += 1

    state = trainer.fit(
        state, stream(), 4, ckpt=ckpt, save_every=100,
        save_latest_every=2,
        val_batches_fn=lambda: val_ds.batches(1, epoch=0),
        val_every=2, val_max_batches=1, swa_start=2,
        sheet_every=3, sheet_dir=str(tmp_path / "sheets"))
    assert int(state.step) == 4
    assert ckpt.latest_exists()
    # periodic training sheet dumped (print_images equivalent)
    assert (os.path.exists(tmp_path / "sheets" / "iter_3.png")
            or os.path.exists(tmp_path / "sheets" / "iter_3.png.npy"))
    # validation ran and tracked a best
    assert os.path.exists(tmp_path / "ck" / "best.metric.json")
    # SWA engaged at iteration 2
    assert trainer.swa_state is not None
    assert int(trainer.swa_state["count"]) == 3   # its 2,3,4

    # validate() is deterministic for a fixed state
    v1 = trainer.validate(state, val_ds.batches(1, epoch=0), max_batches=1)
    v2 = trainer.validate(state, val_ds.batches(1, epoch=0), max_batches=1)
    assert v1["val_monitor"] == pytest.approx(v2["val_monitor"], rel=1e-6)
    assert all(np.isfinite(v) for v in v1.values())

    # full resume: trainer + state + swa rebuilt from the checkpoint dir
    trainer2, payload = restore_line_trainer(
        str(tmp_path / "ck"), first, name="latest", curriculum=cur)
    state2 = payload["state"]
    assert int(state2.step) == 4
    # the loop iteration is persisted explicitly (state.step is the lesson
    # step count, which diverges from the iteration clock under no-step /
    # multi-part lessons — reference base_trainer.py:345 saves iteration)
    assert int(payload["iteration"]) == 4
    a = jax.tree.leaves(state.main_params)[0]
    b = jax.tree.leaves(state2.main_params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(payload["swa"]["count"]) == 3
    # continue training from the restored state
    state2 = trainer2.fit(state2, stream(), 6, ckpt=ckpt,
                          save_latest_every=100, swa_state=payload["swa"],
                          swa_start=2,
                          start_iteration=int(payload["iteration"]))
    assert int(state2.step) == 6
    assert int(trainer2.swa_state["count"]) == 5


def test_evaluate_line_cli_importable():
    import affganwriting_tpu.cli.evaluate_line  # noqa: F401


def test_swap_crash_recovery(tmp_path):
    """A crash between the swap's two commit renames leaves only a
    fully-written '<path>.new'; every reader must promote it instead of
    deleting it as stale (core/checkpoint.py:_recover_swap)."""
    ck_dir = tmp_path / "ck"
    mgr = LineCheckpointManager(str(ck_dir))
    payload = {"w": jnp.arange(3, dtype=jnp.float32)}
    cfg = {"lr": 1.0}
    mgr.save_latest(payload, cfg)
    # simulate the crash window: 'latest' removed, complete '.new' left
    os.rename(ck_dir / "latest", ck_dir / "latest.new")

    mgr2 = LineCheckpointManager(str(ck_dir))
    assert mgr2.latest_exists()   # promoted, not lost
    restored = mgr2.restore("latest", payload)
    np.testing.assert_array_equal(
        np.asarray(restored["w"]), np.arange(3, dtype=np.float32))

    # the next save must survive its own swap and leave no residue
    mgr2.save_latest({"w": jnp.arange(3, dtype=jnp.float32) + 1}, cfg)
    r2 = mgr2.restore("latest", payload)
    np.testing.assert_array_equal(
        np.asarray(r2["w"]), np.arange(3, dtype=np.float32) + 1)
    assert not os.path.exists(ck_dir / "latest.new")
    assert not os.path.exists(ck_dir / "latest.old")


def test_pretrained_hwr_splices_into_init_state(tmp_path):
    """--pretrained-hwr loads cli/train_hwr.py's checkpoint into the
    container's frozen recognizer slot (reference hw_with_style.py:182-194)
    instead of leaving the GAN against a random-init HWR."""
    import orbax.checkpoint as ocp

    from affganwriting_tpu.data.lines import LineCharset, LineDataset
    from affganwriting_tpu.models.line.hwr import CNNOnlyHWR
    from affganwriting_tpu.train.line_trainer import LineGanTrainer

    cs = LineCharset()
    ds = LineDataset(cs, a_batch_size=1, width=128, label_len=8, seed=0)
    first = next(ds.batches(batch_authors=2))

    # standalone pretrain artifact, exactly train_hwr.py's save layout
    hwr = CNNOnlyHWR(nclass=cs.n_class, norm="batch")
    variables = jax.jit(hwr.init)(
        jax.random.key(7), jnp.asarray(first["image"]))
    # mark the weights so a splice is distinguishable from a fresh init
    marked = jax.tree.map(lambda x: x + 1.5, variables["params"])
    path = str(tmp_path / "hwr_final")
    ck = ocp.StandardCheckpointer()
    ck.save(path, {"params": marked,
                   "batch_stats": variables.get("batch_stats", {})})
    ck.wait_until_finished()

    tr = LineGanTrainer(n_class=cs.n_class, max_gen_length=32,
                        pretrained_hwr=path)
    assert tr.config_dict["pretrained_hwr"] == path  # rides in checkpoints
    state = tr.init_state(first, jax.random.key(0))
    got = jax.tree.leaves(state.hwr_params)
    want = jax.tree.leaves(marked)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w))


def test_pretrained_ae_splices_into_init_state(tmp_path):
    """--pretrained-ae loads cli/train_auto.py's checkpoint into the frozen
    perceptual-AE slot (reference hw_with_style_trainer.py:139-149) instead
    of leaving the perceptual loss in random-feature space.  The pretrain
    artifact carries the E_HWR CTC head ('newCTC' recipe); the splice must
    take only the plain Autoencoder subtree."""
    import orbax.checkpoint as ocp

    from affganwriting_tpu.data.lines import LineCharset, LineDataset
    from affganwriting_tpu.models.line.autoencoder import Autoencoder
    from affganwriting_tpu.train.line_trainer import LineGanTrainer

    cs = LineCharset()
    ds = LineDataset(cs, a_batch_size=1, width=128, label_len=8, seed=0)
    first = next(ds.batches(batch_authors=2))

    # pretrain artifact with the CTC head, exactly train_auto.py's layout
    ae = Autoencoder(variant="2tight", hwr_classes=cs.n_class)
    variables = jax.jit(ae.init)(
        jax.random.key(7), jnp.asarray(first["image"]))
    marked = jax.tree.map(lambda x: x + 1.5, variables["params"])
    path = str(tmp_path / "ae_final")
    ck = ocp.StandardCheckpointer()
    ck.save(path, {"params": marked})
    ck.wait_until_finished()

    tr = LineGanTrainer(n_class=cs.n_class, max_gen_length=32,
                        pretrained_ae=path)
    assert tr.config_dict["pretrained_ae"] == path  # rides in checkpoints
    state = tr.init_state(first, jax.random.key(0))
    # the GAN's plain-AE tree restored exactly; the head keys dropped
    plain_keys = set(jax.jit(Autoencoder().init)(
        jax.random.key(0), jnp.asarray(first["image"]))["params"])
    assert set(state.ae_params) == plain_keys
    assert plain_keys < set(marked)   # the artifact really had extra keys
    for k in plain_keys:
        got = jax.tree.leaves(state.ae_params[k])
        want = jax.tree.leaves(marked[k])
        assert len(got) == len(want)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w))


def test_validate_zero_batches_has_no_monitor():
    """An empty valid split must not produce val_monitor=0.0 — that would
    be persisted as an unbeatable 'best' metric."""
    from affganwriting_tpu.train.line_trainer import LineGanTrainer

    tr = LineGanTrainer(n_class=10, max_gen_length=32)
    assert tr.validate(None, iter(())) == {}


class _RecordingCkpt:
    def __init__(self):
        self.latest, self.steps, self.best = [], [], []

    def save_latest(self, payload, cfg):
        self.latest.append(int(payload["iteration"]))

    def save_step(self, payload, cfg, it):
        self.steps.append(it)

    def maybe_save_best(self, payload, cfg, metric):
        self.best.append(metric)


def test_fit_latest_cadence_and_swa_resume(monkeypatch):
    """'latest' refreshes on its own cadence even when it collides with a
    periodic save, and a restored ACTIVE SWA average keeps accumulating on
    resume without re-passing swa_start."""
    from types import SimpleNamespace

    from affganwriting_tpu.train.line_trainer import LineGanTrainer

    tr = LineGanTrainer(n_class=10, max_gen_length=32)
    monkeypatch.setattr(
        tr, "train_iteration", lambda state, it, batch: (state, {}))
    state = SimpleNamespace(main_params={"w": jnp.zeros((2,))},
                            step=jnp.asarray(0, jnp.int32))
    ck = _RecordingCkpt()
    swa0 = {"avg": {"w": jnp.ones((2,))}, "count": jnp.asarray(5, jnp.int32)}
    tr.fit(state, iter(range(5)), 4, ckpt=ck,
           save_every=2, save_latest_every=1,
           swa_state=swa0, start_iteration=0)
    assert ck.steps == [2, 4]
    # every iteration refreshed latest, INCLUDING the collisions at 2 and 4
    assert ck.latest[:4] == [1, 2, 3, 4]
    assert int(tr.swa_state["count"]) == 5 + 4
