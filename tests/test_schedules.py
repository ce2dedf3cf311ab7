"""LR-schedule family, name-based param groups, plateau scaler, SIGINT save
(reference base_trainer.py:49-166, train.py:75-78, main_run.py:279)."""

import os
import signal

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from affganwriting_tpu.train.schedules import (
    PlateauScaler,
    make_schedule,
    partition_labels,
    partitioned_optimizer,
)


def _v(f, step):
    return float(f(jnp.asarray(step, jnp.float32)))


def test_schedule_lambdas_match_reference_formulas():
    it = 10_000
    # LR_test: linear ramp 1e-6 -> 1
    f = make_schedule("LR_test", it)
    assert _v(f, 0) == pytest.approx(1e-6)
    assert _v(f, it) == pytest.approx(1.0, abs=1e-5)

    # cyclic: sawtooth from 1 down to min_lr_mul over cycle_size
    f = make_schedule("cyclic", it, min_lr_mul=0.001, cycle_size=500)
    assert _v(f, 1) == pytest.approx(1.0)
    assert _v(f, 500) == pytest.approx(0.001, abs=1e-5)

    # cyclic-full: rises on even cycles, falls on odd
    f = make_schedule("cyclic-full", it, min_lr_mul=0.25, cycle_size=500)
    assert _v(f, 0) == pytest.approx(0.25)
    assert _v(f, 499) == pytest.approx(1.0, abs=2e-3)
    assert _v(f, 500) == pytest.approx(1.0)
    assert _v(f, 999) == pytest.approx(0.25, abs=2e-3)

    # 1cycle: rise, fall, trail off to min
    f = make_schedule("1cycle", it, low_lr_mul=0.25, min_lr_mul=1e-4,
                      cycle_size=1000)
    assert _v(f, 0) == pytest.approx(0.25)
    assert _v(f, 999) == pytest.approx(1.0, abs=1e-2)
    assert _v(f, 1999) < 0.26
    assert _v(f, it - 1) < 0.25

    # rampup
    f = make_schedule("rampup", it, warmup_steps=100)
    assert _v(f, 0) == pytest.approx(1e-5, abs=1e-6)
    assert _v(f, 100) == pytest.approx(1.0)
    assert _v(f, 5000) == pytest.approx(1.0)

    # detector warmup: rises then decays
    f = make_schedule("detector", it, warmup_steps=100)
    assert _v(f, 0) < _v(f, 99)
    assert _v(f, 99) > _v(f, 5000)

    with pytest.raises(ValueError):
        make_schedule("bogus", it)


def test_partition_labels_substring_semantics():
    params = {
        "generator": {"w": jnp.zeros(2)},
        "gen_deform": {"w": jnp.zeros(2)},
        "hwr": {"w": jnp.zeros(2)},
        "style": {"w": jnp.zeros(2)},
    }
    labels = partition_labels(
        params, slow_patterns=("gen_deform",), freeze_patterns=("hwr",))
    assert labels["generator"]["w"] == "main"
    assert labels["gen_deform"]["w"] == "slow"
    assert labels["hwr"]["w"] == "frozen"
    # freeze wins over slow when both match
    labels2 = partition_labels(
        params, slow_patterns=("hwr",), freeze_patterns=("hwr",))
    assert labels2["hwr"]["w"] == "frozen"


def test_partitioned_optimizer_slow_group_runs_at_tenth_lr():
    params = {"fast": jnp.ones((4,)), "slow_w": jnp.ones((4,)),
              "frozen_w": jnp.ones((4,))}
    tx = partitioned_optimizer(
        base_lr=1.0, iterations=100, params=params,
        slow_patterns=("slow_",), freeze_patterns=("frozen_",),
        b1=0.9, b2=0.999)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    upd, _ = tx.update(grads, state, params)
    # adam first step gives a fixed-size step ~ -lr regardless of grads
    fast = float(jnp.abs(upd["fast"]).mean())
    slow = float(jnp.abs(upd["slow_w"]).mean())
    frozen = float(jnp.abs(upd["frozen_w"]).max())
    assert frozen == 0.0
    assert slow == pytest.approx(fast * 0.1, rel=1e-3)


def test_plateau_scaler():
    p = PlateauScaler(factor=0.1, patience=2)
    assert p.update(10.0) == 1.0   # first -> best
    assert p.update(9.0) == 1.0    # improves
    assert p.update(9.5) == 1.0    # bad 1
    assert p.update(9.5) == 1.0    # bad 2
    assert p.update(9.5) == pytest.approx(0.1)  # bad 3 > patience -> drop


@pytest.mark.slow
def test_line_trainer_uses_schedule_and_groups():
    """End of the wiring: a trainer built with a schedule + slow names
    produces a multi_transform optimizer whose state initializes."""
    from affganwriting_tpu.data.lines import LineCharset, LineDataset
    from affganwriting_tpu.train.line_trainer import LineGanTrainer

    cs = LineCharset()
    ds = LineDataset(cs, a_batch_size=2, width=256, label_len=24, seed=0)
    trainer = LineGanTrainer(
        n_class=cs.n_class, max_gen_length=64, seed=0,
        lr_schedule="rampup", iterations=1000,
        slow_param_names=("spacer",), schedule_kw={"warmup_steps": 10})
    batch = next(ds.batches(batch_authors=1, epoch=0))
    state = trainer.init_state(batch, jax.random.key(0))
    # the optimizer is a multi_transform: its state carries per-group parts
    assert state.main_opt is not None
    from affganwriting_tpu.train.schedules import partition_labels

    labels = partition_labels(state.main_params, ("spacer",), ())
    flat = jax.tree.leaves(labels)
    assert "slow" in flat and "main" in flat


def test_sigint_saves_checkpoint(tmp_path):
    """SIGINT mid-fit lands a latest checkpoint (train.py:75-78).

    Uses a stub train_epoch so the test exercises exactly the signal
    wiring + checkpoint write, not a full CPU model compile.
    """
    from affganwriting_tpu.core.checkpoint import CheckpointManager
    from affganwriting_tpu.core.config import default_config
    from affganwriting_tpu.train.loop import EarlyStopping, WordGanTrainer

    trainer = WordGanTrainer.__new__(WordGanTrainer)
    trainer.config = default_config()
    trainer.ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    trainer.test_data = None
    trainer.plateau = None
    trainer.early = EarlyStopping(20)
    trainer.start_epoch = 0
    trainer.save_every = 10**9
    trainer.state = {"w": jnp.zeros((2,))}

    calls = {"n": 0}

    def epoch_then_interrupt(epoch):
        calls["n"] += 1
        os.kill(os.getpid(), signal.SIGINT)

    trainer.train_epoch = epoch_then_interrupt
    with pytest.raises(KeyboardInterrupt):
        trainer.fit(5)
    assert calls["n"] == 1
    assert trainer.ckpt.latest_exists()


def test_plateau_step_rescales_injected_lr(tmp_path):
    """_plateau_step edits R's injected learning rate in place
    (main_run.py:279 equivalence)."""
    import optax

    from affganwriting_tpu.core.checkpoint import CheckpointManager
    from affganwriting_tpu.core.config import default_config
    from affganwriting_tpu.train.loop import EarlyStopping, WordGanTrainer
    from affganwriting_tpu.train.schedules import PlateauScaler

    import flax.struct

    @flax.struct.dataclass
    class P:
        opt_state: object

        def replace(self, **kw):
            return P(**kw)

    @flax.struct.dataclass
    class S:
        rec: object

        def replace(self, **kw):
            return S(**kw)

    cfg = default_config()
    opt = optax.inject_hyperparams(optax.adam)(
        learning_rate=cfg.lr_rec)
    params = {"w": jnp.zeros((2,))}
    opt_state = opt.init(params)

    trainer = WordGanTrainer.__new__(WordGanTrainer)
    trainer.config = cfg
    trainer.plateau = PlateauScaler(factor=0.1, patience=0)
    trainer.state = S(rec=P(opt_state=opt_state))

    trainer._plateau_step(10.0)   # first: best
    lr0 = float(trainer.state.rec.opt_state.hyperparams["learning_rate"])
    assert lr0 == pytest.approx(cfg.lr_rec)
    trainer._plateau_step(11.0)   # worse, patience 0 -> drop 10x
    lr1 = float(trainer.state.rec.opt_state.hyperparams["learning_rate"])
    assert lr1 == pytest.approx(cfg.lr_rec * 0.1)
