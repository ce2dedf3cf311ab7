"""End-to-end 1-step training smoke test on synthetic data (SURVEY.md §4d).

Runs the full four-player jit'd step (R -> C -> D -> G updates in one XLA
program) on a 2x2 ('data', 'model') virtual CPU mesh, checking finite
losses, parameter movement in all four players, and determinism.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy on the 1-core CPU harness

from affganwriting_tpu.core.config import default_config
from affganwriting_tpu.data.words import synthetic_word_image
from affganwriting_tpu.core.config import VOCAB
from affganwriting_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
from affganwriting_tpu.train.state import init_state, param_count
from affganwriting_tpu.train.step import make_train_step

CFG = default_config().replace(
    compute_dtype="float32",  # f32 on CPU test; bf16 is the TPU default
    style_encoder="resnet18",
    num_writers=16,
    batch_size=2,
)


def _batch(b=2):
    rng = np.random.default_rng(0)
    style = np.stack(
        [
            np.stack(
                [synthetic_word_image(f"w{i}{j}", i) for j in range(50)],
                axis=-1,
            )
            for i in range(b)
        ]
    ).astype(np.float32)
    lab = lambda w: VOCAB.pad_label(w, CFG.output_max_len)  # noqa: E731
    return {
        "style_imgs": style,
        "img_xt": style[..., :1],
        "writer_ids": np.arange(b, dtype=np.int32),
        "label_xt": np.asarray([lab("deep"), lab("scan")][:b], np.int32),
        "label_xt_swap": np.asarray([lab("dep"), lab("scans")][:b], np.int32),
        "label_ch0": np.asarray([lab("word"), lab("line")][:b], np.int32),
    }


@pytest.fixture(scope="module")
def setup():
    state = init_state(CFG, jax.random.key(0))
    step = jax.jit(make_train_step(CFG), donate_argnums=0)
    return state, step


def test_param_counts(setup):
    state, _ = setup
    counts = param_count(state)
    for k, v in counts.items():
        assert v > 1e5, (k, v)


def test_one_step_finite_and_updates(setup):
    state, step = setup
    batch = _batch()
    before = {
        "gen": jax.tree.leaves(state.gen.params)[0].copy(),
        "dis": jax.tree.leaves(state.dis.params)[0].copy(),
        "cla": jax.tree.leaves(state.cla.params)[0].copy(),
        "rec": jax.tree.leaves(state.rec.params)[0].copy(),
    }
    new_state, metrics, extras = step(state, batch, jax.random.key(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert int(new_state.step) == 1
    after = {
        "gen": jax.tree.leaves(new_state.gen.params)[0],
        "dis": jax.tree.leaves(new_state.dis.params)[0],
        "cla": jax.tree.leaves(new_state.cla.params)[0],
        "rec": jax.tree.leaves(new_state.rec.params)[0],
    }
    for k in before:
        assert not np.allclose(np.asarray(before[k]), np.asarray(after[k])), k
    assert extras["xg"].shape == (2, 64, 216, 1)


def test_sharded_step_runs_on_mesh():
    mesh = make_mesh(jax.devices()[:4], data=2, model=2)
    state = init_state(CFG, jax.random.key(0))
    state = jax.tree.map(lambda x: x, state)  # fresh copy
    sharded_params = shard_params(mesh, state.gen.params)
    state = state.replace(gen=state.gen.replace(params=sharded_params))
    batch = shard_batch(mesh, _batch())
    step = jax.jit(make_train_step(CFG))
    new_state, metrics, _ = step(state, batch, jax.random.key(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))


def test_phased_step_matches_monolith(setup):
    """make_phased_train_step is the SAME update as make_train_step, split
    into four chained programs (the TPU-fast trainer path).  Metrics must
    agree up to float reassociation — R free-runs on the fakes, so an
    fp-epsilon change can flip a greedy argmax and discretely move l_rec
    (the same sensitivity the reference has under cudnn.benchmark); the
    tolerance reflects that, and updated params must move identically to
    first order."""
    from affganwriting_tpu.train.step import make_phased_train_step

    _, step = setup
    batch = _batch()
    # fresh state: the fixture's may hold donated buffers on some backends
    s1, m1, e1 = step(init_state(CFG, jax.random.key(0)), batch,
                      jax.random.key(3))

    state2 = init_state(CFG, jax.random.key(0))
    # snapshot BEFORE stepping: the phased step donates the player states
    before = {name: np.asarray(
        jax.tree.leaves(getattr(state2, name).params)[0])
        for name in ("gen", "dis", "cla", "rec")}
    phased = make_phased_train_step(CFG)
    s2, m2, e2 = phased(state2, batch, jax.random.key(3))

    for k in m1:
        a, b = float(m1[k]), float(m2[k])
        assert abs(a - b) / (abs(a) + 1e-9) < 2e-2, (k, a, b)
    assert e2["xg"].shape == e1["xg"].shape
    assert int(s2.step) == 1
    # all four players moved
    for name, p0 in before.items():
        p1 = jax.tree.leaves(getattr(s2, name).params)[0]
        assert not np.allclose(np.asarray(p1), p0), name


def test_merged_dg_step_matches_phased(setup):
    """merge_dg=True fuses the D and G phases with ONE shared pair forward
    (jax.vjp residual sharing): same fakes, same D update, and G's
    chain-rule-through-image-cotangents gradient is the same Jacobian
    product XLA computes for the recomputed forward (verified leafwise to
    rel<1e-3 on all 149 gen leaves).  Compared under SGD like the DP
    equivalence test — Adam sign-normalizes numerically-zero gradients,
    turning fp reassociation noise into full-lr sign flips."""
    from affganwriting_tpu.train.step import make_phased_train_step

    cfg = CFG.replace(optimizer="sgd")
    batch = _batch()
    phased = make_phased_train_step(cfg)
    s1, m1, e1 = phased(init_state(cfg, jax.random.key(0)), batch,
                        jax.random.key(3))

    merged = make_phased_train_step(cfg, merge_dg=True)
    s2, m2, e2 = merged(init_state(cfg, jax.random.key(0)), batch,
                        jax.random.key(3))

    for k in m1:
        a, b = float(m1[k]), float(m2[k])
        assert abs(a - b) / (abs(a) + 1e-9) < 1e-3, (k, a, b)
    np.testing.assert_allclose(
        np.asarray(e2["xg"]), np.asarray(e1["xg"]), rtol=1e-5, atol=1e-5)
    # every player's updated params agree to fp tolerance (SGD: the
    # update IS the gradient, so this compares the actual Jacobians)
    for name in ("gen", "dis", "cla", "rec"):
        for p1, p2 in zip(jax.tree.leaves(getattr(s1, name).params),
                          jax.tree.leaves(getattr(s2, name).params)):
            np.testing.assert_allclose(
                np.asarray(p2), np.asarray(p1), rtol=5e-4, atol=5e-4,
                err_msg=name)
