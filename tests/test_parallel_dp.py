"""DP correctness: the mesh-sharded step IS the single-device step.

The framework's north-star contract (BASELINE.json): data-parallel training
over the mesh's 'data' axis with psum gradient sync must reproduce
single-device training.  The SAME four-player step runs once unsharded and
once batch-sharded over all 8 virtual CPU devices with the same batch and
key; losses and updated params must agree up to float reassociation.  The
trainers themselves (word + line) then run on the mesh end-to-end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from affganwriting_tpu.core.config import VOCAB, default_config
from affganwriting_tpu.parallel.mesh import (
    make_mesh,
    parse_mesh_spec,
    shard_batch,
    shard_state,
)
from affganwriting_tpu.train.state import init_state
from affganwriting_tpu.train.step import make_train_step

# the dryrun_multichip config (tiny dims, full program structure)
CFG = default_config().replace(
    compute_dtype="float32",
    style_encoder="cnn",
    img_height=32,
    img_width=104,
    num_writers=8,
    batch_size=8,
    max_chars=10,
    style_dim=64,
    adain_param_dim=512,
    text_embed_dim=16,
    rec_hidden=64,
    rec_embed=16,
    attn_filters=16,
    dis_layers=3,
    dis_final_size=64,
)


def _batch(b=8):
    rng = np.random.default_rng(0)
    lab = lambda w: VOCAB.pad_label(w, CFG.output_max_len)  # noqa: E731
    return {
        "style_imgs": rng.normal(size=(
            b, CFG.img_height, CFG.img_width,
            CFG.style_stack)).astype(np.float32),
        "img_xt": rng.normal(size=(
            b, CFG.img_height, CFG.img_width, 1)).astype(np.float32),
        "writer_ids": (np.arange(b) % CFG.num_writers).astype(np.int32),
        "label_xt": np.asarray([lab("deep")] * b, np.int32),
        "label_xt_swap": np.asarray([lab("dep")] * b, np.int32),
        "label_ch0": np.asarray([lab("word")] * b, np.int32),
    }


@pytest.mark.slow  # compile-heavy on the 1-core CPU harness
def test_word_dp_equivalence():
    """SGD makes this a direct GRADIENT equivalence test: the updated
    param is p - lr*g, so sharded-vs-single param agreement bounds the
    gradient disagreement at reassociation noise.  (Adam is unusable here:
    its first step is +/-lr*sign(g), and numerically-zero grads on
    zero-init leaves get reassociation-determined signs.)"""
    assert len(jax.devices()) >= 8
    cfg = CFG.replace(optimizer="sgd")
    state0 = init_state(cfg, jax.random.key(0))
    step = jax.jit(make_train_step(cfg))   # no donation: state reused
    batch = _batch()
    key = jax.random.key(1)

    new1, m1, _ = step(state0, batch, key)

    mesh = make_mesh(jax.devices()[:8], data=8, model=1)
    state_s = shard_state(mesh, state0)
    batch_s = shard_batch(mesh, batch)
    new2, m2, _ = step(state_s, batch_s, key)

    # step-1 losses: identical up to reassociation (measured on this
    # config: worst rel 4.4e-6 on l_rec; a genuinely different computation
    # — e.g. changed dropout masks — moves l_rec by ~1e-2)
    for k in m1:
        a, b = float(m1[k]), float(m2[k])
        assert np.isfinite(a) and np.isfinite(b), (k, a, b)
        np.testing.assert_allclose(a, b, rtol=5e-5, atol=1e-5, err_msg=k)
    # updated params (p - lr*g) agree in every player => the psum'd DP
    # gradients equal the single-device gradients.  Per-player atol is the
    # measured sharded-vs-single floor x ~4 margin: dis/cla (shallow, no
    # scan) agree to 7e-9; rec to 9e-7; gen grads flow through R's 11-step
    # scan backprop + softmax at loss ~60 and reassociate to 1.3e-3 —
    # still 10x BELOW the ~1.4e-2 scale of a real computation change.
    for player, atol in (("gen", 5e-3), ("dis", 1e-7),
                         ("cla", 1e-7), ("rec", 5e-6)):
        l1 = jax.tree.leaves(getattr(new1, player).params)
        l2 = jax.tree.leaves(getattr(new2, player).params)
        for a, b in zip(l1, l2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=atol,
                err_msg=player)

    # step 2 from the step-1 states: real divergence would compound fast
    _, m1b, _ = step(new1, batch, jax.random.key(2))
    _, m2b, _ = step(new2, batch_s, jax.random.key(2))
    for k in m1b:
        np.testing.assert_allclose(
            float(m1b[k]), float(m2b[k]), rtol=2e-2, atol=1e-4, err_msg=k)


@pytest.mark.slow  # compile-heavy on the 1-core CPU harness
def test_word_tp_equivalence():
    """TP is pinned numerically, not just executed: the same word step on
    a data=4 x model=2 mesh (text-encoder FC pyramid + mix sharded over
    'model', parallel/mesh.py _TP_RULES) must reproduce the single-device
    step — the TP matmul partial-sums are a reassociation of the same
    contraction."""
    assert len(jax.devices()) >= 8
    cfg = CFG.replace(optimizer="sgd")
    state0 = init_state(cfg, jax.random.key(0))
    step = jax.jit(make_train_step(cfg))   # no donation: state reused
    batch = _batch()
    key = jax.random.key(1)

    new1, m1, _ = step(state0, batch, key)

    mesh = make_mesh(jax.devices()[:8], data=4, model=2)
    state_s = shard_state(mesh, state0)
    # the TP rules actually partitioned something: a sharded fc kernel
    # lives split over 'model' (this is what the expect_tp check guards)
    fc_leaf = state_s.gen.params["text_encoder"]["fc1"]["kernel"]
    assert fc_leaf.sharding.spec[-1] == "model", fc_leaf.sharding
    batch_s = shard_batch(mesh, batch)
    new2, m2, _ = step(state_s, batch_s, key)

    for k in m1:
        a, b = float(m1[k]), float(m2[k])
        assert np.isfinite(a) and np.isfinite(b), (k, a, b)
        np.testing.assert_allclose(a, b, rtol=5e-5, atol=1e-5, err_msg=k)
    # per-player atol: same floors as the DP test (gen's grads cross R's
    # scan backprop; the TP psum adds one more reassociation)
    for player, atol in (("gen", 5e-3), ("dis", 5e-7),
                         ("cla", 5e-7), ("rec", 5e-6)):
        l1 = jax.tree.leaves(getattr(new1, player).params)
        l2 = jax.tree.leaves(getattr(new2, player).params)
        for a, b in zip(l1, l2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=atol,
                err_msg=player)


def test_tp_rule_drift_fails_loudly():
    """A param tree with no TP-rule matches on a model>1 mesh must raise
    instead of silently replicating (shard_state / expect_tp)."""
    from affganwriting_tpu.parallel.mesh import shard_params

    mesh = make_mesh(jax.devices()[:8], data=4, model=2)
    no_match = {"encoder": {"conv1": {"kernel": jnp.zeros((3, 3, 4, 8))}}}
    with pytest.raises(ValueError, match="_TP_RULES"):
        shard_params(mesh, no_match, expect_tp=True)
    # without the expectation (legitimately replicated trees) it places
    out = shard_params(mesh, no_match)
    assert jax.tree.leaves(out)[0].sharding.is_fully_replicated


@pytest.mark.slow  # compile-heavy on the 1-core CPU harness
def test_word_trainer_on_mesh(tmp_path):
    from affganwriting_tpu.data.iam import (
        default_reference_paths,
        load_corpus,
        parse_groundtruth,
        writer_label_map,
    )
    from affganwriting_tpu.data.words import WordStyleDataset
    from affganwriting_tpu.train.loop import WordGanTrainer

    cfg = CFG.replace(style_stack=8, num_writers=500)
    paths = default_reference_paths()
    tr = parse_groundtruth(paths["train_gt"])
    small = dict(list(tr.items())[:8])
    corpus = load_corpus(paths["corpus"])[:100]
    ds = WordStyleDataset(small, writer_label_map(tr), cfg,
                          corpus=corpus, seed=0)
    mesh = parse_mesh_spec("8")
    trainer = WordGanTrainer(cfg, ds, None, logdir=str(tmp_path / "run"),
                             save_latest_every_steps=10_000, mesh=mesh)
    # params actually live on the mesh
    leaf = jax.tree.leaves(trainer.state.gen.params)[0]
    assert leaf.sharding.mesh.shape == mesh.shape
    out = trainer.train_epoch(0)
    assert np.isfinite(out["l_total"])


@pytest.mark.slow  # compile-heavy on the 1-core CPU harness
def test_line_trainer_on_mesh():
    from affganwriting_tpu.data.lines import LineCharset, LineDataset

    cs = LineCharset()
    ds = LineDataset(cs, a_batch_size=2, width=256, label_len=24, seed=0)
    from affganwriting_tpu.train.line_trainer import LineGanTrainer

    mesh = parse_mesh_spec("8")
    trainer = LineGanTrainer(n_class=cs.n_class, max_gen_length=64,
                             seed=0, mesh=mesh)
    batches = ds.batches(batch_authors=4, epoch=0)  # 4 x 2 = 8 lines
    first = next(batches)
    state = trainer.init_state(first, jax.random.key(0))
    leaf = jax.tree.leaves(state.main_params)[0]
    assert leaf.sharding.mesh.shape == mesh.shape
    # one auto iteration and one disc iteration, sharded
    state, m_auto = trainer.train_iteration(state, 2, first)   # auto lesson
    state, m_disc = trainer.train_iteration(state, 3, first)   # disc lesson
    for m in (m_auto, m_disc):
        assert m and all(np.isfinite(v) for v in m.values()), m


def test_parse_mesh_spec():
    assert parse_mesh_spec("none") is None
    assert parse_mesh_spec("") is None
    m = parse_mesh_spec("4x2")
    assert m.shape == {"data": 4, "model": 2}
    m = parse_mesh_spec("auto")
    assert m.shape["data"] == len(jax.devices())


@pytest.mark.slow  # two pipeline compiles (single + sharded) on 1-core CPU
def test_sharded_inference_pipeline_matches_single_device():
    """Serving scale-out (gen/inference.py:make_sharded_pipeline): the
    DP-sharded generate+recognize pipeline reproduces the single-device
    pipeline bitwise-ish — per-sample math (convs, INs, free-running
    decode) is untouched by batch partitioning — and the outputs really
    live on all 8 devices."""
    from affganwriting_tpu.gen.inference import (
        encode_labels,
        make_generate_and_read_fn,
        make_sharded_pipeline,
    )
    from affganwriting_tpu.train.state import build_models

    assert len(jax.devices()) >= 8
    gen, _, _, rec = build_models(CFG)
    rng = np.random.default_rng(3)
    style = np.asarray(
        rng.normal(size=(1, CFG.img_height, CFG.img_width,
                         CFG.style_stack)), np.float32)
    labels = encode_labels(
        ["word", "deep", "mesh", "chip", "data", "axis", "text", "pens"],
        CFG.output_max_len)
    gen_vars = jax.jit(gen.init)(jax.random.key(0), style, labels[:1])
    img0 = np.zeros((1, CFG.img_height, CFG.img_width, 1), np.float32)
    rec_vars = jax.jit(rec.init)(jax.random.key(1), img0, labels[:1])

    base = make_generate_and_read_fn(CFG)
    imgs0, preds0 = base(gen_vars, rec_vars, style, labels)

    mesh = make_mesh(jax.devices()[:8], data=8, model=1)
    run = make_sharded_pipeline(CFG, mesh)
    imgs1, preds1 = run(gen_vars, rec_vars, style, labels)

    assert len(imgs1.sharding.device_set) == 8
    assert len(preds1.sharding.device_set) == 8
    np.testing.assert_allclose(
        np.asarray(imgs0), np.asarray(imgs1), rtol=0, atol=2e-5)
    # free-running decode is discrete; identical per-sample math produces
    # identical tokens — but GSPMD may fuse the per-shard batch
    # differently, so allow a tiny argmax near-tie budget at these
    # random-init weights (<=2% of tokens) instead of exact equality
    _assert_tokens_agree(preds0, preds1, budget=0.02)

    # a batch that does not divide over the data axis fails loudly
    with pytest.raises(ValueError, match="does not divide"):
        run.shard_labels(labels[:6])

    # TP form: data=4 x model=2 reproduces the same outputs (the sharded
    # fc contractions are a reassociation of the same matmuls)
    mesh2 = make_mesh(jax.devices()[:8], data=4, model=2)
    run2 = make_sharded_pipeline(CFG, mesh2)
    imgs2, preds2 = run2(gen_vars, rec_vars, style, labels)
    np.testing.assert_allclose(
        np.asarray(imgs0), np.asarray(imgs2), rtol=0, atol=2e-5)
    _assert_tokens_agree(preds0, preds2, budget=0.02)


def _assert_tokens_agree(a, b, budget: float = 0.02):
    a, b = np.asarray(a), np.asarray(b)
    assert a.shape == b.shape
    frac = float(np.mean(a != b))
    assert frac <= budget, f"token disagreement {frac:.4f} > {budget}"
