"""Line-GAN training runtime: lesson steps, loss balancing, style bank.

Rebuild of line_generation/trainer/hw_with_style_trainer.py +
base/base_trainer.py as a small set of jit'd lesson steps selected host-side
by the curriculum (SURVEY.md §7.3 — "4-6 distinct compiled steps"):

  * ``auto``  — autoencode: style-extract, regenerate on the DTW-spaced
    label, L1 + AE-encoder perceptual loss (trainer:542-621, 735-758);
  * ``count`` — spacer MSE against DTW-derived blank/duplicate counts
    (trainer:626-729);
  * ``gen``   — hinge G loss + CTC on the generated line via the frozen
    recognizer (trainer:566-590, 769-831), styles drawn from a bank of
    recent styles with interpolation/extrapolation sampling (:113-128);
  * ``disc``  — hinge D loss on real vs generated/reconstructed (:798-816).

The reference's gradient-stash loss-balancing hack (:309-386, arXiv
1903.00277) becomes explicit per-loss grads rescaled by mean-|grad| ratios
inside the gen step.  Optimizers: Adam(2e-4, betas (0.5, 0.999)) for the
main tree and the discriminator (the active config's settings); the HWR and
perceptual AE are frozen inputs.
"""

from __future__ import annotations

from typing import Any, Iterator, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from affganwriting_tpu.models.line.autoencoder import Autoencoder
from affganwriting_tpu.models.line.container import HWWithStyle
from affganwriting_tpu.models.line.discriminator import DiscriminatorAP
from affganwriting_tpu.ops.dtw import correct_pred
from affganwriting_tpu.train.curriculum import Curriculum


@flax.struct.dataclass
class LineState:
    step: jnp.ndarray
    main_params: Any          # style extractor + spacer + generator
    hwr_params: Any           # frozen recognizer
    model_stats: Any          # frozen batch_stats (the BatchNorm HWR)
    disc_params: Any
    disc_stats: Any           # spectral-norm u/sigma state
    ae_params: Any            # frozen perceptual AE
    main_opt: Any
    disc_opt: Any


def hinge_d_real(scores):
    return jnp.mean(jax.nn.relu(1.0 - scores.astype(jnp.float32)))


def hinge_d_fake(scores):
    return jnp.mean(jax.nn.relu(1.0 + scores.astype(jnp.float32)))


def hinge_g(scores):
    return -jnp.mean(scores.astype(jnp.float32))


def balance_combine(base_grads, saved: list):
    """Per-parameter gradient balancing (arXiv 1903.00277, reference
    hw_with_style_trainer.py:309-386): for each saved-loss gradient R and
    each leaf i, add ``x * R_i * (abmean(D_i) / abmean(R_i))`` to the base
    gradient D — so every auxiliary loss contributes at x times the base
    loss's per-parameter gradient scale.  Zero-mean D leaves fall back to
    the mean of the nonzero abmeans (:331-337); zero-mean R leaves are
    skipped (:383).

    ``saved`` is a list of (grad_tree, multiplier) pairs.
    """
    d_leaves, treedef = jax.tree.flatten(base_grads)
    d_means = [jnp.mean(jnp.abs(x)) for x in d_leaves]
    total = sum(d_means)
    count = sum((m > 0).astype(jnp.float32) for m in d_means)
    nonzero = total / jnp.maximum(count, 1.0)
    d_means = [jnp.where(m == 0.0, nonzero, m) for m in d_means]

    out = list(d_leaves)
    for grads, mult in saved:
        r_leaves = jax.tree.leaves(grads)
        for i, (r, dm) in enumerate(zip(r_leaves, d_means)):
            rm = jnp.mean(jnp.abs(r))
            scale = jnp.where(rm > 0, dm / jnp.maximum(rm, 1e-30), 0.0)
            out[i] = out[i] + mult * r * scale
    return jax.tree.unflatten(treedef, out)


def ctc_loss(log_probs, labels, label_lengths):
    """log_probs (B, T, K), blank=0; labels (B, N) padded with 0."""
    b, t, _ = log_probs.shape
    logit_paddings = jnp.zeros((b, t), jnp.float32)
    n = labels.shape[1]
    label_paddings = (
        jnp.arange(n)[None, :] >= label_lengths[:, None]).astype(jnp.float32)
    per = optax.ctc_loss(log_probs, logit_paddings, labels, label_paddings)
    # CTC inf guard (model/loss.py:28-30): zero out infinite losses
    per = jnp.where(jnp.isfinite(per), per, 0.0)
    return jnp.mean(per)


def _splice_pretrained_hwr(path: str, hwr_init: Any, model_stats: Any):
    """Load a ``cli/train_hwr.py`` checkpoint ({"params", "batch_stats"} of
    the standalone recognizer) into the container's ``hwr`` slot
    (reference hw_with_style.py:182-194: ``model.pretrained_hwr`` weights
    loaded into the frozen recognizer).  Shapes must match the init tree —
    same arch/norm/n_class as the pretrainer."""
    import os

    import orbax.checkpoint as ocp

    hwr_stats_init = (model_stats or {}).get("hwr", {})
    sh = jax.sharding.SingleDeviceSharding(jax.devices()[0])
    target = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(
            jnp.shape(x), jnp.result_type(x), sharding=sh),
        {"params": hwr_init, "batch_stats": hwr_stats_init})
    restored = ocp.StandardCheckpointer().restore(
        os.path.abspath(path), target)
    new_stats = dict(model_stats) if model_stats else {}
    if restored.get("batch_stats"):
        new_stats["hwr"] = restored["batch_stats"]
    return restored["params"], new_stats


def _splice_pretrained_ae(path: str, ae_init: Any):
    """Load a ``cli/train_auto.py`` checkpoint ({"params"} of the trained
    perceptual autoencoder) into the frozen AE slot (reference
    hw_with_style_trainer.py:139-149: the AutoTrainer snapshot's encoder
    weights are loaded and frozen; the perceptual distance runs in that
    trained feature space, :735-758).  The 'newCTC' pretrain carries an
    extra E_HWR head the GAN never applies — only the param groups present
    in the plain ``Autoencoder()`` init tree are taken."""
    import os

    import orbax.checkpoint as ocp

    restored = ocp.StandardCheckpointer().restore(os.path.abspath(path))
    saved = restored["params"]
    missing = [k for k in ae_init if k not in saved]
    if missing:
        raise ValueError(
            f"pretrained AE at {path} lacks param groups {missing}; "
            "was it trained with a different --variant?")
    spliced = {k: saved[k] for k in ae_init}
    jax.tree.map(
        lambda i, s: (_ for _ in ()).throw(ValueError(
            f"pretrained AE shape {jnp.shape(s)} != init {jnp.shape(i)}"))
        if jnp.shape(i) != jnp.shape(s) else None, ae_init, spliced)
    return jax.tree.map(
        lambda i, s: jnp.asarray(s, jnp.result_type(i)), ae_init, spliced)


class StyleBank:
    """Last-N styles with interpolated (extrapolated) sampling
    (hw_with_style_trainer.py:113-128, 984-998; 'extra-0.5')."""

    def __init__(self, size: int = 100, extra: float = 0.5, seed: int = 0):
        self.size = size
        self.extra = extra
        self.bank: list[np.ndarray] = []
        self.rng = np.random.default_rng(seed)

    def add(self, styles: np.ndarray):
        for s in np.asarray(styles):
            self.bank.append(s)
        self.bank = self.bank[-self.size:]

    def sample(self, n: int) -> Optional[np.ndarray]:
        if len(self.bank) < 2:
            return None
        out = []
        for _ in range(n):
            i, j = self.rng.integers(len(self.bank), size=2)
            u = self.rng.uniform(-self.extra, 1.0 + self.extra)
            out.append(self.bank[i] + u * (self.bank[j] - self.bank[i]))
        return np.stack(out).astype(np.float32)


class LineGanTrainer:
    def __init__(self, n_class: int = 80, style_dim: int = 128,
                 max_gen_length: int = 128, lr: float = 2e-4,
                 curriculum: Optional[Curriculum] = None, seed: int = 0,
                 balance_loss: bool = True, hwr_norm: str = "batch",
                 lr_schedule: str | bool = "none", iterations: int = 240_000,
                 slow_param_names: tuple = (), freeze_param_names: tuple = (),
                 schedule_kw: Optional[dict] = None, mesh=None,
                 pretrained_hwr: str | None = None,
                 pretrained_ae: str | None = None,
                 char_style_dim: int = 0):
        # Multi-chip DP: params replicate over the mesh, every lesson batch
        # shards its leading axis over 'data', GSPMD psums the gradients —
        # the same jit lesson steps serve 1 and N chips (SURVEY.md §5.8)
        self.mesh = mesh
        # constructor config, embedded in checkpoints so generate/REPL/app
        # can rebuild the exact model from a checkpoint alone (the
        # reference relies on this: generate.py:88-97, app.py:65-77)
        self.config_dict = dict(
            n_class=n_class, style_dim=style_dim,
            max_gen_length=max_gen_length, lr=lr, seed=seed,
            balance_loss=balance_loss, hwr_norm=hwr_norm,
            lr_schedule=lr_schedule, iterations=iterations,
            slow_param_names=list(slow_param_names),
            freeze_param_names=list(freeze_param_names),
            schedule_kw=dict(schedule_kw or {}),
            pretrained_hwr=pretrained_hwr,
            pretrained_ae=pretrained_ae,
            char_style_dim=char_style_dim)
        # the reference's pretrained+frozen recognizer (hw_with_style.py:
        # 182-194, config model.pretrained_hwr + hwr_frozen): a path saved
        # by cli/train_hwr.py ("hwr_final").  Spliced into the hwr slot at
        # init_state; checkpoints carry the weights themselves, so resume
        # never re-reads the path.
        self.pretrained_hwr = pretrained_hwr
        # the reference's pretrained+frozen perceptual AE (trainer
        # encoder_weights, hw_with_style_trainer.py:139-149): a path saved
        # by cli/train_auto.py ("ae_final"), spliced at init_state.
        self.pretrained_ae = pretrained_ae
        self.model = HWWithStyle(
            n_class=n_class, style_dim=style_dim,
            max_gen_length=max_gen_length, hwr_norm=hwr_norm,
            char_style_dim=char_style_dim)
        self.disc = DiscriminatorAP(dim=64, use_low=True, use_med=True)
        self.ae = Autoencoder()
        self.curriculum = curriculum or Curriculum()
        self.style_bank = StyleBank(seed=seed)
        self.balance_loss = balance_loss
        # iteration-scheduled per-slot balance multipliers; active config
        # value from cf_IAMslant_...sMG.json: {"0": [0.6, 0.5, 0.4, 0.75]}
        # — indexed by saved_grads stash order within a curriculum cycle
        # (hw_with_style_trainer.py:310-346, 378-386): slot 0 the no-step
        # gen lesson's recog-CTC grads, slot 1 its adversarial grads,
        # slot 2 the auto lesson's recon-adv (autoGen) grads
        self.balance_var_x: dict[int, tuple] = {0: (0.6, 0.5, 0.4, 0.75)}
        # deferred no-step gen gradients awaiting the next auto step
        self._saved_grads: tuple | None = None
        self.n_class = n_class
        self.max_gen_length = max_gen_length
        # main optimizer: schedule family + name-based slow/frozen groups
        # (base_trainer.py:49-110, 113-166); built lazily in init_state
        # (the label tree needs the param pytree)
        self._opt_cfg = dict(
            base_lr=lr, iterations=iterations, schedule=lr_schedule,
            slow_patterns=tuple(slow_param_names),
            freeze_patterns=tuple(freeze_param_names),
            **(schedule_kw or {}))
        self.main_opt = optax.adam(lr, b1=0.5, b2=0.999)  # rebound at init
        self.disc_opt = optax.adam(lr, b1=0.5, b2=0.999)
        self.rng = jax.random.key(seed)
        self._build_steps()

    # ----- init -----
    def init_state(self, sample_batch: dict, key: jax.Array) -> LineState:
        img = jnp.asarray(sample_batch["image"])
        label = jnp.asarray(sample_batch["label"])
        lengths = jnp.asarray(sample_batch["label_lengths"])
        k1, k2, k3 = jax.random.split(key, 3)
        variables = jax.jit(
            lambda r, i, la, le: self.model.init(
                r, i, la, le, method=self.model.init_all)
        )({"params": k1, "noise": k2, "spacing": k3}, img, label, lengths)
        params = variables["params"]
        model_stats = variables.get("batch_stats", {})
        main = {k: v for k, v in params.items() if k != "hwr"}
        hwr = params["hwr"]
        if self.pretrained_hwr:
            hwr, model_stats = _splice_pretrained_hwr(
                self.pretrained_hwr, hwr, model_stats)
        # rebind the main optimizer now that the param tree exists
        # (schedule + slow/frozen groups; identical to plain Adam when no
        # schedule/patterns were requested)
        from affganwriting_tpu.train.schedules import partitioned_optimizer

        self.main_opt = partitioned_optimizer(params=main, **self._opt_cfg)
        self._build_steps()
        disc_vars = jax.jit(self.disc.init)(k1, img)
        ae_vars = jax.jit(self.ae.init)(k1, img)
        ae_params = ae_vars["params"]
        if self.pretrained_ae:
            ae_params = _splice_pretrained_ae(self.pretrained_ae, ae_params)
        state = LineState(
            step=jnp.zeros((), jnp.int32),
            main_params=main,
            hwr_params=hwr,
            model_stats=model_stats,
            disc_params=disc_vars["params"],
            disc_stats=disc_vars.get("batch_stats", {}),
            ae_params=ae_params,
            main_opt=self.main_opt.init(main),
            disc_opt=self.disc_opt.init(disc_vars["params"]),
        )
        if self.mesh is not None:
            from affganwriting_tpu.parallel.mesh import shard_state

            state = shard_state(self.mesh, state)
        return state

    # ----- helpers -----
    def _put(self, x):
        """Batch-leading array -> device, sharded over 'data' when a mesh
        is active (leading dim must divide by the mesh's data axis)."""
        if self.mesh is not None:
            if jax.process_count() > 1:
                # multi-host: this process holds only its slice of the
                # global batch (parallel/multihost.py)
                from affganwriting_tpu.parallel.multihost import global_batch

                return global_batch(self.mesh, {"x": np.asarray(x)})["x"]
            from affganwriting_tpu.parallel.mesh import batch_sharding

            return jax.device_put(jnp.asarray(x), batch_sharding(self.mesh))
        return jnp.asarray(x)

    def _variables(self, state: LineState):
        v = {"params": {**state.main_params, "hwr": state.hwr_params}}
        if state.model_stats:
            v["batch_stats"] = state.model_stats
        return v

    def recognize(self, state: LineState, image) -> np.ndarray:
        """Frozen-HWR log-probs, host-side, for DTW alignment."""
        if not hasattr(self, "_recognize_jit"):
            self._recognize_jit = jax.jit(
                lambda v, i: self.model.apply(
                    v, i, method=self.model.recognize))
        logp = self._recognize_jit(self._variables(state), jnp.asarray(image))
        return np.asarray(logp)

    def spaced_label(self, state: LineState, batch: dict) -> np.ndarray:
        """DTW-aligned spaced label (B, T) via the frozen recognizer.

        Cached per instance (the reference's spaced-label cache,
        author_hw_dataset.py:251-282): the HWR is frozen, so a line's
        alignment never changes — repeat visits skip both the recognizer
        forward and the host DTW.  Keyed by the image bytes' hash.
        """
        imgs = np.asarray(batch["image"])
        keys = [hash(imgs[i].tobytes()) for i in range(imgs.shape[0])]
        cache = getattr(self, "_spaced_cache", None)
        if cache is None:
            cache = self._spaced_cache = {}
        if any(k not in cache for k in keys):
            # recompute the whole (static-shape) batch: avoids per-subset
            # recompiles of the jit'd recognizer
            logp = self.recognize(state, imgs)             # (B, T, K)
            pred = np.exp(logp).transpose(1, 0, 2)         # (T, B, K)
            label_tb = np.asarray(batch["label"]).T
            label_tb = label_tb[: max(1, int(np.max(
                np.asarray(batch["label_lengths"]))))]
            spaced = correct_pred(pred, label_tb).T        # (B, T)
            for i, k in enumerate(keys):
                cache[k] = spaced[i]
            if len(cache) > 4096:   # bound the cache
                for k in list(cache)[:1024]:
                    del cache[k]
        t = max(cache[k].shape[0] for k in keys)
        out = np.zeros((imgs.shape[0], t), np.int32)
        for i, k in enumerate(keys):
            row = cache[k]
            out[i, : row.shape[0]] = row
        return out

    # ----- jit lesson steps -----
    def _build_steps(self):
        model, disc, ae = self.model, self.disc, self.ae
        main_opt, disc_opt = self.main_opt, self.disc_opt
        n_class = self.n_class

        def gen_forward(main_params, state, label, lengths, style, rng):
            variables = {"params": {**main_params, "hwr": state.hwr_params}}
            if state.model_stats:
                variables["batch_stats"] = state.model_stats
            k1, k2, k3 = jax.random.split(rng, 3)
            img, spaced, counts = model.apply(
                variables, label, lengths, style, train=True,
                rngs={"noise": k1, "spacing": k2, "dropout": k3})
            return img, spaced, counts

        def recon_losses(main_params, state, image, label, lengths,
                         spaced_onehot, rng, fg_mask):
            """Autoencode losses (trainer:542-621, 735-758): fg-masked
            pixel L1 + frozen-AE perceptual distance on the DTW-spaced
            reconstruction.  Shared by the auto/auto-gen update steps and
            the no-update validation step."""
            image32 = image.astype(jnp.float32)
            variables = {"params": {**main_params, "hwr": state.hwr_params}}
            if state.model_stats:
                variables["batch_stats"] = state.model_stats
            style, _ = model.apply(
                variables, image, method=model.extract_style)
            k1, k2 = jax.random.split(rng)
            recon, _, _ = model.apply(
                variables, label, lengths, style, spaced_onehot,
                train=True, rngs={"noise": k1, "dropout": k2})
            w = min(recon.shape[2], image32.shape[2])
            m = fg_mask[:, :, :w].astype(jnp.float32)
            l1 = jnp.mean(jnp.abs(
                (recon[:, :, :w].astype(jnp.float32)
                 - image32[:, :, :w]) * m))
            fr = ae.apply({"params": state.ae_params},
                          image32[:, :, :w], method=ae.encode)
            ff = ae.apply({"params": state.ae_params},
                          recon[:, :, :w].astype(jnp.float32),
                          method=ae.encode)
            perc = sum(jnp.mean(jnp.abs(a.astype(jnp.float32)
                                        - b.astype(jnp.float32)))
                       for a, b in zip(fr, ff)) / len(fr)
            return l1 + perc, (l1, perc, style, recon)

        def count_mse(main_params, state, image, label, lengths,
                      gt_counts, rng):
            """Spacer MSE vs DTW-derived counts (trainer:626-729)."""
            variables = {"params": {**main_params, "hwr": state.hwr_params}}
            if state.model_stats:
                variables["batch_stats"] = state.model_stats
            style, _ = model.apply(
                variables, image, method=model.extract_style)
            onehot = jax.nn.one_hot(label, n_class)
            counts = model.apply(
                variables, onehot, style,
                method=lambda m, o, s: m.spacer(
                    o, s if m.char_style_dim == 0
                    else m._unpack_style(s)[0], train=True),
                rngs={"dropout": rng})
            mask = (jnp.arange(label.shape[1])[None, :]
                    < lengths[:, None]).astype(jnp.float32)
            return jnp.sum(
                mask[..., None] * (counts - gt_counts) ** 2
            ) / jnp.maximum(jnp.sum(mask) * 2, 1.0)

        @jax.jit
        def auto_step(state: LineState, image, label, lengths,
                      spaced_onehot, rng, fg_mask):
            """Autoencode lesson: recon on the DTW-spaced label.  The
            pixel L1 weights by the Otsu fg mask when one is provided
            (hw_with_style_trainer.py:607-611; all-ones otherwise)."""

            def loss_fn(main_params):
                loss, (l1, perc, style, _) = recon_losses(
                    main_params, state, image, label, lengths,
                    spaced_onehot, rng, fg_mask)
                return loss, (l1, perc, style)

            (loss, (l1, perc, style)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.main_params)
            upd, new_opt = main_opt.update(
                grads, state.main_opt, state.main_params)
            new_main = jax.tree.map(
                lambda p, u: p + u, state.main_params, upd)
            new_state = state.replace(
                step=state.step + 1, main_params=new_main, main_opt=new_opt)
            return new_state, {"auto": loss, "auto_l1": l1,
                               "auto_perceptual": perc}, style

        @jax.jit
        def auto_gen_step(state: LineState, image, label, lengths,
                          spaced_onehot, rng, mults, saved_ctc, saved_adv,
                          fg_mask):
            """'auto-gen' lesson: the reference additionally runs the
            adversarial G loss on the *reconstruction* (fake = recon,
            hw_with_style_trainer.py:792, 818-831), its gradients balanced
            into the recon gradients as the scheduled autoGen slot
            (:288-293, 309-386).

            This is also where the preceding ``no-step gen`` lesson's
            deferred gradients land: the reference saves that lesson's
            recog-CTC and adversarial gradients into ``saved_grads``
            (:310-346) and applies every saved slot — rescaled per leaf
            against the base gradient, multiplier indexed by save order
            (:378-386) — at the next stepping lesson's optimizer step.
            Slot order per cycle is [genRecog, genAdv, autoGen], so
            ``balance_var_x`` = (0.6, 0.5, 0.4, ...) maps 0.6 to the gen
            lesson's CTC, 0.5 to its hinge-G, 0.4 to the recon-adv slot.
            ``saved_ctc``/``saved_adv`` are zeros (a balance_combine
            no-op) when no gen lesson is pending."""

            def recon_loss_fn(main_params):
                loss, (l1, perc, style, _) = recon_losses(
                    main_params, state, image, label, lengths,
                    spaced_onehot, rng, fg_mask)
                return loss, (l1, perc, style)

            def adv_loss_fn(main_params):
                _, (_, _, _, recon) = recon_losses(
                    main_params, state, image, label, lengths,
                    spaced_onehot, rng, fg_mask)
                heads = disc.apply(
                    {"params": state.disc_params,
                     "batch_stats": state.disc_stats}, recon)
                return sum(hinge_g(h) for h in heads) / len(heads)

            (loss, (l1, perc, style)), g_base = jax.value_and_grad(
                recon_loss_fn, has_aux=True)(state.main_params)
            l_adv, g_adv = jax.value_and_grad(adv_loss_fn)(state.main_params)
            grads = balance_combine(g_base, [(saved_ctc, mults[0]),
                                             (saved_adv, mults[1]),
                                             (g_adv, mults[2])])
            grads = jax.tree.map(lambda g: jnp.clip(g, -2.0, 2.0), grads)
            upd, new_opt = main_opt.update(
                grads, state.main_opt, state.main_params)
            new_main = jax.tree.map(
                lambda p, u: p + u, state.main_params, upd)
            new_state = state.replace(
                step=state.step + 1, main_params=new_main, main_opt=new_opt)
            return new_state, {"auto": loss, "auto_l1": l1,
                               "auto_perceptual": perc,
                               "auto_gen_adv": l_adv}, style

        @jax.jit
        def count_step(state: LineState, image, label, lengths,
                       gt_counts, rng):
            """Spacer MSE vs DTW-derived counts (trainer:626-729)."""
            def loss_fn(main_params):
                return count_mse(main_params, state, image, label,
                                 lengths, gt_counts, rng)

            loss, grads = jax.value_and_grad(loss_fn)(state.main_params)
            upd, new_opt = main_opt.update(
                grads, state.main_opt, state.main_params)
            new_main = jax.tree.map(
                lambda p, u: p + u, state.main_params, upd)
            return state.replace(
                step=state.step + 1, main_params=new_main,
                main_opt=new_opt), {"count": loss}

        balance = self.balance_loss

        def gen_adv_loss(main_params, state, label, lengths, style, rng):
            img, _, _ = gen_forward(
                main_params, state, label, lengths, style, rng)
            heads = disc.apply(
                {"params": state.disc_params,
                 "batch_stats": state.disc_stats}, img)
            return sum(hinge_g(h) for h in heads) / len(heads), img

        def gen_ctc_loss(main_params, state, label, lengths, style, rng):
            img, _, _ = gen_forward(
                main_params, state, label, lengths, style, rng)
            variables = {"params": {**main_params,
                                    "hwr": state.hwr_params}}
            if state.model_stats:
                variables["batch_stats"] = state.model_stats
            logp = model.apply(variables, img, method=model.recognize)
            return ctc_loss(logp, label, lengths)

        @jax.jit
        def gen_step(state: LineState, label, lengths, style, rng,
                     ctc_mult):
            """Standalone (stepping) gen lesson: hinge G + CTC genRecog,
            the recog gradient balanced into the adversarial base as
            saved slot 0 (hw_with_style_trainer.py:309-386;
            balance_var_x[0])."""
            (l_adv, img), g_adv = jax.value_and_grad(
                gen_adv_loss, has_aux=True)(
                    state.main_params, state, label, lengths, style, rng)
            l_ctc, g_ctc = jax.value_and_grad(gen_ctc_loss)(
                state.main_params, state, label, lengths, style, rng)

            if balance:
                grads = balance_combine(g_adv, [(g_ctc, ctc_mult)])
            else:
                grads = jax.tree.map(lambda a, b: a + b, g_adv, g_ctc)
            # grad value clip 2 (trainer:390)
            grads = jax.tree.map(lambda g: jnp.clip(g, -2.0, 2.0), grads)
            upd, new_opt = main_opt.update(
                grads, state.main_opt, state.main_params)
            new_main = jax.tree.map(
                lambda p, u: p + u, state.main_params, upd)
            return state.replace(
                step=state.step + 1, main_params=new_main,
                main_opt=new_opt), {"gen_adv": l_adv, "gen_ctc": l_ctc}, img

        @jax.jit
        def gen_grads_step(state: LineState, label, lengths, style, rng):
            """'no-step' gen lesson: compute the bank-style hinge-G and
            genRecog-CTC losses and *defer* their gradients.  The
            reference never discards these — ``loss.backward()`` plus the
            no-step branch stash them in ``saved_grads``
            (hw_with_style_trainer.py:310-346), and they are applied,
            rescaled per slot, at the next auto lesson's optimizer step
            (:378-386).  Returned as (metrics, g_ctc, g_adv, img); the
            host carries the two gradient pytrees to the next
            ``auto_gen_step`` call."""
            (l_adv, img), g_adv = jax.value_and_grad(
                gen_adv_loss, has_aux=True)(
                    state.main_params, state, label, lengths, style, rng)
            l_ctc, g_ctc = jax.value_and_grad(gen_ctc_loss)(
                state.main_params, state, label, lengths, style, rng)
            return {"gen_adv": l_adv, "gen_ctc": l_ctc}, g_ctc, g_adv, img

        @jax.jit
        def disc_step(state: LineState, real, label, lengths, style, rng):
            fake, _, _ = gen_forward(
                state.main_params, state, label, lengths, style,
                rng)
            fake = jax.lax.stop_gradient(fake)
            w = min(real.shape[2], fake.shape[2])

            def loss_fn(disc_params):
                variables = {"params": disc_params,
                             "batch_stats": state.disc_stats}
                heads_r, upds = disc.apply(
                    variables, real[:, :, :w], train=True,
                    mutable=["batch_stats"], rngs={"dropout": rng})
                heads_f, _ = disc.apply(
                    variables, fake[:, :, :w], train=True,
                    mutable=["batch_stats"], rngs={"dropout": rng})
                l_real = sum(hinge_d_real(h) for h in heads_r) / len(heads_r)
                l_fake = sum(hinge_d_fake(h) for h in heads_f) / len(heads_f)
                return l_real + l_fake, upds["batch_stats"]

            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.disc_params)
            upd, new_opt = disc_opt.update(
                grads, state.disc_opt, state.disc_params)
            new_disc = jax.tree.map(
                lambda p, u: p + u, state.disc_params, upd)
            return state.replace(
                step=state.step + 1, disc_params=new_disc,
                disc_stats=new_stats, disc_opt=new_opt), {"disc": loss}

        @jax.jit
        def valid_step(state: LineState, image, label, lengths,
                       spaced_onehot, rng, fg_mask, gt_counts):
            """No-update validation pass over the curriculum's valid
            lesson set (base_trainer.py:278-311 `_valid_epoch` with
            curriculum.getValid(): the non-GAN losses — auto recon +
            spacer count — measured without touching any state)."""
            loss, (l1, perc, _, _) = recon_losses(
                state.main_params, state, image, label, lengths,
                spaced_onehot, rng, fg_mask)
            mse = count_mse(state.main_params, state, image, label,
                            lengths, gt_counts, rng)
            return {"val_auto": loss, "val_auto_l1": l1,
                    "val_auto_perceptual": perc, "val_count": mse}

        self.auto_step = auto_step
        self.auto_gen_step = auto_gen_step
        self.count_step = count_step
        self.gen_step = gen_step
        self.gen_grads_step = gen_grads_step
        self.disc_step = disc_step
        self.valid_step = valid_step

    # ----- host-side count targets (trainer:626-729) -----
    def count_targets(self, spaced: np.ndarray, label: np.ndarray,
                      lengths: np.ndarray) -> np.ndarray:
        """Per-char (leading blanks, duplicates) from a spaced label."""
        b, t_lab = label.shape
        out = np.zeros((b, t_lab, 2), np.float32)
        for i in range(b):
            run = spaced[i]
            ci = 0
            blanks = 0
            x = 0
            while x < len(run) and ci < lengths[i]:
                if run[x] == 0:
                    blanks += 1
                    x += 1
                elif run[x] == label[i, ci]:
                    dup = 0
                    while x < len(run) and run[x] == label[i, ci]:
                        dup += 1
                        x += 1
                    out[i, ci] = (blanks, dup)
                    blanks = 0
                    ci += 1
                else:  # misalignment; skip
                    x += 1
        return out

    def _take_saved_grads(self, state: LineState):
        """Consume the pending no-step-gen gradient pair; zeros (a
        balance_combine no-op — zero-mean R slots are skipped) when none
        are pending, e.g. the first cycle after a resume or a curriculum
        without gen lessons."""
        saved, self._saved_grads = self._saved_grads, None
        if saved is None:
            z = jax.tree.map(jnp.zeros_like, state.main_params)
            return z, z
        return saved

    def _mults(self, iteration: int) -> tuple:
        """Active balance multipliers: last balance_var_x entry whose
        iteration threshold <= iteration (trainer:378-382)."""
        active = (1.0, 1.0, 1.0, 1.0)
        for start in sorted(self.balance_var_x):
            if start <= iteration:
                active = tuple(self.balance_var_x[start])
        return active

    # ----- one training iteration -----
    def train_iteration(self, state: LineState, iteration: int,
                        batch: dict) -> tuple[LineState, dict]:
        lesson = self.curriculum.get_lesson(iteration)
        metrics: dict[str, float] = {}
        self.rng, key = jax.random.split(self.rng)
        image = self._put(batch["image"])
        label = self._put(batch["label"])
        lengths = self._put(batch["label_lengths"])

        if "count" in lesson:
            spaced = self.spaced_label(state, batch)
            gt = self.count_targets(
                spaced, np.asarray(batch["label"]),
                np.asarray(batch["label_lengths"]))
            state, m = self.count_step(
                state, image, label, lengths, self._put(gt), key)
            metrics.update(m)   # device scalars; materialized at log time
        if "auto" in lesson or "auto-gen" in lesson:
            spaced = self.spaced_label(state, batch)
            # pad/crop spaced to the static generator length
            t = self.max_gen_length
            sp = np.zeros((spaced.shape[0], t), spaced.dtype)
            sp[:, : min(t, spaced.shape[1])] = spaced[:, :t]
            spaced_onehot = self._put(jax.nn.one_hot(jnp.asarray(sp), self.n_class))
            fg = batch.get("fg_mask")
            fg = (self._put(fg) if fg is not None
                  else jnp.ones_like(image, jnp.float32))
            if "auto-gen" in lesson:
                saved_ctc, saved_adv = self._take_saved_grads(state)
                state, m, style = self.auto_gen_step(
                    state, image, label, lengths, spaced_onehot, key,
                    jnp.asarray(self._mults(iteration)[:3], jnp.float32),
                    saved_ctc, saved_adv, fg)
            else:
                state, m, style = self.auto_step(
                    state, image, label, lengths, spaced_onehot, key, fg)
            metrics.update(m)   # device scalars; materialized at log time
            self.style_bank.add(np.asarray(style))
        if "gen" in lesson or "disc" in lesson:
            style = self.style_bank.sample(image.shape[0])
            if style is None:
                variables = self._variables(state)
                style, _ = self.model.apply(
                    variables, image, method=self.model.extract_style)
                style = np.asarray(style)
                self.style_bank.add(style)
            style = self._put(style)
            if "gen" in lesson:
                if "no-step" in lesson:
                    # defer: the reference stashes this lesson's recog +
                    # adversarial gradients (saved_grads, trainer:310-346)
                    # and applies them at the next auto step
                    m, g_ctc, g_adv, _ = self.gen_grads_step(
                        state, label, lengths, style, key)
                    self._saved_grads = (g_ctc, g_adv)
                else:
                    state, m, _ = self.gen_step(
                        state, label, lengths, style, key,
                        jnp.asarray(self._mults(iteration)[0], jnp.float32))
                metrics.update(m)   # device scalars; materialized at log time
            if "disc" in lesson:
                state, m = self.disc_step(
                    state, image, label, lengths, style, key)
                metrics.update(m)   # device scalars; materialized at log time
        return state, metrics

    # ----- periodic training sheets (hw_with_style_trainer.py:1002-1032) --
    def dump_sheet(self, state: LineState, batch: dict, out_dir: str,
                   iteration: int) -> str:
        """Write a [real | spaced-recon | bank-style gen] grid with mean
        discriminator scores — the reference's ``print_images`` cadence
        artifact, made human-readable (glyph text strips)."""
        from affganwriting_tpu.eval.sheets import write_line_sheet

        image = self._put(batch["image"])
        label = self._put(batch["label"])
        lengths = self._put(batch["label_lengths"])
        variables = self._variables(state)

        spaced = self.spaced_label(state, batch)
        t = self.max_gen_length
        sp = np.zeros((spaced.shape[0], t), spaced.dtype)
        sp[:, : min(t, spaced.shape[1])] = spaced[:, :t]
        spaced_onehot = self._put(jax.nn.one_hot(
            jnp.asarray(sp), self.n_class))

        if not hasattr(self, "_sheet_jit"):
            model, disc = self.model, self.disc

            def _sheet(variables, disc_vars, image, label, lengths,
                       spaced_onehot, style, rng):
                k1, k2, k3 = jax.random.split(rng, 3)
                ex_style, _ = model.apply(
                    variables, image, method=model.extract_style)
                recon, _, _ = model.apply(
                    variables, label, lengths, ex_style, spaced_onehot,
                    rngs={"noise": k1})
                gen, _, _ = model.apply(
                    variables, label, lengths, style,
                    rngs={"noise": k2, "spacing": k3})

                def d_mean(x, w):
                    heads = disc.apply(disc_vars, x[:, :, :w])
                    return sum(jnp.mean(h) for h in heads) / len(heads)

                w = min(image.shape[2], recon.shape[2])
                scores = {"real": d_mean(image, w), "recon": d_mean(recon, w),
                          "gen": d_mean(gen, gen.shape[2])}
                return recon, gen, scores

            self._sheet_jit = jax.jit(_sheet)

        style = self.style_bank.sample(image.shape[0])
        if style is None:
            style, _ = self.model.apply(
                variables, image, method=self.model.extract_style)
            style = np.asarray(style)
        disc_vars = {"params": state.disc_params,
                     "batch_stats": state.disc_stats}
        recon, gen, scores = self._sheet_jit(
            variables, disc_vars, image, label, lengths, spaced_onehot,
            self._put(np.asarray(style, np.float32)), jax.random.key(0))
        texts = batch.get("texts")
        return write_line_sheet(
            out_dir, f"iter_{iteration}", np.asarray(image),
            np.asarray(recon), np.asarray(gen), texts=texts,
            disc_scores={k: float(v) for k, v in scores.items()})

    @classmethod
    def from_config(cls, config: dict, mesh=None, curriculum=None
                    ) -> "LineGanTrainer":
        """Rebuild a trainer from a checkpoint-embedded config dict (the
        reference rebuilds the model from the checkpoint's config,
        generate.py:88-97, app.py:65-77)."""
        cfg = dict(config)
        cfg["slow_param_names"] = tuple(cfg.get("slow_param_names", ()))
        cfg["freeze_param_names"] = tuple(cfg.get("freeze_param_names", ()))
        return cls(curriculum=curriculum, mesh=mesh, **cfg)

    # ----- validation (base_trainer.py:278-311 `_valid_epoch`) -----
    def validate(self, state: LineState, batches: Iterator[dict],
                 max_batches: int | None = None) -> dict:
        """Run the curriculum's valid lesson set — the non-GAN losses
        (auto recon + spacer count), no updates — averaged over batches.
        Deterministic: fixed RNG, so two validations of the same state
        agree."""
        sums: dict[str, float] = {}
        n = 0
        key = jax.random.key(0)
        for batch in batches:
            if max_batches is not None and n >= max_batches:
                break
            spaced = self.spaced_label(state, batch)
            gt = self.count_targets(
                spaced, np.asarray(batch["label"]),
                np.asarray(batch["label_lengths"]))
            t = self.max_gen_length
            sp = np.zeros((spaced.shape[0], t), spaced.dtype)
            sp[:, : min(t, spaced.shape[1])] = spaced[:, :t]
            image = self._put(batch["image"])
            fg = batch.get("fg_mask")
            fg = (self._put(fg) if fg is not None
                  else jnp.ones_like(image, jnp.float32))
            m = self.valid_step(
                state, image, self._put(batch["label"]),
                self._put(batch["label_lengths"]),
                self._put(jax.nn.one_hot(jnp.asarray(sp), self.n_class)),
                key, fg, self._put(gt))
            for k, v in m.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            n += 1
        if n == 0:
            # no batches (e.g. the valid split has fewer authors than the
            # batch size): no monitor value — a 0.0 here would be saved as
            # an unbeatable "best" metric
            import sys

            print("warning: validation yielded zero batches; skipping "
                  "val_monitor", file=sys.stderr)
            return {}
        out = {k: v / n for k, v in sums.items()}
        # the monitored scalar (lower is better): recon + count quality
        out["val_monitor"] = (out.get("val_auto_l1", 0.0)
                              + out.get("val_count", 0.0))
        return out

    def fit(self, state: LineState, batches: Iterator[dict],
            iterations: int, log_every: int = 10,
            logger=None, ckpt_fn=None, ckpt=None,
            save_every: int = 2000, save_latest_every: int = 250,
            val_batches_fn=None, val_every: int = 0,
            val_max_batches: int = 4,
            swa_start: int | None = None, swa_state=None,
            start_iteration: int | None = None,
            sheet_every: int = 0, sheet_dir: str | None = None,
            restart_rss_gb: float = 48.0) -> LineState:
        """The full BaseTrainer runtime (base_trainer.py:199-326):
        iteration loop with latest/periodic/best checkpoints, periodic
        validation with monitor-best, SWA weight averaging past
        ``swa_start`` (:180-186, 234-237), SIGINT -> save-and-exit
        (train.py:75-78).

        ``ckpt`` is a ``LineCheckpointManager``; ``val_batches_fn()``
        returns a fresh iterable of validation batches.  Resume: pass the
        checkpoint payload's ``iteration`` as ``start_iteration`` so the
        curriculum/schedule clock continues exactly where it stopped
        (``state.step`` under-counts: lesson steps per iteration vary).
        The SWA average is exposed as ``self.swa_state`` after fit.
        """
        import signal

        # the loop iteration is the curriculum/schedule clock and is NOT
        # state.step (lesson steps per iteration vary: a multi-part lesson
        # bumps step more than once, valid/no-step none) — the reference
        # persists self.iteration explicitly (base_trainer.py:345, 444)
        it = int(state.step) if start_iteration is None else \
            int(start_iteration)
        if swa_state is not None and swa_start is None:
            # a restored ACTIVE average keeps accumulating on resume even
            # when the caller didn't re-pass --swa-start; otherwise it
            # silently freezes while still being validated and saved
            swa_start = it
        self.swa_state = swa_state

        def _payload(s):
            import jax.numpy as jnp

            return {"state": s, "swa": self._swa_payload(s),
                    "iteration": jnp.asarray(it, jnp.int32)}

        def _save_latest(s):
            if ckpt is not None:
                ckpt.save_latest(_payload(s), self.config_dict)
            elif ckpt_fn is not None:
                ckpt_fn(s)

        def _sigint(signum, frame):
            if ckpt is not None or ckpt_fn is not None:
                print("SIGINT: saving checkpoint before exit")
                _save_latest(state)
            raise KeyboardInterrupt

        prev = signal.signal(signal.SIGINT, _sigint)
        try:
            # background-thread batch prep (reference num_workers
            # equivalent — data/prefetch.py); early break closes the
            # generator, which stops and joins the producer thread
            from affganwriting_tpu.data.prefetch import prefetch

            for batch in prefetch(batches):
                if it >= iterations:
                    break
                state, metrics = self.train_iteration(state, it, batch)
                it += 1
                if swa_start is not None and it >= swa_start:
                    from affganwriting_tpu.train.swa import (
                        swa_init,
                        swa_update,
                    )

                    if self.swa_state is None:
                        self.swa_state = swa_init(state.main_params)
                    self.swa_state = swa_update(
                        self.swa_state, state.main_params)
                if logger is not None and it % log_every == 0:
                    # metrics stay device scalars through the loop so the
                    # tunnel sync (~26 ms floor) is paid per log_every,
                    # not per iteration (train_iteration dispatches async)
                    logger.log(it, {k: float(v) for k, v in metrics.items()},
                               group="line_train")
                if sheet_every and sheet_dir and it % sheet_every == 0:
                    # periodic real|recon|gen grids with disc scores
                    # (reference print_images cadence)
                    self.dump_sheet(state, batch, sheet_dir, it)
                if (val_every and val_batches_fn is not None
                        and it % val_every == 0):
                    val = self.validate(state, val_batches_fn(),
                                        max_batches=val_max_batches)
                    if self.swa_state is not None:
                        swa_probe = state.replace(
                            main_params=self.swa_state["avg"])
                        swa_val = self.validate(
                            swa_probe, val_batches_fn(),
                            max_batches=val_max_batches)
                        val.update({f"swa_{k}": v
                                    for k, v in swa_val.items()})
                    if logger is not None:
                        logger.log(it, val, group="line_valid")
                    if ckpt is not None and "val_monitor" in val:
                        ckpt.maybe_save_best(
                            _payload(state), self.config_dict,
                            val["val_monitor"])
                if ckpt is not None:
                    if it % save_every == 0:
                        ckpt.save_step(_payload(state),
                                       self.config_dict, it)
                    # not elif: "latest" must refresh on its own cadence
                    # even when it collides with a periodic save, or a
                    # crash after the collision resumes from a latest
                    # that is save_every (not save_latest_every) old
                    if it % save_latest_every == 0:
                        _save_latest(state)
                    if it % 50 == 0:
                        # re-exec before the runtime's transfer-mirror
                        # leak OOMs the host; the relaunched CLI resumes
                        # from 'latest' (utils/memwatch.py)
                        from affganwriting_tpu.utils.memwatch import (
                            maybe_restart,
                        )

                        maybe_restart(
                            restart_rss_gb,
                            lambda: _save_latest(state),
                            label="line-gan")
            _save_latest(state)
        finally:
            signal.signal(signal.SIGINT, prev)
        return state

    def _swa_payload(self, state: LineState):
        """SWA slot with a stable treedef: the running average when SWA is
        active, else a count-0 copy of the current params (so checkpoints
        restore into one structure either way)."""
        if getattr(self, "swa_state", None) is not None:
            return self.swa_state
        from affganwriting_tpu.train.swa import swa_init

        return swa_init(state.main_params)
