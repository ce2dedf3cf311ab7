"""Perceptual-autoencoder pretraining (the reference's AutoTrainer).

Rebuild of line_generation/trainer/auto_trainer.py + the
``cf_IAM_auto_2tight_newCTC`` recipe: train the 2tight AE on line images
with L1 reconstruction, optionally CTC-regularized through a frozen
recognizer head on the bottleneck features (the 'newCTC' variant).  The
result is the frozen encoder the GAN trainer uses for its perceptual loss.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from affganwriting_tpu.models.line.autoencoder import Autoencoder
from affganwriting_tpu.train.line_trainer import ctc_loss


class AutoTrainer:
    """``ctc_weight > 0`` builds the E_HWR head on the AE's bottleneck so
    CTC regularizes the code itself (autoencoder.py:596-629 +
    cf_IAM_auto_2tight_newCTC.json)."""

    def __init__(self, lr: float = 2e-4, seed: int = 0,
                 ctc_weight: float = 0.0, n_class: int = 80,
                 variant: str = "2tight"):
        self.ae = Autoencoder(
            variant=variant,
            hwr_classes=n_class if ctc_weight > 0.0 else None)
        self.opt = optax.adam(lr, b1=0.5, b2=0.999)
        self.ctc_weight = ctc_weight
        self.n_class = n_class
        self.rng = jax.random.key(seed)
        self._build()

    def init_state(self, sample_img, key):
        variables = jax.jit(self.ae.init)(key, jnp.asarray(sample_img))
        params = variables["params"]
        return {"params": params, "opt": self.opt.init(params),
                "step": jnp.zeros((), jnp.int32)}

    def _build(self):
        ae, opt = self.ae, self.opt
        ctc_w = self.ctc_weight

        @jax.jit
        def step(state, img, labels, lengths):
            def loss_fn(params):
                recon, ctc_logp = ae.apply(
                    {"params": params}, img, return_ctc=True)
                l1 = jnp.mean(jnp.abs(recon.astype(jnp.float32)
                                      - img.astype(jnp.float32)))
                loss = l1
                if ctc_w > 0.0:
                    loss = loss + ctc_w * ctc_loss(ctc_logp, labels, lengths)
                return loss, l1

            (loss, l1), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state["params"])
            upd, new_opt = opt.update(grads, state["opt"], state["params"])
            params = jax.tree.map(lambda p, u: p + u, state["params"], upd)
            return ({"params": params, "opt": new_opt,
                     "step": state["step"] + 1}, loss, l1)

        self._step = step

    def train(self, state, batches, iterations: int, logger=None):
        it = 0
        for batch in batches:
            if it >= iterations:
                break
            img = jnp.asarray(batch["image"])
            labels = jnp.asarray(batch.get(
                "label", np.zeros((img.shape[0], 1), np.int32)))
            lengths = jnp.asarray(batch.get(
                "label_lengths", np.zeros((img.shape[0],), np.int32)))
            state, loss, l1 = self._step(state, img, labels, lengths)
            if logger is not None and it % 50 == 0:
                logger.log(it, {"ae_loss": float(loss), "ae_l1": float(l1)},
                           group="auto")
            it += 1
        return state
