"""Losses of the three-player word GAN (GAN_word/loss_tro.py, network_tro.py).

All reductions in f32.  The recognition loss is the reference's
label-smoothing KLDiv (smoothing 0.4, PAD column and PAD-target rows zeroed,
sum-reduced — loss_tro.py:8-34); D and the writer classifier use per-element
BCE over the 1024-d patch vector and cross-entropy respectively
(modules_tro.py:145-201).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from affganwriting_tpu.core.config import VOCAB


def recon_l1(pred, target):
    return jnp.mean(jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32)))


def label_smoothing_kl(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    smoothing: float = 0.4,
    pad_id: int = VOCAB.pad,
) -> jnp.ndarray:
    """KL(true_dist || softmax(logits)) with label smoothing, sum-reduced.

    logits: (N, V); targets: (N,) int.  true_dist puts ``1 - smoothing`` on
    the target, ``smoothing / (V - 2)`` elsewhere, zeroes the PAD column,
    and zeroes rows whose target is PAD (loss_tro.py:19-31).  KLDivLoss
    (reduction='sum') over log-softmax inputs.
    """
    logits = logits.astype(jnp.float32)
    n, v = logits.shape
    confidence = 1.0 - smoothing
    fill = smoothing / (v - 2)
    true_dist = jnp.full((n, v), fill, dtype=jnp.float32)
    true_dist = true_dist.at[jnp.arange(n), targets].set(confidence)
    true_dist = true_dist.at[:, pad_id].set(0.0)
    true_dist = jnp.where((targets == pad_id)[:, None], 0.0, true_dist)

    log_probs = jax.nn.log_softmax(logits, axis=-1)
    # sum_x p * (log p - log q); p log p with p==0 -> 0
    plogp = jnp.where(true_dist > 0, true_dist * jnp.log(true_dist), 0.0)
    return jnp.sum(plogp - true_dist * log_probs)


def label_smoothing_kl_per_row(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    smoothing: float = 0.4,
    pad_id: int = VOCAB.pad,
) -> jnp.ndarray:
    """Per-row (unreduced) variant of ``label_smoothing_kl`` -> (N,)."""
    logits = logits.astype(jnp.float32)
    n, v = logits.shape
    confidence = 1.0 - smoothing
    fill = smoothing / (v - 2)
    true_dist = jnp.full((n, v), fill, dtype=jnp.float32)
    true_dist = true_dist.at[jnp.arange(n), targets].set(confidence)
    true_dist = true_dist.at[:, pad_id].set(0.0)
    true_dist = jnp.where((targets == pad_id)[:, None], 0.0, true_dist)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    plogp = jnp.where(true_dist > 0, true_dist * jnp.log(true_dist), 0.0)
    return jnp.sum(plogp - true_dist * log_probs, axis=-1)


def rec_loss(logits_bt_v: jnp.ndarray, labels_with_go: jnp.ndarray,
             smoothing: float = 0.4) -> jnp.ndarray:
    """Recognition loss on per-step logits vs labels minus <GO>.

    logits: (B, T-1, V); labels_with_go: (B, T).  network_tro.py:44-47.
    """
    v = logits_bt_v.shape[-1]
    targets = labels_with_go[:, 1:].reshape(-1)
    return label_smoothing_kl(
        logits_bt_v.reshape(-1, v), targets, smoothing)


def _bce_with_logits(logits, target_value):
    logits = logits.astype(jnp.float32)
    # mean over all elements, targets are all-ones or all-zeros
    log_sig = jax.nn.log_sigmoid(logits)
    log_one_minus = jax.nn.log_sigmoid(-logits)
    return -jnp.mean(target_value * log_sig + (1.0 - target_value) * log_one_minus)


def dis_real_loss(patch_logits):
    return _bce_with_logits(patch_logits, 1.0)


def dis_fake_loss(patch_logits):
    return _bce_with_logits(patch_logits, 0.0)


def gen_adv_loss(patch_logits):
    """Generator wants fakes scored as real (modules_tro.py:164-168)."""
    return _bce_with_logits(patch_logits, 1.0)


def writer_ce_loss(logits, writer_ids):
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, writer_ids[:, None], axis=-1))
