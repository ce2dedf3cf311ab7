"""Stochastic weight averaging (base_trainer.py:180-186, 234-237).

The reference keeps an SWA copy updated by ``moving_average`` after a start
iteration.  Here: a pure running-average pytree update, jit-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def swa_init(params):
    return {"avg": jax.tree.map(jnp.asarray, params),
            "count": jnp.zeros((), jnp.int32)}


def swa_update(swa_state, params):
    """avg <- (avg * n + params) / (n + 1)."""
    n = swa_state["count"].astype(jnp.float32)
    new_avg = jax.tree.map(
        lambda a, p: (a * n + p) / (n + 1.0), swa_state["avg"], params)
    return {"avg": new_avg, "count": swa_state["count"] + 1}


def ema_update(ema_params, params, decay: float = 0.999):
    return jax.tree.map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params)
