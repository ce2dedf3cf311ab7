"""Fused depth-to-space + instance-norm + ReLU (Pallas TPU kernel).

The subpixel decoder stage (models/decoder.py:UpsampleConv) produces phase
layout (B, H, W, 4C) that must become (B, 2H, 2W, C) before normalization.
As separate XLA ops the rearrangement is a strided transpose (~23 ms at the
(1024, 32, 108, 256) stage) plus another full read/write for the norm.  This
kernel does everything in one VMEM residency per sample: load the phase
tile, compute per-channel statistics (phase-invariant: the stats pool over
all spatial positions), normalize + ReLU, rearrange, write once.

Instance-norm backward needs the same stats, so a custom VJP keeps training
supported; the backward kernel reads (x_phase, mu, rstd, dy_spatial) and
writes dx in phase layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _rearrange(x, h, w, c):
    """(H, W, 4C) phase layout -> (2H, 2W, C); channels packed (p, q, c)."""
    y = x.reshape(h, w, 2, 2, c)
    y = y.transpose(0, 2, 1, 3, 4)          # (H, 2, W, 2, C)
    return y.reshape(2 * h, 2 * w, c)


def _inv_rearrange(y, h, w, c):
    x = y.reshape(h, 2, w, 2, c)
    x = x.transpose(0, 2, 1, 3, 4)          # (H, W, 2, 2, C)
    return x.reshape(h, w, 4 * c)


def _fwd_kernel(x_ref, out_ref, mu_ref, rstd_ref):
    xp = x_ref[0].astype(jnp.float32)                     # (H, W, 4C)
    h, w, c4 = xp.shape
    c = c4 // 4
    grouped = xp.reshape(h * w * 4, c)
    mu = jnp.mean(grouped, axis=0, keepdims=True)         # (1, C)
    var = jnp.mean(grouped * grouped, axis=0, keepdims=True) - mu * mu
    rstd = jax.lax.rsqrt(var + _EPS)
    # normalize in phase layout (per-channel c affine broadcasts over phases)
    scale4 = jnp.tile(rstd, (1, 4))                       # (1, 4C)
    mu4 = jnp.tile(mu, (1, 4))
    normed = (xp - mu4[0][None, None, :]) * scale4[0][None, None, :]
    normed = jnp.maximum(normed, 0.0)
    out_ref[0] = _rearrange(normed, h, w, c).astype(out_ref.dtype)
    mu_ref[0] = mu
    rstd_ref[0] = rstd


def _bwd_kernel(x_ref, mu_ref, rstd_ref, dy_ref, dx_ref):
    xp = x_ref[0].astype(jnp.float32)                     # (H, W, 4C)
    h, w, c4 = xp.shape
    c = c4 // 4
    dy = _inv_rearrange(dy_ref[0].astype(jnp.float32), h, w, c)  # (H, W, 4C)
    mu4 = jnp.tile(mu_ref[0], (1, 4))[0][None, None, :]
    rstd4 = jnp.tile(rstd_ref[0], (1, 4))[0][None, None, :]
    x_hat = (xp - mu4) * rstd4
    dy = jnp.where(x_hat > 0.0, dy, 0.0)                  # ReLU backward
    # per-channel means over (H, W, phases)
    g = dy.reshape(h * w * 4, c)
    xh = x_hat.reshape(h * w * 4, c)
    m1 = jnp.mean(g, axis=0, keepdims=True)
    m2 = jnp.mean(g * xh, axis=0, keepdims=True)
    m1_4 = jnp.tile(m1, (1, 4))[0][None, None, :]
    m2_4 = jnp.tile(m2, (1, 4))[0][None, None, :]
    dx = rstd4 * (dy - m1_4 - x_hat * m2_4)
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _fwd_call(x):
    b, h, w, c4 = x.shape
    c = c4 // 4
    return pl.pallas_call(
        _fwd_kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w, c4), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((1, 2 * h, 2 * w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 2 * h, 2 * w, c), x.dtype),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        ],
        interpret=_interpret(),
    )(x)


def _bwd_call(x, mu, rstd, dy):
    b, h, w, c4 = x.shape
    return pl.pallas_call(
        _bwd_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c4), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c4 // 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c4 // 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * h, 2 * w, c4 // 4),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, h, w, c4), lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((b, h, w, c4), dy.dtype)],
        interpret=_interpret(),
    )(x, mu, rstd, dy)


@jax.custom_vjp
def fused_d2s_in_relu(x_phase):
    """(B, H, W, 4C) phase layout -> relu(instance_norm(depth_to_space(x)))
    as (B, 2H, 2W, C)."""
    return _fwd(x_phase)[0]


def _fwd(x_phase):
    y, mu, rstd = _fwd_call(x_phase)
    return y, (x_phase, mu, rstd)


def _bwd(res, g):
    x_phase, mu, rstd = res
    (dx,) = _bwd_call(x_phase, mu, rstd, g)
    return (dx,)


fused_d2s_in_relu.defvjp(_fwd, _bwd)


def reference_d2s_in_relu(x_phase):
    """XLA composition for parity tests: d2s -> instance_norm -> relu."""
    from affganwriting_tpu.ops.norms import instance_norm

    b, h, w, c4 = x_phase.shape
    c = c4 // 4
    y = x_phase.reshape(b, h, w, 2, 2, c)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, c)
    return jax.nn.relu(instance_norm(y))
