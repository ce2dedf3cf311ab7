"""Fused AdaIN as a Pallas TPU kernel (forward + custom VJP).

The decoder applies instance normalization + text-predicted affine at four
sites per image (models/decoder.py).  Done naively this is several HBM
round-trips per site (read for stats, read+write for normalize); this kernel
does one VMEM-resident pass per sample: load the (H*W, C) tile once, compute
mean/variance on the VPU, write the modulated output once — and the backward
pass is the matching single-pass kernel.

The (H*W, C) tiles of every decoder stage fit VMEM comfortably (largest is
64*216 x 64 = 3.4 MB bf16); C rides the 128-lane axis.  Grid is the batch;
per-channel operands are carried as (B, 1, C) so their last-two block dims
(1, C) match the array dims (TPU tiling rule).

On non-TPU backends (tests) the kernels run in interpreter mode.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _vec_spec(c):
    return pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _map_spec(hw, c):
    return pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _fwd_kernel(x_ref, mean_ref, std_ref, out_ref, mu_ref, rstd_ref):
    x = x_ref[0].astype(jnp.float32)                     # (HW, C)
    mu = jnp.mean(x, axis=0, keepdims=True)              # (1, C)
    var = jnp.mean(x * x, axis=0, keepdims=True) - mu * mu
    rstd = jax.lax.rsqrt(var + _EPS)
    x_hat = (x - mu) * rstd
    y = x_hat * std_ref[0].astype(jnp.float32) \
        + mean_ref[0].astype(jnp.float32)
    out_ref[0] = y.astype(out_ref.dtype)
    mu_ref[0] = mu
    rstd_ref[0] = rstd


def _bwd_kernel(x_ref, mu_ref, rstd_ref, std_ref, dy_ref,
                dx_ref, dmean_ref, dstd_ref):
    x = x_ref[0].astype(jnp.float32)                     # (HW, C)
    dy = dy_ref[0].astype(jnp.float32)
    mu = mu_ref[0]                                       # (1, C)
    rstd = rstd_ref[0]
    stdp = std_ref[0].astype(jnp.float32)
    x_hat = (x - mu) * rstd

    dmean_ref[0] = jnp.sum(dy, axis=0, keepdims=True)
    dstd_ref[0] = jnp.sum(dy * x_hat, axis=0, keepdims=True)

    dys = dy * stdp
    m1 = jnp.mean(dys, axis=0, keepdims=True)
    m2 = jnp.mean(dys * x_hat, axis=0, keepdims=True)
    dx = rstd * (dys - m1 - x_hat * m2)
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _fwd_call(x2, mean, std):
    b, hw, c = x2.shape
    return pl.pallas_call(
        _fwd_kernel,
        grid=(b,),
        in_specs=[_map_spec(hw, c), _vec_spec(c), _vec_spec(c)],
        out_specs=[_map_spec(hw, c), _vec_spec(c), _vec_spec(c)],
        out_shape=[
            jax.ShapeDtypeStruct((b, hw, c), x2.dtype),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        ],
        interpret=_interpret(),
    )(x2, mean[:, None, :], std[:, None, :])


def _bwd_call(x2, mu, rstd, std, dy2):
    b, hw, c = x2.shape
    return pl.pallas_call(
        _bwd_kernel,
        grid=(b,),
        in_specs=[_map_spec(hw, c), _vec_spec(c), _vec_spec(c),
                  _vec_spec(c), _map_spec(hw, c)],
        out_specs=[_map_spec(hw, c), _vec_spec(c), _vec_spec(c)],
        out_shape=[
            jax.ShapeDtypeStruct((b, hw, c), dy2.dtype),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        ],
        interpret=_interpret(),
    )(x2, mu, rstd, std[:, None, :], dy2)


@jax.custom_vjp
def fused_adain(x, mean, std):
    """x (B, H, W, C), mean/std (B, C) -> instance-normed, modulated x."""
    return _fused_adain_fwd(x, mean, std)[0]


def _fused_adain_fwd(x, mean, std):
    b, h, w, c = x.shape
    y2, mu, rstd = _fwd_call(x.reshape(b, h * w, c), mean, std)
    return y2.reshape(b, h, w, c), (x, mu, rstd, std)


def _fused_adain_bwd(res, g):
    x, mu, rstd, std = res
    b, h, w, c = x.shape
    dx2, dmean, dstd = _bwd_call(
        x.reshape(b, h * w, c), mu, rstd, std, g.reshape(b, h * w, c))
    return (dx2.reshape(b, h, w, c),
            dmean[:, 0].astype(jnp.float32),
            dstd[:, 0].astype(jnp.float32))


fused_adain.defvjp(_fused_adain_fwd, _fused_adain_bwd)
