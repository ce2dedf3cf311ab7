"""Pallas one-pass instance-norm(+ReLU) epilogue.

The decoder's upsample stack runs ``relu(instance_norm(conv(...)))`` on its
largest tensors (e.g. (1024, 32, 108, 128) bf16).  XLA computes IN as a
reduce pass followed by a normalize pass — the tensor crosses HBM at least
twice on the read side.  This kernel tiles (sample, channel-block), keeps
the (H, W, 128-lane) tile resident in VMEM, computes the f32 statistics and
the normalized+activated output in one visit: 1 HBM read + 1 write.

Statistics match ``ops/norms.instance_norm`` (biased variance, f32
accumulation, elementwise math in the input dtype).  Used by the decoder
behind ``Decoder(use_pallas_in=True)``; the jnp path remains the default
until the kernel measurably wins on the target chip (bench A/B in
``cli/bench_kernels.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _kernel(x_ref, o_ref, *, eps: float, relu: bool):
    x = x_ref[...]                       # (1, H, W, LANE) block
    f32 = x.astype(jnp.float32)
    # per-channel stats over (H, W): lanes are channels
    mean = jnp.mean(f32, axis=(0, 1, 2), keepdims=True)
    var = jnp.mean(jnp.square(f32), axis=(0, 1, 2), keepdims=True) \
        - jnp.square(mean)
    scale = jax.lax.rsqrt(var + eps)
    out = (x - mean.astype(x.dtype)) * scale.astype(x.dtype)
    if relu:
        out = jnp.maximum(out, 0)
    o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "relu"))
def instance_norm_relu(x: jnp.ndarray, eps: float = 1e-5,
                       relu: bool = True) -> jnp.ndarray:
    """relu(instance_norm(x)) in one HBM pass.  x: (N, H, W, C), C a
    multiple of 128 (the decoder widths 128/256/512/1024 all are)."""
    n, h, w, c = x.shape
    assert c % LANE == 0, c
    grid = (n, c // LANE)
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps, relu=relu),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec(
            (1, h, w, LANE), lambda i, j: (i, 0, 0, j),
            memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (1, h, w, LANE), lambda i, j: (i, 0, 0, j),
            memory_space=pltpu.VMEM),
    )(x)
