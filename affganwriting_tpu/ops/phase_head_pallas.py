"""Pallas decoder-head kernel: tap-major matmul + VMEM-resident tap fold.

The reassociated PhaseHead (models/decoder.py) runs as two XLA passes:
a 1x1 matmul to tap-major channels z (B, h+4, w+4, 100) and 25
statically-shifted slice-adds.  XLA keeps the slice-adds as separate
fusions, so z crosses HBM several times — measured 29 ms / 89% HBM at the
headline batch where the useful traffic is one x4 read + one small write.

This kernel processes one image per grid step with everything VMEM
resident: the padded phase input block (36, 112, 4C ~ 1.8 MB) is read
once, z (36*112, 128) is produced by one MXU matmul into scratch, the 25
taps fold as in-register shifted adds, and tanh writes the (h, w, 4)
phase output (d2s runs outside — Mosaic can't lane-reshape, and the
folded tensor is tiny).  One HBM read + one small write total.

Numerics match the reassociated jnp path (same contraction order: per-tap
fp32 matmul partials rounded to the compute dtype, then tap adds).
Used by ``models/decoder.PhaseHead`` when ``use_pallas=True``; A/B gate in
``cli/bench_kernels.py`` decides the default.

Reference being modeled: the 7x7 conv+tanh head of the generator decoder
(GAN_word/modules_tro.py:600-604).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xp_ref, kc_ref, bias_ref, o_ref, z_ref):
    h, w = o_ref.shape[1], o_ref.shape[2]
    xp = xp_ref[0]                                   # (h+4, w+4, 4C)
    hp, wp, c4 = xp.shape
    # one MXU matmul: (hp*wp, 4C) @ (4C, 128) -> tap-major z
    z = jax.lax.dot_general(
        xp.reshape(hp * wp, c4), kc_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    z_ref[...] = z.astype(z_ref.dtype).reshape(hp, wp, 128)
    acc = jnp.zeros((h, w, 4), jnp.float32)
    for t in range(25):
        dy, dx = t // 5, t % 5
        acc = acc + z_ref[dy:dy + h, dx:dx + w,
                          4 * t:4 * (t + 1)].astype(jnp.float32)
    # d2s stays outside the kernel: Mosaic can't lane-reshape (h,w,4) ->
    # (h,w,2,2), and the (h,w,4) tensor is tiny anyway.
    o_ref[0] = jnp.tanh(acc + bias_ref[0, 0]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def phase_head_fold(xp: jnp.ndarray, kc: jnp.ndarray, bias4: jnp.ndarray,
                    interpret: bool | None = None) -> jnp.ndarray:
    """xp: reflect-padded phase input (B, h+4, w+4, 4C); kc: tap-major
    kernel (4C, 100) [padded to 128 lanes here]; bias4: (4,) the per-phase
    bias (out_dim=1).  Returns tanh'd images (B, 2h, 2w) — the kernel
    emits phase layout (B, h, w, 4) and d2s happens here in XLA (tiny).

    ``interpret`` defaults to True on the CPU backend (tests / virtual
    mesh), False elsewhere."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, hp, wp, c4 = xp.shape
    h, w = hp - 4, wp - 4
    kc128 = jnp.zeros((c4, 128), kc.dtype).at[:, :100].set(kc)
    bias_smem = jnp.broadcast_to(bias4.astype(jnp.float32)[None, None, :],
                                 (1, 1, 4))
    y = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w, 4), xp.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hp, wp, c4), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c4, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 4), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, 4), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((hp, wp, 128), xp.dtype)],
        # double-buffered input blocks + fp32 matmul spill sit ~0.2 MB over
        # the default 16 MB scoped-vmem budget at (36, 112, 256) bf16
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(xp, kc128, bias_smem)
    return (y.reshape(b, h, w, 2, 2)
             .transpose(0, 1, 3, 2, 4).reshape(b, 2 * h, 2 * w))
