"""Mixed-precision policy: bf16 compute on the MXU, f32 params and statistics.

The reference runs everything in float32 on one GPU.  On TPU the MXU natively
multiplies bfloat16 at 2x the f32 rate, so convs/matmuls run in bf16 with f32
accumulation (``preferred_element_type``), while normalization statistics,
losses, and optimizer state stay in float32.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

_NAMES = {
    "bfloat16": jnp.bfloat16,
    "float32": jnp.float32,
    "float16": jnp.float16,
}


@dataclasses.dataclass(frozen=True)
class DtypePolicy:
    compute: str = "bfloat16"
    param: str = "float32"

    @property
    def compute_dtype(self):
        return _NAMES[self.compute]

    @property
    def param_dtype(self):
        return _NAMES[self.param]

    def cast_compute(self, x):
        return jnp.asarray(x, self.compute_dtype)
