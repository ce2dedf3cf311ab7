"""iAFF attentional feature fusion + the fused AdaIN skip path.

The "AFF" in AFFGANwriting: inside the decoder's AdaIN layers, a resized and
mean/var-normalized style-pyramid skip feature is fused with the decoder
activation through iterative attentional feature fusion before the adaptive
normalization (reference: GAN_word/blocks.py:166-299).

Note on fidelity: the reference's second fusion round calls ``global_att``
again instead of ``global_att2`` (GAN_word/blocks.py:296) even though
``global_att2`` parameters exist.  We reproduce that behavior (weight reuse)
by default and simply do not allocate the dead parameters.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from affganwriting_tpu.ops.norms import adain, mean_variance_norm


class _AttBranch(nn.Module):
    """1x1 conv -> BN -> ReLU -> 1x1 conv -> BN  (channel bottleneck r=4)."""

    channels: int
    inter: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Conv(self.inter, (1, 1), dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32)(x)
        x = nn.relu(x).astype(self.dtype)
        x = nn.Conv(self.channels, (1, 1), dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32)(x)
        return x.astype(self.dtype)


class IAFF(nn.Module):
    """Iterative attentional feature fusion (GAN_word/blocks.py:238-299)."""

    channels: int = 512
    r: int = 4
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, residual, *, train: bool = False):
        inter = self.channels // self.r
        local_att = _AttBranch(self.channels, inter, self.dtype, name="local_att")
        global_att = _AttBranch(self.channels, inter, self.dtype, name="global_att")
        local_att2 = _AttBranch(self.channels, inter, self.dtype, name="local_att2")

        def gap(h):
            return jnp.mean(h, axis=(1, 2), keepdims=True)

        xa = x + residual
        wei = jax.nn.sigmoid(
            local_att(xa, train=train) + global_att(gap(xa), train=train)
        )
        xi = x * wei + residual * (1.0 - wei)
        # round 2: the reference reuses global_att here (blocks.py:296)
        wei2 = jax.nn.sigmoid(
            local_att2(xi, train=train) + global_att(gap(xi), train=train)
        )
        return x * wei2 + residual * (1.0 - wei2)


class AdaINFusion(nn.Module):
    """AdaIN layer with optional iAFF-fused style skip.

    Functional equivalent of ``AdaptiveInstanceNorm2d``
    (GAN_word/blocks.py:166-204): when a skip feature is given it is
    resized to x's spatial dims (nearest neighbor — ``F.interpolate``'s
    default in ``get_key``, blocks.py:210-216), mean/variance normalized,
    fused with x via iAFF, then the result is instance-normalized and
    modulated by the (mean, std) predicted from the text code.
    """

    channels: int = 512
    dtype: jnp.dtype = jnp.bfloat16
    # A fused Pallas AdaIN kernel was tried in round 1 and measured ~5%
    # SLOWER than the XLA-fused jnp path at inference batch 1024 (the
    # AdaIN sites are small 8x27 tensors; XLA already folds the epilogue
    # into the surrounding convs), so it was removed.  The surviving
    # kernel targets the big upsample-stage instance norms instead
    # (ops/in_relu_pallas.py).

    @nn.compact
    def __call__(self, x, mean, std, skip=None, *, train: bool = False):
        if skip is not None:
            n, h, w, c = x.shape
            key = jax.image.resize(
                skip.astype(jnp.float32), (skip.shape[0], h, w, skip.shape[3]),
                method="nearest",
            )
            key = mean_variance_norm(key).astype(x.dtype)
            x = IAFF(self.channels, dtype=self.dtype, name="iaff")(
                x, key, train=train
            )
        return adain(x, mean, std)
