"""Perceptual autoencoder with the reference's size variants + E_HWR head.

Rebuild of line_generation/model/autoencoder.py:8-769.  The GAN trainer
consumes the '2tight' configuration (32-d bottleneck) whose *encoder
features* implement the perceptual loss (the trainer runs the encoder over
cat(real, recon) and L1s the feature pairs,
hw_with_style_trainer.py:735-758); the other named variants select the
bottleneck/width per the reference's dispatch table (:8-52):

    '2'        bottleneck 256      '2tight'   bottleneck 32
    '2tighter' bottleneck 16       'small'    width/2, bottleneck 128
    '32'       bottleneck 256 (deep encoder)

``hwr_classes`` adds the E_HWR head (:596-629 — the `newCTC` recipe,
configs/cf_IAM_auto_2tight_newCTC.json): a dilated 1D convnet over the
height-collapsed bottleneck strip emitting CTC log-probs, so recognition
regularizes the AE's code.  The reference's torch head consumes a
height-1 feature map; this encoder keeps 2D maps, so the strip is the
height-mean of the bottleneck — same temporal resolution, documented
deviation.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from affganwriting_tpu.models.blocks import get_group_size

# variant -> (width multiplier, bottleneck channels)
VARIANTS: dict[str, tuple[float, int]] = {
    "2": (1.0, 256),
    "2tight": (1.0, 32),
    "2tighter": (1.0, 16),
    "small": (0.5, 128),
    "32": (1.0, 256),
}


class EHWRHead(nn.Module):
    """E_HWR (autoencoder.py:596-629): conv1d(3,d=1) -> conv1d(3,d=2) ->
    conv1d(3,d=4) -> conv1d(5) -> 1x1 to classes, GroupNorm+Dropout+ReLU
    between, log-softmax output (B, W, n_class)."""

    n_class: int
    width: int = 512
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, strip, *, train: bool = False):  # (B, W, C)
        h = strip
        for i, (k, d) in enumerate(((3, 1), (3, 2), (3, 4), (5, 1))):
            pad = (k - 1) // 2 * d if k == 3 else 2
            h = nn.Conv(self.width, (k,), kernel_dilation=(d,),
                        padding=((pad, pad),), dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"conv{i}")(h)
            h = nn.GroupNorm(num_groups=get_group_size(self.width),
                             dtype=jnp.float32)(h).astype(h.dtype)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
            h = nn.relu(h)
        logits = nn.Conv(self.n_class, (1,), dtype=self.dtype,
                         param_dtype=jnp.float32, name="out")(h)
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)


class Autoencoder(nn.Module):
    variant: str = "2tight"
    dim: int = 64
    out_dim: int = 1
    hwr_classes: Optional[int] = None   # E_HWR head when set
    dtype: jnp.dtype = jnp.float32

    @property
    def bottleneck(self) -> int:
        return VARIANTS[self.variant][1]

    def _widths(self):
        mul, _ = VARIANTS[self.variant]
        d = int(self.dim * mul)
        return (d, 2 * d, 4 * d, 4 * d)

    @nn.compact
    def __call__(self, x, *, train: bool = False, return_features=False,
                 return_ctc=False):
        feats = []
        h = x
        for i, feat in enumerate(self._widths()):
            h = nn.Conv(feat, (4, 4), strides=(2, 2),
                        padding=((1, 1), (1, 1)), dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"enc{i}")(h)
            h = nn.GroupNorm(num_groups=get_group_size(feat),
                             dtype=jnp.float32)(h).astype(h.dtype)
            h = nn.relu(h)
            feats.append(h)
        z = nn.Conv(self.bottleneck, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="to_z")(h)
        feats.append(z)
        if return_features:
            return feats

        ctc_logp = None
        if self.hwr_classes is not None:
            strip = jnp.mean(z, axis=1)                    # (B, W', C)
            ctc_logp = EHWRHead(self.hwr_classes, dtype=self.dtype,
                                name="e_hwr")(strip, train=train)

        h = z
        for i, feat in enumerate(reversed(self._widths())):
            n, hh, ww, c = h.shape
            h = jax.image.resize(h, (n, hh * 2, ww * 2, c), method="nearest")
            h = nn.Conv(feat, (3, 3), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"dec{i}")(h)
            h = nn.GroupNorm(num_groups=get_group_size(feat),
                             dtype=jnp.float32)(h).astype(h.dtype)
            h = nn.relu(h)
        out = nn.Conv(self.out_dim, (5, 5), padding=((2, 2), (2, 2)),
                      dtype=self.dtype, param_dtype=jnp.float32,
                      name="head")(h)
        recon = jnp.tanh(out)
        if return_ctc:
            return recon, ctc_logp
        return recon

    def encode(self, x, *, train: bool = False):
        return self(x, train=train, return_features=True)
