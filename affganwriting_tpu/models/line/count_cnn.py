"""Spacing network (line_generation/model/count_cnn.py:7-44).

1D convnet over [label one-hot ++ broadcast style] predicting per-char
(blank_count, duplicate_count), denormalized by learned mean/std initialized
to the reference's educated guesses (2.0/1.5, 0.0/0.5).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from affganwriting_tpu.models.blocks import get_group_size


class CountCNN(nn.Module):
    class_size: int = 80
    style_size: int = 128
    hidden: int = 128
    n_out: int = 2   # blanks + duplicates ('CNN duplicates' spacer)

    @nn.compact
    def __call__(self, label_onehot, style, *, train: bool = False):
        """label_onehot: (B, T, class); style: (B, style) -> (B, T, n_out)."""
        b, t, _ = label_onehot.shape
        s = jnp.broadcast_to(style[:, None, :], (b, t, style.shape[-1]))
        x = jnp.concatenate([label_onehot, s.astype(label_onehot.dtype)],
                            axis=-1)

        spec = [(self.hidden, True), (self.hidden // 2, True),
                (self.hidden // 4, False)]
        for i, (feats, drop) in enumerate(spec):
            x = nn.Conv(feats, (3,), padding=((1, 1),),
                        param_dtype=jnp.float32, name=f"conv{i}")(x)
            x = nn.GroupNorm(num_groups=get_group_size(feats),
                             dtype=jnp.float32)(x)
            if drop:
                # Dropout2d(0.1): whole channels (count_cnn.py:14,19)
                x = nn.Dropout(0.1, broadcast_dims=(1,),
                               deterministic=not train)(x)
            x = nn.relu(x)
        x = nn.Conv(self.n_out, (1,), param_dtype=jnp.float32,
                    name="head")(x)

        if self.n_out == 2:
            mean_init = jnp.asarray([2.0, 0.0])
            std_init = jnp.asarray([1.5, 0.5])
        else:
            mean_init = jnp.full((self.n_out,), 2.0)
            std_init = jnp.full((self.n_out,), 1.0)
        mean = self.param("mean", lambda k, s: mean_init, (self.n_out,))
        std = self.param("std", lambda k, s: std_init, (self.n_out,))
        return x * std[None, None, :] + mean[None, None, :]
