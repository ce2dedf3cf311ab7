"""Character-aware style encoder, TPU-native recast.

Rebuild of ``CharStyleEncoder`` / ``CharExtractor``
(line_generation/model/char_style.py:84-311) in the active configuration
(char_style_dim == 0: one fused 128-d style vector).  The torch version
walks recognizer argmax positions in Python, slicing a +-window patch per
found character and routing it through that character's private extractor
net.  Here the same computation is dense and static-shaped (SURVEY.md §7.3):

  1. the conv 'down' trunk squeezes the line to a height-1 strip (B, T, C);
  2. recognizer scores are aligned to the strip, argmax'd per column;
  3. the strongest ``max_chars`` non-blank columns are selected by top-k
     on recognition confidence (the torch code uses every found column —
     columns beyond max_chars are the weakest and carry ~0 weight);
  4. +-window patches around those columns are gathered in one take;
  5. per-class extractor parameters are *stacked* (K, ...) and gathered per
     column — one batched einsum instead of K python-looped modules;
  6. the per-column styles are combined by recognition-score-weighted
     averaging, exactly the reference's ``total_style / b_sum``;
  7. a global branch (prep convs over strip++recog, GAP, FC) fuses with the
     char average into the final style vector.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from affganwriting_tpu.models.blocks import get_group_size


def _group_norm_banked(x, scale, bias, groups):
    """GN over (..., T, C) with per-leading-element params.

    x: (B, N, T, C); scale/bias: (B, N, C)."""
    b, n, t, c = x.shape
    xg = x.reshape(b, n, t, groups, c // groups).astype(jnp.float32)
    mean = jnp.mean(xg, axis=(2, 4), keepdims=True)
    var = jnp.var(xg, axis=(2, 4), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + 1e-5)
    out = xg.reshape(b, n, t, c)
    return out * scale[:, :, None, :] + bias[:, :, None, :]


class CharExtractorBank(nn.Module):
    """All n_class CharExtractors (char_style.py:84-124, 'small' variant for
    window < 3) as stacked parameters, applied per column via class-indexed
    gather."""

    n_class: int
    in_dim: int = 256
    dim: int = 128
    style_dim: int = 128

    @nn.compact
    def __call__(self, patches, class_idx):
        """patches: (B, N, W, in_dim); class_idx: (B, N) -> (B, N, style)."""
        k = self.n_class
        cin, d, out = self.in_dim, self.dim, self.style_dim
        init = nn.initializers.lecun_normal()

        def p(name, shape):
            return self.param(name, init, shape, jnp.float32)

        def pz(name, shape):
            return self.param(name, nn.initializers.zeros, shape, jnp.float32)

        def po(name, shape):
            return self.param(name, nn.initializers.ones, shape, jnp.float32)

        w1 = p("w1", (k, 3, cin, d))
        b1 = pz("b1", (k, d))
        g1s, g1b = po("g1s", (k, d)), pz("g1b", (k, d))
        w2 = p("w2", (k, 3, d, cin))
        b2 = pz("b2", (k, cin))
        w3 = p("w3", (k, cin, 2 * d))
        b3 = pz("b3", (k, 2 * d))
        g2s, g2b = po("g2s", (k, 2 * d)), pz("g2b", (k, 2 * d))
        wf1 = p("wf1", (k, 2 * d, 2 * d))
        bf1 = pz("bf1", (k, 2 * d))
        wf2 = p("wf2", (k, 2 * d, out))
        bf2 = pz("bf2", (k, out))

        def take(t):
            return jnp.take(t, class_idx, axis=0)   # (B, N, ...)

        x = patches.astype(jnp.float32)             # (B, N, W, cin)

        def conv3(h, w_g, b_g):
            # per-column k3 'same' conv: (B,N,T,Ci) x (B,N,3,Ci,Co)
            hp = jnp.pad(h, ((0, 0), (0, 0), (1, 1), (0, 0)))
            taps = jnp.stack(
                [hp[:, :, i:i + h.shape[2]] for i in range(3)], axis=2)
            return jnp.einsum("bndtc,bndco->bnto", taps, w_g) \
                + b_g[:, :, None, :]

        # conv1: ReLU -> conv3 -> GN -> ReLU -> conv3; residual
        h = nn.relu(x)
        h = conv3(h, take(w1), take(b1))
        h = _group_norm_banked(h, take(g1s), take(g1b),
                               get_group_size(d))
        h = nn.relu(h)
        h = conv3(h, take(w2), take(b2))
        h = h + x
        # conv2 (small): ReLU -> 1x1 conv -> GN -> ReLU
        h = nn.relu(h)
        h = jnp.einsum("bntc,bnco->bnto", h, take(w3)) + take(b3)[:, :, None]
        h = _group_norm_banked(h, take(g2s), take(g2b),
                               get_group_size(2 * d))
        h = nn.relu(h)
        # GAP over width -> fc -> relu -> fc
        h = jnp.mean(h, axis=2)                     # (B, N, 2d)
        h = nn.relu(
            jnp.einsum("bnc,bnco->bno", h, take(wf1)) + take(bf1))
        return jnp.einsum("bnc,bnco->bno", h, take(wf2)) + take(bf2)


class CharStyleEncoder(nn.Module):
    n_class: int = 80
    dim: int = 64               # style_extractor_dim
    style_dim: int = 128
    char_dim: int = 128         # char_style_extractor_dim
    window: int = 2
    max_chars: int = 32         # static cap on extracted char columns
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image, recog, *, train: bool = False):
        """image: (B, H, W, 1); recog: (B, T_r, n_class) log-probs.

        Returns the fused (B, style_dim) style vector (single-style path)."""
        d = self.dim

        def cb(h, feats, k, s, pad_hw, norm, act, name):
            h = jnp.pad(h, ((0, 0), (pad_hw[0], pad_hw[0]),
                            (pad_hw[1], pad_hw[1]), (0, 0)))
            h = nn.Conv(feats, (k, k), strides=s, padding="VALID",
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=name)(h)
            if norm:
                h = nn.GroupNorm(num_groups=get_group_size(feats),
                                 dtype=jnp.float32)(h).astype(h.dtype)
            if act:
                h = nn.relu(h)
            return h

        # down trunk (char_style.py:146-158): 64 -> height-1 strip, C=4*dim
        x = cb(image, d, 5, (1, 1), (2, 2), True, True, "down0")
        for i in range(2):
            x = cb(x, d * 2, 4, (2, 2), (1, 1), True, True, f"down{i}a")
            d *= 2
            x = cb(x, d, 3, (1, 1), (0, 1), True, True, f"down{i}b")
        x = cb(x, d, 4, (2, 1), (0, 1), True, True, "down3")
        x = cb(x, d, 4, (2, 1), (0, 1), False, False, "down4")
        b, h, t, c = x.shape
        strip = x.reshape(b, h * t, c) if h == 1 else jnp.mean(x, 1)
        t = strip.shape[1]

        # align recognition to the strip length (replicate-pad / crop)
        t_r = recog.shape[1]
        if t_r < t:
            recog = jnp.pad(recog, ((0, 0), (0, t - t_r), (0, 0)),
                            mode="edge")
        elif t_r > t:
            recog = recog[:, :t]

        pred = jnp.argmax(recog, axis=-1)           # (B, T)
        score = jnp.exp(jnp.max(recog, axis=-1))    # recognition confidence
        nonblank = pred != 0
        masked_score = jnp.where(nonblank, score, -1.0)
        n = min(self.max_chars, t)
        top_score, top_idx = jax.lax.top_k(masked_score, n)   # (B, N)
        valid = top_score > 0.0

        # +-window patches around selected columns, zero-padded at edges
        w = self.window
        strip_p = jnp.pad(strip, ((0, 0), (w, w), (0, 0)))
        offsets = jnp.arange(2 * w + 1)
        gather_idx = top_idx[:, :, None] + offsets[None, None, :]   # (B,N,Wd)
        flat_idx = gather_idx.reshape(b, -1)
        patches = jnp.take_along_axis(
            strip_p, flat_idx[..., None], axis=1
        ).reshape(b, n, 2 * w + 1, c)
        classes = jnp.take_along_axis(pred, top_idx, axis=1)
        weights = jnp.where(valid, top_score, 0.0)

        char_styles = CharExtractorBank(
            self.n_class, c, self.char_dim, self.style_dim,
            name="char_extractor")(patches, classes)
        wsum = jnp.sum(weights, axis=1, keepdims=True)
        avg_char_style = jnp.where(
            wsum > 0,
            jnp.sum(char_styles * weights[..., None], axis=1)
            / jnp.maximum(wsum, 1e-8),
            0.0)

        # global branch (char_style.py:161-172, 288-292)
        xr = jnp.concatenate(
            [nn.relu(strip), recog.astype(strip.dtype)], axis=-1)
        xr = nn.Conv(c, (5,), padding=((2, 2),), param_dtype=jnp.float32,
                     name="prep0")(xr)
        xr = nn.relu(xr)
        xr = nn.max_pool(xr, (2,), strides=(2,))
        xr = nn.Conv(c, (3,), padding=((1, 1),), param_dtype=jnp.float32,
                     name="prep1")(xr)
        xr = nn.GroupNorm(num_groups=get_group_size(c),
                          dtype=jnp.float32)(xr).astype(xr.dtype)
        xr = nn.relu(xr)
        xr = nn.Conv(c, (3,), padding=((1, 1),), param_dtype=jnp.float32,
                     name="prep2")(xr)
        xr = nn.relu(xr)
        g = jnp.mean(xr, axis=1)                    # GAP -> (B, C)

        comb = jnp.concatenate(
            [g.astype(jnp.float32), avg_char_style], axis=-1)
        comb = nn.relu(nn.Dense(c, param_dtype=jnp.float32,
                                name="final0")(comb))
        return nn.Dense(self.style_dim, param_dtype=jnp.float32,
                        name="final1")(comb)
