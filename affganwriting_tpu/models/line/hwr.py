"""Line-level CTC handwriting recognizers.

Rebuild of line_generation/model/cnn_lstm.py (CRNN: 7-conv trunk + BiLSTM)
and cnn_only_hwr.py (CNNOnlyHWR: same trunk + dilated 1D convs — the active
config's frozen ``"CNNOnly batchnorm"`` recognizer).  Both map a
(B, 64, W, 1) line to per-timestep class log-probabilities for CTC, T ~ W/4.
Outputs are batch-major (B, T, nclass); class 0 is the CTC blank
(line_generation/data/IAM_char_set.json).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from affganwriting_tpu.models.blocks import get_group_size

_KS = (3, 3, 3, 3, 3, 3, 3)
_PAD = (1, 1, 1, 1, 1, 0, 0)
_NM = (64, 128, 256, 256, 512, 512, 512)
_NORMED = (2, 4, 6)   # convs followed by a norm (cnn_lstm.py convRelu calls)


class _ConvTrunk(nn.Module):
    """Shared 7-conv trunk: 64xW -> (B, T=W/4ish, 512) feature sequence."""

    norm: str = "group"   # 'group' | 'batch'
    small: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        def norm_layer(h, i):
            if i not in _NORMED:
                return h
            c = h.shape[-1]
            if self.norm == "group":
                return nn.GroupNorm(num_groups=get_group_size(c),
                                    dtype=jnp.float32,
                                    name=f"norm{i}")(h).astype(h.dtype)
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                dtype=jnp.float32,
                                name=f"norm{i}")(h).astype(h.dtype)

        for i in range(7):
            p = _PAD[i]
            x = nn.Conv(_NM[i], (_KS[i], _KS[i]),
                        padding=((p, p), (p, p)), dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"conv{i}")(x)
            x = norm_layer(x, i)
            x = nn.relu(x)
            if i == 0 and not self.small:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            elif i == 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            elif i == 3:
                x = nn.max_pool(x, (2, 2), strides=(2, 1),
                                padding=((0, 0), (1, 1)))
            elif i == 5:
                x = nn.max_pool(x, (2, 2), strides=(2, 1),
                                padding=((0, 0), (1, 1)))
        # (B, 1, T, 512) -> (B, T, 512)
        b, h, w, c = x.shape
        return x.reshape(b, h * w, c) if h == 1 else x.mean(1)


class CRNN(nn.Module):
    """Conv trunk + single-layer BiLSTM + class head (cnn_lstm.py:28-113)."""

    nclass: int = 80
    hidden: int = 512
    norm: str = "batch"
    use_softmax: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        seq = _ConvTrunk(self.norm, dtype=self.dtype, name="cnn")(
            x, train=train).astype(jnp.float32)
        fwd_c, fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden),
                            return_carry=True, name="lstm_fwd")(seq)
        bwd_c, bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden),
                            return_carry=True, name="lstm_bwd")(
            seq, reverse=True, keep_order=True)
        h = jnp.concatenate([fwd, bwd], axis=-1)
        logits = nn.Dense(self.nclass, param_dtype=jnp.float32,
                          name="embedding")(h)
        if self.use_softmax:
            return nn.log_softmax(logits, axis=-1)
        return logits


class SmallCRNN(nn.Module):
    """The h=24 small variant (cnn_lstm.py:117-192): wider early channels
    (128 from conv0), pooling after convs 1/3/5 (last one (2,2)/(2,1)
    stride with width padding), a final valid 3x3 conv collapsing height
    3 -> 1, spatial dropout 0.1 on convs 2-6, inputs width-padded to >=12
    (:169-171).  T = W/4 - 2."""

    nclass: int = 80
    hidden: int = 512
    norm: str = "batch"
    use_softmax: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if x.shape[2] < 12:
            diff = 12 - x.shape[2]
            x = jnp.pad(x, ((0, 0), (0, 0),
                            (diff // 2, diff - diff // 2), (0, 0)))
        nm = (128, 128, 256, 256, 512, 512, 512)
        pads = (1, 1, 1, 1, 1, 1, 0)
        normed = (1, 2, 4, 6)      # convRelu(i, norm) calls (:150-159)
        dropped = (2, 3, 4, 5, 6)  # Dropout2d(0.1) flags (:128)
        for i in range(7):
            p = pads[i]
            x = nn.Conv(nm[i], (3, 3), padding=((p, p), (p, p)),
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"conv{i}")(x)
            if i in normed:
                if self.norm == "group":
                    x = nn.GroupNorm(num_groups=get_group_size(nm[i]),
                                     dtype=jnp.float32,
                                     name=f"norm{i}")(x).astype(self.dtype)
                else:
                    x = nn.BatchNorm(use_running_average=not train,
                                     momentum=0.9, dtype=jnp.float32,
                                     name=f"norm{i}")(x).astype(self.dtype)
            if i in dropped:
                # Dropout2d: whole channels, shared across space
                x = nn.Dropout(0.1, broadcast_dims=(1, 2),
                               deterministic=not train,
                               name=f"drop{i}")(x)
            x = nn.relu(x)
            if i == 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            elif i == 3:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            elif i == 5:
                x = nn.max_pool(x, (2, 2), strides=(2, 1),
                                padding=((0, 0), (1, 1)))
        b, h, w, c = x.shape
        seq = (x.reshape(b, h * w, c) if h == 1
               else x.mean(1)).astype(jnp.float32)
        fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden), name="lstm_fwd")(seq)
        bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden), name="lstm_bwd")(
            seq, reverse=True, keep_order=True)
        logits = nn.Dense(self.nclass, param_dtype=jnp.float32,
                          name="embedding")(
            jnp.concatenate([fwd, bwd], axis=-1))
        if self.use_softmax:
            return nn.log_softmax(logits, axis=-1)
        return logits


class CNNOnlyHWR(nn.Module):
    """Conv trunk + dilated 1D conv stack (cnn_only_hwr.py:7-118), the
    active config's frozen recognizer ('CNNOnly batchnorm')."""

    nclass: int = 80
    norm: str = "batch"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        seq = _ConvTrunk(self.norm, dtype=self.dtype, name="cnn")(
            x, train=train)

        def conv1d(h, feats, dil, pad, name):
            return nn.Conv(feats, (3,), padding=((pad, pad),),
                           kernel_dilation=(dil,), dtype=self.dtype,
                           param_dtype=jnp.float32, name=name)(h)

        def norm1d(h, name):
            c = h.shape[-1]
            if self.norm == "group":
                return nn.GroupNorm(num_groups=get_group_size(c),
                                    dtype=jnp.float32,
                                    name=name)(h).astype(h.dtype)
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                dtype=jnp.float32,
                                name=name)(h).astype(h.dtype)

        spec = [(512, 2, 2), (512, 4, 4), (512, 1, 0), (512, 8, 8)]
        for i, (feats, dil, pad) in enumerate(spec):
            seq = conv1d(seq, feats, dil, pad, f"c1d_{i}")
            seq = norm1d(seq, f"n1d_{i}")
            seq = nn.relu(seq)
        logits = conv1d(seq, self.nclass, 1, 0, "c1d_out")
        return nn.log_softmax(logits.astype(jnp.float32), axis=-1)
