"""AdaIN decoder: (8, 27, 512) content -> (64, 216, 1) word image.

Rebuild of ``Decoder`` + ``assign_adain_params``
(GAN_word/modules_tro.py:586-607, 226-242).  The reference smuggles AdaIN
parameters and skip features into its norm layers by attribute mutation; here
the decoder takes them as explicit arguments — 2 AdaIN ResBlocks (4 AdaIN
sites), where site 1 fuses maxpool(style_pyramid[3]) and site 3 fuses
style_pyramid[4] via iAFF, then 3x [2x upsample + 5x5 conv + instance norm]
and a 7x7 tanh head.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from affganwriting_tpu.models.aff import AdaINFusion
from affganwriting_tpu.models.blocks import Conv2dBlock, pad2d
from affganwriting_tpu.ops.norms import instance_norm


def _quant_conv_site(mod: nn.Module, x, w, bias, mode: str, out_dtype,
                     pad: int = 0, pad_type: str = "reflect"):
    """One int8 conv site inside a flax module (stride 1; ``pad`` applied
    inside, AFTER the quantize — reflect padding commutes exactly with
    elementwise quantization, and padding the int8 tensor halves the pad
    copy's traffic while letting the quantize fuse into the producer's
    epilogue).

    ``dynamic``: per-sample amax pass (ops/quant.py:dyn_int8_conv).
    ``calib``:   bf16 conv that records ``max(|x|)`` over every apply into
                 the module's ``("quant", "amax")`` variable — run with
                 ``mutable=["quant"]`` on a calibration batch.
    ``static``:  int8 conv with the calibrated amax (no amax pass).
    """
    from affganwriting_tpu.ops.quant import dyn_int8_conv, static_int8_conv

    if mode == "dynamic":
        xp = pad2d(x, pad, pad_type) if pad else x
        return dyn_int8_conv(xp, w, bias, out_dtype=out_dtype)
    amax_v = mod.variable("quant", "amax",
                          lambda: jnp.zeros((), jnp.float32))
    if mode == "calib":
        amax_v.value = jnp.maximum(
            amax_v.value, jnp.max(jnp.abs(x.astype(jnp.float32))))
        xp = pad2d(x, pad, pad_type) if pad else x
        y = jax.lax.conv_general_dilated(
            xp.astype(out_dtype), w.astype(out_dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if bias is not None:
            y = y + bias.astype(out_dtype)
        return y
    if mode != "static":
        raise ValueError(f"unknown quant_mode {mode!r}")
    return static_int8_conv(x, w, amax_v.value, bias, out_dtype=out_dtype,
                            pad=pad, pad_type=pad_type)


class UpsampleConv(nn.Module):
    """2x nearest upsample + 5x5 reflect-pad conv, with an exact subpixel
    fast path.

    The reference pairs ``nn.Upsample(2)`` with a 5x5 conv
    (GAN_word/modules_tro.py:593-598).  Because the upsampled input repeats
    each pixel 2x2, the pair is algebraically a single 3x3 conv at LOW
    resolution with 4 phase kernels (folded from the same 5x5 weights)
    followed by depth-to-space — 36/100 of the FLOPs and no materialized
    2x tensor.  ``subpixel=True`` (default) uses that path; interior pixels
    are bit-identical, only the 2-pixel reflect border is approximated by
    low-res reflect padding.  Both paths share the same (5,5,Cin,Cout)
    parameter, so checkpoints are interchangeable.

    ``emit_phase=True`` skips the depth-to-space and returns the phase
    layout (B, H, W, 4*features) with channels packed (p, q, c) — consumers
    that are phase-aware (``instance_norm_phase``, ``PhaseHead``) avoid the
    strided transpose entirely.
    """

    features: int
    subpixel: bool = True
    emit_phase: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    # int8 serving mode (ops/quant.py): per-channel weight scales, int8
    # MXU path.  Subpixel path only; exact mode is the parity path and
    # stays bf16.  quant_mode: "dynamic" (per-sample amax pass),
    # "static" (calibrated amax from the "quant" variable collection),
    # "calib" (bf16 forward that RECORDS amax — apply with
    # mutable=["quant"] on a calibration batch).
    quant: bool = False
    quant_mode: str = "dynamic"

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (5, 5, cin, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
        if not self.subpixel:
            n, h, ww, c = x.shape
            up = jax.image.resize(x, (n, h * 2, ww * 2, c), method="nearest")
            up = pad2d(up, 2, "reflect")
            y = jax.lax.conv_general_dilated(
                up, w.astype(self.dtype), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y + b.astype(self.dtype)

        # fold the 5x5 kernel into 4 phase 3x3 kernels:
        # out[2m+p, 2n+q] = sum_{a,b} w[a+2,b+2] x[m+floor((p+a)/2),
        #                                          n+floor((q+b)/2)]
        def fold_1d(kernel5, p):
            # kernel5: (5, ...) tap axis -> (3, ...) low-res offsets -1,0,1
            groups = [[], [], []]
            for a in range(-2, 3):
                dy = (p + a) // 2 + 1   # floor((p+a)/2) in {-1,0,1} -> idx
                groups[dy].append(kernel5[a + 2])
            return jnp.stack([sum(g) for g in groups], axis=0)

        phases = []
        for p in (0, 1):
            wp = fold_1d(w, p)                       # (3, 5, Cin, Co)
            for q in (0, 1):
                wpq = fold_1d(jnp.swapaxes(wp, 0, 1), q)  # (3, 3, Cin, Co)
                phases.append(jnp.swapaxes(wpq, 0, 1))
        w4 = jnp.concatenate(phases, axis=-1)        # (3, 3, Cin, 4*Co)

        if self.quant:
            y = _quant_conv_site(self, x, w4, None, self.quant_mode,
                                 self.dtype, pad=1)
        else:
            y = jax.lax.conv_general_dilated(
                pad2d(x, 1, "reflect"), w4.astype(self.dtype), (1, 1),
                "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        bias4 = jnp.tile(b, (4,)).astype(self.dtype)
        if self.emit_phase:
            return y + bias4
        n, h, ww, _ = y.shape
        co = self.features
        y = (y + bias4).reshape(n, h, ww, 2, 2, co)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, h * 2, ww * 2, co)
        return y


def split_adain_params(adain_params: jnp.ndarray, num_sites: int, dim: int):
    """(B, num_sites*2*dim) -> list of (mean (B,dim), std (B,dim)).

    Mirrors the sequential consumption in assign_adain_params
    (GAN_word/modules_tro.py:231-241): first half of each chunk is the mean
    (bias), second half the std (weight).
    """
    out = []
    for i in range(num_sites):
        chunk = adain_params[:, i * 2 * dim:(i + 1) * 2 * dim]
        out.append((chunk[:, :dim], chunk[:, dim:]))
    return out


def instance_norm_phase(x4: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Instance norm of the *logical* image computed in phase layout.

    x4: (B, H, W, 4C) with channels packed (p, q, c).  Per-(sample, c)
    statistics pool over (H, W, p, q) — identical to instance-norming the
    depth-to-space'd tensor, without materializing it."""
    b, h, w, c4 = x4.shape
    c = c4 // 4
    g = x4.reshape(b, h * w, 4, c)
    mean = jnp.mean(g, axis=(1, 2), keepdims=True, dtype=jnp.float32)
    var = jnp.mean(jnp.square(g.astype(jnp.float32)), axis=(1, 2),
                   keepdims=True) - jnp.square(mean)
    scale = jax.lax.rsqrt(var + eps)
    out = (g - mean.astype(g.dtype)) * scale.astype(g.dtype)
    return out.reshape(b, h, w, c4)


def fold_head_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """(7,7,C,o) head kernel -> tap-major phase kernel (4C, 100*o).

    First the phase fold (PhaseHead docstring): K4[dy+2, dx+2, (p,q,c),
    (P,Q,o)] — for output phase P, hi-res tap a lands at low-res offset
    floor((P+a)/2) and input phase (P+a) mod 2.  Then tap-major layout:
    kc[ci, t*4o + po] = K4[dy_t, dx_t, ci, po] with t = 5*dy + dx."""
    c, o = k.shape[2], k.shape[3]
    k4 = jnp.zeros((5, 5, 4 * c, 4 * o), jnp.float32)
    for P in (0, 1):
        for a in range(-3, 4):
            dy = (P + a) // 2
            p = (P + a) % 2
            for Q in (0, 1):
                for bb in range(-3, 4):
                    dx = (Q + bb) // 2
                    q = (Q + bb) % 2
                    in_slot = (p * 2 + q) * c
                    out_slot = (P * 2 + Q) * o
                    k4 = k4.at[
                        dy + 2, dx + 2,
                        in_slot: in_slot + c,
                        out_slot: out_slot + o,
                    ].add(k[a + 3, bb + 3])
    return k4.reshape(25, 4 * c, 4 * o).transpose(1, 0, 2) \
        .reshape(4 * c, 100 * o)


class PhaseHead(nn.Module):
    """7x7 conv + tanh head consuming phase layout.

    Folds the (7,7,C,out) kernel into a (5,5,4C,4*out) phase-space kernel:
    for output phase P (rows), hi-res tap a maps to low-res offset
    floor((P+a)/2) in [-2, 2] and input phase (P+a) mod 2.  The final
    depth-to-space then runs on a 4*out-channel tensor (out=1: trivially
    cheap) instead of the 4C-channel one — eliminating the expensive
    strided transpose at full resolution.  Shares the (7,7,C,out) parameter
    layout with the exact head, reflect border approximated at low res.

    The folded conv is NOT run as a conv: with 4*out output channels
    (out=1: 4) the MXU uses 4/128 lanes — measured 3.6% MFU / 52 ms at the
    headline batch, as long as the three upsample convs combined.  Instead
    the contraction is reassociated: a 1x1 matmul to tap-major channels
    (4C -> 25 taps * 4 phases, MXU N=100) followed by 25 statically-shifted
    slice-adds that place each tap.  Same math, summation order differs
    (per-tap partials); exact in fp32, ~bf16-epsilon noise in bf16.
    """

    out_dim: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    # ops/phase_head_pallas.py: same fold with the tap reduction VMEM
    # resident (one HBM read + one write); opt-in until the A/B gate
    # (cli/bench_kernels.py) shows it beating the jnp reassociation
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x4):
        b, h, w, c4 = x4.shape
        c = c4 // 4
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (7, 7, c, self.out_dim), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.out_dim,), jnp.float32)
        o = self.out_dim
        kc = fold_head_kernel(k)
        xp = pad2d(x4, 2, "reflect")                    # (B, h+4, w+4, 4C)
        if self.use_pallas and o == 1:
            from affganwriting_tpu.ops.phase_head_pallas import (
                phase_head_fold,
            )

            img = phase_head_fold(xp.astype(self.dtype),
                                  kc.astype(self.dtype),
                                  jnp.tile(bias, (4,)))
            return img[..., None]
        z = jnp.einsum("bhwc,ck->bhwk", xp, kc.astype(self.dtype))
        y = jnp.zeros((b, h, w, 4 * o), z.dtype)
        for t in range(25):
            dy, dx = t // 5, t % 5
            y = y + jax.lax.slice(
                z, (0, dy, dx, 4 * o * t),
                (b, dy + h, dx + w, 4 * o * (t + 1)))
        y = y + jnp.tile(bias, (4,)).astype(y.dtype)
        y = jnp.tanh(y)
        # cheap final d2s: only 4*out_dim channels
        y = y.reshape(b, h, w, 2, 2, o)
        return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, o)


class ExactHead(nn.Module):
    """7x7 reflect-pad conv + tanh on spatial layout — same parameter
    structure as PhaseHead, so the two head modes share checkpoints."""

    out_dim: int = 1
    pad_type: str = "reflect"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (7, 7, c, self.out_dim), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.out_dim,), jnp.float32)
        h = pad2d(x, 3, self.pad_type)
        y = jax.lax.conv_general_dilated(
            h, k.astype(self.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.tanh(y + bias.astype(y.dtype))


class _QConv3x3(nn.Module):
    """3x3 VALID conv with nn.Conv's exact param tree ("kernel"/"bias"),
    run through the int8 MXU path (ops/quant.py).  Only instantiated at
    apply time in quant serving mode — the params it binds were created by
    the nn.Conv branch."""

    features: int
    dtype: jnp.dtype = jnp.bfloat16
    quant_mode: str = "dynamic"
    pad_type: str = "reflect"

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, cin, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
        return _quant_conv_site(self, x, w, b, self.quant_mode, self.dtype,
                                pad=1, pad_type=self.pad_type)


class AdaINResBlock(nn.Module):
    """Residual block whose two convs are followed by AdaIN(+iAFF) sites."""

    dim: int = 512
    pad_type: str = "reflect"
    dtype: jnp.dtype = jnp.bfloat16
    quant: bool = False   # int8 serving mode for the two 3x3 convs
    quant_mode: str = "dynamic"

    @nn.compact
    def __call__(self, x, params0, params1, skip0=None, skip1=None, *,
                 train: bool = False):
        def conv(name, h):
            if self.quant:
                # UNPADDED input: the quant site pads after the quantize
                return _QConv3x3(self.dim, self.dtype, self.quant_mode,
                                 self.pad_type, name=name)(h)
            return nn.Conv(self.dim, (3, 3), padding="VALID",
                           dtype=self.dtype, param_dtype=jnp.float32,
                           name=name)(pad2d(h, 1, self.pad_type))

        h = conv("conv0", x)
        h = AdaINFusion(self.dim, self.dtype, name="adain0")(
            h, *params0, skip=skip0, train=train)
        h = nn.relu(h)
        h = conv("conv1", h)
        h = AdaINFusion(self.dim, self.dtype, name="adain1")(
            h, *params1, skip=skip1, train=train)
        return x + h


class Decoder(nn.Module):
    """AdaIN decoder; ``subpixel_upsample`` selects the TPU-first fast mode.

    Fast mode (default): every upsample+conv pair runs as its exact subpixel
    decomposition (UpsampleConv), the last stage stays in phase layout, and
    the head is the folded PhaseHead — ~2x end-to-end throughput.  Each op
    is exact in the interior, but the 2-pixel reflect borders are
    approximated at low resolution, and since instance-norm statistics pool
    over ALL pixels the two modes' outputs diverge gradually through the
    stack (~0.9 output correlation with random weights).  A model is
    trained and served in ONE mode (recorded in its config); exact mode
    reproduces the reference's upsample semantics for parity studies.
    Parameters are interchangeable between modes.
    """

    dim: int = 512
    ups: int = 3
    out_dim: int = 1
    pad_type: str = "reflect"
    subpixel_upsample: bool = True   # see class docstring
    # one-pass Pallas IN+ReLU for the spatial-layout upsample stages
    # (ops/in_relu_pallas.py); opt-in until it measurably beats the
    # XLA-fused path on the target chip (cli/bench_kernels.py A/B)
    use_pallas_in: bool = False
    # int8 serving mode: res-block + upsample convs on the int8 MXU path
    # (ops/quant.py).  Inference only; requires subpixel mode.
    # Norms/iAFF/head stay bf16.  quant_mode "static" needs a calibrated
    # "quant" variable collection (run a "calib" decoder first).
    quant: bool = False
    quant_mode: str = "dynamic"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        content: jnp.ndarray,                 # (B, 8, 27, 512) mixed feature
        adain_params: jnp.ndarray,            # (B, 4096) from the text code
        style_pyramid: Sequence[jnp.ndarray], # 5 style-encoder taps, NHWC
        *,
        train: bool = False,
    ):
        sites = split_adain_params(adain_params, 4, self.dim)
        # skip injections (GAN_word/modules_tro.py:236-239):
        #   AdaIN site 1 <- maxpool2x2(style_pyramid[3]); site 3 <- pyramid[4]
        skip1 = nn.max_pool(style_pyramid[3], (2, 2), strides=(2, 2))
        skip3 = style_pyramid[4]

        x = AdaINResBlock(self.dim, self.pad_type, self.dtype,
                          quant=self.quant, quant_mode=self.quant_mode,
                          name="res0")(
            content, sites[0], sites[1], skip0=None, skip1=skip1, train=train)
        x = AdaINResBlock(self.dim, self.pad_type, self.dtype,
                          quant=self.quant, quant_mode=self.quant_mode,
                          name="res1")(
            x, sites[2], sites[3], skip0=None, skip1=skip3, train=train)

        dim = self.dim
        for i in range(self.ups):
            dim //= 2
            last = i == self.ups - 1
            phase = self.subpixel_upsample and last
            x = UpsampleConv(dim, subpixel=self.subpixel_upsample,
                             emit_phase=phase, dtype=self.dtype,
                             quant=self.quant, quant_mode=self.quant_mode,
                             name=f"up{i}")(x)
            if phase:
                x = nn.relu(instance_norm_phase(x))
            elif (self.use_pallas_in and not train
                    and x.shape[-1] % 128 == 0):   # fwd-only kernel
                from affganwriting_tpu.ops.in_relu_pallas import (
                    instance_norm_relu,
                )

                x = instance_norm_relu(x)
            else:
                x = nn.relu(instance_norm(x))
        if self.subpixel_upsample:
            # head consumes phase layout; final d2s happens at out_dim
            # channels (cheap) instead of at `dim` channels
            return PhaseHead(self.out_dim, self.dtype, name="head")(x)
        return ExactHead(self.out_dim, self.pad_type, self.dtype,
                         name="head")(x)
