"""Post-training w8a8 quantization for the inference hot convs.

The v5e MXU runs int8 x int8 -> int32 at 2x the bf16 rate (measured 1.62x
end-to-end on the generator's residual conv shapes — `docs/ARCHITECTURE.md`
round-3 kernel notes).  The reference has no quantized path (all fp32
torch/cuDNN); this is a TPU-native serving optimization for the offline
generation+recognition sweep (GAN_word/tt.test_single_writer.4_scenarios.py),
shipped OPT-IN next to the bf16 path and gated by feature-error and
throughput A/Bs (tests/test_quant.py, cli/bench_kernels.py discipline).

Scheme (standard symmetric PTQ):
  * weights: per-output-channel int8, scale ``sw[o] = amax(|w[..., o]|)/127``
    — BatchNorm is folded into the conv first (inference running stats).
  * activations: per-tensor int8 with STATIC scales calibrated by running
    the folded bf16 trunk on a calibration batch and recording per-layer
    ``amax`` (dynamic per-batch amax would cost one extra full read of
    every activation tensor per layer).
  * accumulation in int32 (``preferred_element_type``), dequantize + bias
    + ReLU fused by XLA into the conv epilogue; inter-layer tensors are
    written as int8 (half the HBM traffic of the bf16 path).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

_DN = ("NHWC", "HWIO", "NHWC")


def fold_bn(kernel, bias, scale, bn_bias, mean, var, eps=1e-5):
    """Fold inference BatchNorm into the preceding conv.

    y = scale * (conv(x, k) + b - mean) / sqrt(var + eps) + bn_bias
      = conv(x, k * s) + (b - mean) * s + bn_bias,   s = scale / sqrt(var+eps)
    """
    s = scale / np.sqrt(np.asarray(var, np.float64) + eps)
    s = jnp.asarray(s, jnp.float32)
    return kernel * s, (bias - mean) * s + bn_bias


def quantize_weight(w):
    """(..., O) f32 kernel -> (int8 kernel, per-output-channel scale (O,))."""
    amax = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)))
    sw = jnp.maximum(amax, 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w / sw), -127, 127).astype(jnp.int8)
    return wq, sw.astype(jnp.float32)


def quantize_act(x, amax):
    """Per-tensor symmetric int8 with a static (calibrated) scale."""
    scale = 127.0 / jnp.maximum(amax, 1e-12)
    return jnp.clip(jnp.round(x.astype(jnp.float32) * scale),
                    -127, 127).astype(jnp.int8)


def int8_conv(x_q, w_q, sx, sw, bias, *, padding="SAME", strides=(1, 1),
              out_dtype=jnp.bfloat16):
    """int8 conv + fused dequant/bias epilogue.

    x_q (B,H,W,Ci) int8, w_q (kh,kw,Ci,Co) int8; sx scalar activation
    scale (amax/127), sw (Co,) weight scales; bias (Co,) f32.
    """
    acc = jax.lax.conv_general_dilated(
        x_q, w_q, strides, padding, dimension_numbers=_DN,
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (sx * sw) + bias
    return y.astype(out_dtype)


def dyn_int8_conv(x, w, bias=None, *, padding="VALID", strides=(1, 1),
                  out_dtype=jnp.bfloat16):
    """int8 conv with DYNAMIC per-sample activation scales.

    Used inside the generator's decoder where AdaIN makes activation
    ranges sample-dependent (static calibration would clip): one extra
    reduction pass computes ``amax`` per sample, then the conv runs on the
    int8 MXU path and the epilogue dequantizes with the per-sample x
    per-channel outer scale.  The weight is quantized in-graph (negligible
    next to the activation tensors).  Exact-scale quantization: no
    clipping, pure rounding error.
    """
    sx = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(1, 2, 3),
                 keepdims=True)                        # (B, 1, 1, 1)
    sx = jnp.maximum(sx, 1e-12)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * (127.0 / sx)),
                  -127, 127).astype(jnp.int8)
    wq, sw = quantize_weight(w.astype(jnp.float32))
    acc = jax.lax.conv_general_dilated(
        xq, wq, strides, padding, dimension_numbers=_DN,
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * ((sx / 127.0) * sw)
    if bias is not None:
        y = y + bias
    return y.astype(out_dtype)


def static_int8_conv(x, w, amax, bias=None, *, padding="VALID",
                     strides=(1, 1), out_dtype=jnp.bfloat16,
                     pad: int = 0, pad_type: str = "reflect"):
    """int8 conv with a STATIC (calibrated) per-tensor activation scale.

    Unlike ``dyn_int8_conv`` there is no amax pass: the quantize is pure
    elementwise and XLA fuses it into the producer's epilogue, so the
    inter-op tensor is *written* int8 (half the bf16 traffic) instead of
    costing an extra read.  ``amax`` comes from a calibration forward
    (max |x| over a representative batch — see the decoder's ``calib``
    quant mode); samples beyond the calibrated range clip.

    ``pad`` spatial-pads AFTER the quantize (reflect padding commutes with
    elementwise quantization), so the pad copy moves int8, not bf16.
    """
    sx = jnp.maximum(amax, 1e-12)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * (127.0 / sx)),
                  -127, 127).astype(jnp.int8)
    if pad:
        from affganwriting_tpu.models.blocks import pad2d

        xq = pad2d(xq, pad, pad_type)
    wq, sw = quantize_weight(w.astype(jnp.float32))
    acc = jax.lax.conv_general_dilated(
        xq, wq, strides, padding, dimension_numbers=_DN,
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * ((sx / 127.0) * sw)
    if bias is not None:
        y = y + bias
    return y.astype(out_dtype)


def _vgg_layers(variables) -> list[dict[str, Any]]:
    """Extract the VGG trunk's conv+BN stacks as folded (w, b) pairs.

    variables: the RECOGNIZER variables dict; trunk lives under
    params/enc/vgg + batch_stats/enc/vgg (models/recognizer/encoder.py).
    """
    p = variables["params"]["enc"]["vgg"]
    bs = variables["batch_stats"]["enc"]["vgg"]
    out = []
    i = 0
    while f"conv{i}" in p:
        w, b = fold_bn(
            p[f"conv{i}"]["kernel"], p[f"conv{i}"]["bias"],
            p[f"bn{i}"]["scale"], p[f"bn{i}"]["bias"],
            bs[f"bn{i}"]["mean"], bs[f"bn{i}"]["var"])
        out.append({"w": w, "b": jnp.asarray(b, jnp.float32)})
        i += 1
    return out


def _trunk_plan():
    from affganwriting_tpu.models.recognizer.encoder import _VGG19_CFG

    return _VGG19_CFG


def folded_vgg_apply(folded, img, dtype=jnp.bfloat16):
    """The bf16 trunk with BN pre-folded — the quant path's fp reference
    and the calibration forward.  img: (B, H, W, 1 or 3)."""
    if img.shape[-1] == 1:
        img = jnp.concatenate([img] * 3, axis=-1)
    x = img.astype(dtype)
    amaxes = []
    ci = 0
    for v in _trunk_plan():
        if v == "M":
            x = nn_max_pool(x)
        else:
            amaxes.append(jnp.max(jnp.abs(x.astype(jnp.float32))))
            layer = folded[ci]
            y = jax.lax.conv_general_dilated(
                x, layer["w"].astype(dtype), (1, 1), "SAME",
                dimension_numbers=_DN)
            x = jax.nn.relu(y + layer["b"].astype(dtype)).astype(dtype)
            ci += 1
    return x, amaxes


def nn_max_pool(x):
    init = (-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
            else jnp.iinfo(x.dtype).min)
    return jax.lax.reduce_window(
        x, jnp.asarray(init, x.dtype), jax.lax.max,
        (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def prepare_vgg_quant(rec_variables, calib_images) -> dict[str, Any]:
    """Host-side prep: fold BN, quantize weights per-channel, calibrate
    per-layer activation amaxes on ``calib_images`` (a representative batch,
    e.g. a few hundred generated words)."""
    folded = _vgg_layers(rec_variables)
    _, amaxes = jax.jit(lambda im: folded_vgg_apply(folded, im))(
        calib_images)
    layers = []
    for i, (layer, amax) in enumerate(zip(folded, amaxes)):
        w = jnp.asarray(layer["w"], jnp.float32)
        wq, sw = quantize_weight(w)
        entry = {
            "wq": wq, "sw": sw, "b": layer["b"],
            "amax": jnp.maximum(jnp.asarray(amax, jnp.float32), 1e-6),
        }
        if i == 0:
            # grayscale fold: conv(concat(x,x,x), w) == conv(x, sum_c w_c)
            wq_g, sw_g = quantize_weight(w.sum(axis=2, keepdims=True))
            entry["wq_gray"], entry["sw_gray"] = wq_g, sw_g
        layers.append(entry)
    return {"layers": layers}


def vgg_quant_apply(q, img, dtype=jnp.bfloat16):
    """int8 trunk forward: (B, 64, 216, 1|3) -> (B, 4, 13, 512) bf16.

    Matches VGGTrunk (inference mode) up to quantization error; the tail
    (BiGRU + decoder) stays bf16/f32 via Recognizer.read_features.

    Layout discipline: every inter-layer tensor is carried int8 — each
    conv's epilogue fuses dequant+bias+ReLU+*next-layer quantize* and
    writes int8; max-pools run on the int8 tensor directly.  This is
    numerically identical to pool-then-quantize (max commutes with the
    monotone quantize map and ReLU'd tensors keep their amax through
    pooling) but moves 1 byte/elem instead of 2-3 across every layer
    boundary — the trunk is partly HBM-bound at the full-res layers.

    The grayscale input replicated to 3 channels is folded into the first
    kernel instead (``conv(concat(x,x,x), w) == conv(x, sum_c w_c)``,
    folded at ``prepare_vgg_quant`` time) — no concat materialization.
    """
    layers = q["layers"]
    gray = img.shape[-1] == 1
    if gray and "wq_gray" not in layers[0]:
        img = jnp.concatenate([img] * 3, axis=-1)
        gray = False
    x_q = quantize_act(img, layers[0]["amax"])
    ci = 0
    n = len(layers)
    for v in _trunk_plan():
        if v == "M":
            x_q = nn_max_pool(x_q)
        else:
            layer = layers[ci]
            wq = layer["wq_gray"] if (gray and ci == 0) else layer["wq"]
            sw = layer["sw_gray"] if (gray and ci == 0) else layer["sw"]
            acc = jax.lax.conv_general_dilated(
                x_q, wq, (1, 1), "SAME", dimension_numbers=_DN,
                preferred_element_type=jnp.int32)
            y = jax.nn.relu(
                acc.astype(jnp.float32) * ((layer["amax"] / 127.0) * sw)
                + layer["b"])
            if ci + 1 < n:
                # quantize with the NEXT conv's calibrated scale inside
                # this epilogue; the intervening pool (if any) commutes
                x_q = quantize_act(y, layers[ci + 1]["amax"])
            else:
                out = y.astype(dtype)
            ci += 1
    return out
