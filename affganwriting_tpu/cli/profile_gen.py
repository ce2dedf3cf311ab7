"""Sub-stage profiling of the generator half of the headline pipeline.

``python -m affganwriting_tpu.cli.profile_gen --batch 2048`` splits the
``generate`` stage (profile_pipeline.py) into its three phases and times
each as a standalone XLA program with the streaming methodology:

  text_mix   labels -> (adain_params, content) -> mixed   (TextEncoderFC +
             SplitMix; the only per-word work before the decoder)
  res        2 AdaIN ResBlocks at (8, 27, 512) incl. the two iAFF skip
             fusions — the "AFF" in AFFGANwriting
  res_plain  same blocks with skips disabled (iAFF cost = res - res_plain)
  upchain    (8, 27, 512) -> (64, 216, 1): 3 subpixel upsample convs,
             instance norms, phase head

Wrapper modules mirror the decoder's submodule names exactly so they bind
the real generator's parameter subtrees — the timed programs run the same
weights the full pipeline runs.  Used for the round-3 G-MFU accounting
(docs/ARCHITECTURE.md); reference pipeline being modeled:
GAN_word/tt.test_single_writer.4_scenarios.py:152-181.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

PEAK_FLOPS = 197e12
PEAK_HBM = 819e9


def _sync(out) -> float:
    x = out[0] if isinstance(out, (tuple, list)) else out
    return float(np.asarray(x[(0,) * getattr(x, "ndim", 0)]))


def _stream_time(fn, args_a, args_b, n: int) -> float:
    _sync(fn(*args_a))
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(*(args_a if i % 2 == 0 else args_b))
    _sync(out)
    return (time.perf_counter() - t0) / n


def _cost(fn, *args) -> dict:
    try:
        compiled = fn.lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return {"flops": float(ca.get("flops", 0.0)),
                "bytes": float(ca.get("bytes accessed", 0.0))}
    except Exception as e:
        return {"flops": 0.0, "bytes": 0.0, "error": str(e)[:80]}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=2048)
    p.add_argument("--n-stream", type=int, default=30)
    p.add_argument("--stages", default=None)
    args = p.parse_args(argv)

    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from affganwriting_tpu.core.cache import enable_compile_cache

    enable_compile_cache()

    from affganwriting_tpu.core.config import default_config
    from affganwriting_tpu.gen.inference import encode_labels
    from affganwriting_tpu.models.decoder import (
        AdaINResBlock,
        PhaseHead,
        UpsampleConv,
        instance_norm_phase,
        split_adain_params,
    )
    from affganwriting_tpu.ops.norms import instance_norm
    from affganwriting_tpu.train.state import build_models

    cfg = default_config()
    gen, _, _, _ = build_models(cfg)
    b = args.batch
    rng = np.random.default_rng(0)
    dtype = jnp.dtype(cfg.compute_dtype)

    style = jnp.asarray(rng.normal(size=(1, 64, 216, 50)), jnp.float32)
    words = ["profile", "generator", "substage", "timing"] * (b // 4 + 1)
    labels = jnp.asarray(encode_labels(words[:b], cfg.output_max_len))
    gv = jax.jit(gen.init)(jax.random.key(0), style, labels[:1])

    enc_style = jax.jit(lambda v, s: gen.apply(
        v, s, train=False, method=gen.encode_style))
    pyramid = jax.block_until_ready(enc_style(gv, style))

    # --- stage wrappers bound to the generator's real param subtrees ----
    dim = cfg.style_dim

    def text_mix_method(m, lab, f_xs):
        ap, content = m.encode_text(lab, f_xs.shape[1:3], train=False)
        return m.mix(f_xs, content), ap

    text_mix = jax.jit(lambda v, lab, f
                       : gen.apply(v, lab, f, method=text_mix_method))

    class ResStage(nn.Module):
        use_skips: bool = True

        @nn.compact
        def __call__(self, mixed, adain_params, skip1, skip3):
            sites = split_adain_params(adain_params, 4, dim)
            s1 = skip1 if self.use_skips else None
            s3 = skip3 if self.use_skips else None
            x = AdaINResBlock(dim, "reflect", dtype, name="res0")(
                mixed, sites[0], sites[1], skip0=None, skip1=s1)
            return AdaINResBlock(dim, "reflect", dtype, name="res1")(
                x, sites[2], sites[3], skip0=None, skip1=s3)

    class UpChain(nn.Module):
        @nn.compact
        def __call__(self, x):
            d = dim
            for i in range(3):
                d //= 2
                last = i == 2
                x = UpsampleConv(d, subpixel=True, emit_phase=last,
                                 dtype=dtype, name=f"up{i}")(x)
                x = (nn.relu(instance_norm_phase(x)) if last
                     else nn.relu(instance_norm(x)))
            return PhaseHead(1, dtype, name="head")(x)

    dec_p = gv["params"]["dec"]
    dec_bs = gv["batch_stats"]["dec"]
    res_vars = {
        "params": {k: dec_p[k] for k in ("res0", "res1")},
        "batch_stats": dec_bs,
    }
    up_vars = {"params": {k: dec_p[k]
                          for k in ("up0", "up1", "up2", "head")}}

    res_mod = ResStage(use_skips=True)
    res_plain_mod = ResStage(use_skips=False)
    up_mod = UpChain()

    skip1 = nn.max_pool(pyramid[3], (2, 2), strides=(2, 2))
    skip3 = pyramid[4]

    mixed, ap = jax.block_until_ready(text_mix(gv, labels, pyramid[-1]))
    mixed_b, ap_b = mixed + 0.01, ap + 0.01
    res_fn = jax.jit(lambda v, m, a: res_mod.apply(
        v, m, a, skip1, skip3))
    res_plain_fn = jax.jit(lambda v, m, a: res_plain_mod.apply(
        v, m, a, skip1, skip3))
    x_res = jax.block_until_ready(res_fn(res_vars, mixed, ap))
    x_res_b = x_res + 0.01
    up_fn = jax.jit(lambda v, x: up_mod.apply(v, x))

    labels_b = jnp.roll(labels, 1, axis=0)
    stages = {
        "text_mix": (text_mix, (gv, labels, pyramid[-1]),
                     (gv, labels_b, pyramid[-1])),
        "res": (res_fn, (res_vars, mixed, ap), (res_vars, mixed_b, ap_b)),
        "res_plain": (res_plain_fn, (res_vars, mixed, ap),
                      (res_vars, mixed_b, ap_b)),
        "upchain": (up_fn, (up_vars, x_res), (up_vars, x_res_b)),
    }
    only = set(args.stages.split(",")) if args.stages else None
    for name, (fn, a, bb) in stages.items():
        if only and name not in only:
            continue
        sec = _stream_time(fn, a, bb, args.n_stream)
        cost = _cost(fn, *a)
        print(json.dumps({
            "stage": name,
            "batch": b,
            "ms_per_call": round(1000 * sec, 3),
            "imgs_per_sec": round(b / sec, 1),
            "gflops_per_call": round(cost["flops"] / 1e9, 2),
            "mfu": round(cost["flops"] / sec / PEAK_FLOPS, 4),
            "gbytes_per_call": round(cost["bytes"] / 1e9, 3),
            "hbm_frac": round(cost["bytes"] / sec / PEAK_HBM, 4),
        }), flush=True)


if __name__ == "__main__":
    main()
