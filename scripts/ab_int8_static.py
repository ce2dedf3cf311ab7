"""TPU A/B: static-calibrated int8 generator vs dynamic vs bf16.

Round-3 follow-up to the w8a8 serving mode (docs/ARCHITECTURE.md int8
section): dynamic per-sample scales made G LOSE (0.95x — the amax pass
eats the MXU win).  Static calibrated scales remove the amax pass and let
the quantize fuse into the producer epilogue; this script measures whether
that flips G's int8 path into a win, plus the full pipeline with int8-R +
static-int8-G.

Usage: timeout 1800 python scripts/ab_int8_static.py [batch]
Prints one JSON line per variant (streaming methodology, bench.py rules).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import N_STREAM, _setup, _stream_styles, _sync  # noqa: E402


def stream_rate(fn, args_list, batch):
    _sync(fn(*args_list[0]))   # warm
    t0 = time.perf_counter()
    outs = [fn(*a) for a in args_list]
    for o in outs:
        _sync(o)
    return len(args_list) * batch / (time.perf_counter() - t0)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    from affganwriting_tpu.gen.inference import (
        calibrate_gen_quant,
        make_generate_and_read_fn,
        make_generate_and_read_quant_fn,
        make_generate_fn,
    )
    from affganwriting_tpu.ops.quant import prepare_vgg_quant

    cfg, gen_vars, rec_vars, style, labels = _setup(batch)
    styles = _stream_styles(style, N_STREAM)

    base = make_generate_and_read_fn(cfg)
    calib_imgs, _ = base(gen_vars, rec_vars, style, labels)
    qparams = prepare_vgg_quant(rec_vars, calib_imgs)
    gen_vars_cal = calibrate_gen_quant(cfg, gen_vars, style, labels)

    report = {}

    # --- generate program only: bf16 / dynamic int8 / static int8
    gen_bf16 = make_generate_fn(cfg)
    report["gen_bf16"] = stream_rate(
        gen_bf16, [(gen_vars, s, labels) for s in styles], batch)
    for mode in ("dynamic", "static"):
        q = make_generate_and_read_quant_fn(cfg, quant_gen=mode)
        v = gen_vars_cal if mode == "static" else gen_vars
        report[f"gen_int8_{mode}"] = stream_rate(
            q.run_gen, [(v, s, labels) for s in styles], batch)
        print(json.dumps({"variant": f"gen_int8_{mode}",
                          "imgs_per_sec": round(report[f"gen_int8_{mode}"], 1),
                          "vs_bf16": round(report[f"gen_int8_{mode}"]
                                           / report["gen_bf16"], 3)}),
              flush=True)

    # --- full pipeline: bf16 / int8 R only / int8 R + static int8 G
    report["pipe_bf16"] = stream_rate(
        base, [(gen_vars, rec_vars, s, labels) for s in styles], batch)
    pipe_r = make_generate_and_read_quant_fn(cfg)
    report["pipe_int8R"] = stream_rate(
        pipe_r, [(gen_vars, rec_vars, qparams, s, labels) for s in styles],
        batch)
    pipe_rg = make_generate_and_read_quant_fn(cfg, quant_gen="static")
    report["pipe_int8R_staticG"] = stream_rate(
        pipe_rg,
        [(gen_vars_cal, rec_vars, qparams, s, labels) for s in styles],
        batch)

    for k, v in report.items():
        print(json.dumps({"variant": k, "batch": batch,
                          "imgs_per_sec": round(v, 1),
                          "vs_bf16_pipe": round(v / report["pipe_bf16"], 3)}),
              flush=True)


if __name__ == "__main__":
    main()
