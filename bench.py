"""Headline benchmark: generated 64x216 word images/sec/chip.

Measures the batched generation pipeline (style stack encoded once per
writer, words decoded in batch) on the attached accelerator — the TPU-native
replacement for the reference's one-word-at-a-time Python loop
(GAN_word/tt.test_single_writer.4_scenarios.py:152-181).  Prints ONE JSON
line; ``vs_baseline`` is relative to the 5,000 imgs/sec/chip target
(BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _run(batch: int) -> float:
    import jax

    from affganwriting_tpu.core.config import default_config
    from affganwriting_tpu.gen.inference import encode_labels, make_generate_fn
    from affganwriting_tpu.train.state import build_models

    cfg = default_config()  # bf16, resnet50 style encoder, 64x216
    gen, _, _, _ = build_models(cfg)

    rng = np.random.default_rng(0)
    style = np.asarray(
        rng.normal(size=(1, cfg.img_height, cfg.img_width, cfg.style_stack)),
        np.float32,
    )
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    words = [
        "word" + alphabet[i % 26] + alphabet[(i // 26) % 26]
        for i in range(batch)
    ]
    labels = encode_labels(words, cfg.output_max_len)

    variables = jax.jit(gen.init)(jax.random.key(0), style, labels[:1])
    fn = make_generate_fn(cfg)

    # warmup / compile
    out = jax.block_until_ready(fn(variables, style, labels))
    assert out.shape == (batch, cfg.img_height, cfg.img_width, 1)

    # time each call individually with distinct inputs AND a forced value
    # fetch per call: distinct args defeat any runtime result caching of
    # repeated identical calls, and fetching an output element guarantees
    # the device actually executed (block_until_ready alone is unreliable
    # on tunneled runtimes).  Median per-call latency includes dispatch —
    # the reported rate is what a serving loop actually sustains.
    import jax.numpy as jnp

    iters = 20
    styles = [jnp.asarray(style + np.float32(i) * 1e-3)
              for i in range(iters)]
    for s in styles:
        float(jnp.sum(s))  # materialize inputs before timing
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        out = fn(variables, styles[i], labels)
        float(out[0, 0, 0, 0])
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]  # median call latency
    return batch / dt


def main():
    if "--batch" in sys.argv:
        batches = [int(sys.argv[sys.argv.index("--batch") + 1])]
    else:
        # remote compiles of the largest batch can fail transiently
        # (observed HTTP-500 from the compile helper); fall back rather
        # than reporting nothing
        batches = [2048, 1024, 256]
    imgs_per_sec = None
    for b in batches:
        try:
            imgs_per_sec = _run(b)
            batch = b
            break
        except Exception as e:  # noqa: BLE001
            print(f"bench batch {b} failed: {type(e).__name__}",
                  file=sys.stderr)
    if imgs_per_sec is None:
        raise SystemExit("all bench batch sizes failed")
    target = 5000.0
    print(json.dumps({
        "metric": "generated 64x216 word images/sec/chip",
        "value": round(imgs_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / target, 3),
    }))


if __name__ == "__main__":
    main()
