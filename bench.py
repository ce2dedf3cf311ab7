"""Headline benchmark: generate+recognize 64x216 word images/sec/chip.

The honest metric: every image the reference's generation pipeline emits is
also recognized by R (GAN_word/tt.test_single_writer.4_scenarios.py:152-181
loops generate -> recognize -> filter per word).  Here that whole pipeline
— style stack encoded once, a batch of words decoded, R's greedy scan over
every generated image — is ONE XLA program, timed end-to-end with dispatch.

Prints ONE JSON line; ``vs_baseline`` is relative to the 5,000
imgs/sec/chip target (BASELINE.md).  Secondary rates (G-only, train step)
ride along in ``extra``.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _median_rate(fn, args, batch, iters=20, vary=None):
    """Median per-call throughput with a forced value fetch per call."""
    out = fn(*args)
    first = out[0] if isinstance(out, tuple) else out
    float(np.asarray(first).ravel()[0])   # materialize warmup

    times = []
    for i in range(iters):
        a = vary(args, i) if vary is not None else args
        t0 = time.perf_counter()
        out = fn(*a)
        first = out[0] if isinstance(out, tuple) else out
        float(np.asarray(first).ravel()[0])
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    return batch / dt


def _setup(batch):
    import jax

    from affganwriting_tpu.core.config import default_config
    from affganwriting_tpu.gen.inference import encode_labels
    from affganwriting_tpu.train.state import build_models

    cfg = default_config()  # bf16, resnet50 style encoder, 64x216
    gen, _, _, rec = build_models(cfg)

    rng = np.random.default_rng(0)
    style = np.asarray(
        rng.normal(size=(1, cfg.img_height, cfg.img_width, cfg.style_stack)),
        np.float32)
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    words = ["word" + alphabet[i % 26] + alphabet[(i // 26) % 26]
             for i in range(batch)]
    labels = encode_labels(words, cfg.output_max_len)

    gen_vars = jax.jit(gen.init)(jax.random.key(0), style, labels[:1])
    img0 = np.zeros((1, cfg.img_height, cfg.img_width, 1), np.float32)
    rec_vars = jax.jit(rec.init)(jax.random.key(1), img0, labels[:1])
    return cfg, gen_vars, rec_vars, style, labels


def _vary_style(args, i):
    """Perturb the style input per call so no runtime result cache can
    short-circuit repeated identical calls."""
    import jax.numpy as jnp

    a = list(args)
    for j, x in enumerate(a):
        if hasattr(x, "shape") and getattr(x, "ndim", 0) == 4:
            a[j] = jnp.asarray(np.asarray(x) + np.float32(i) * 1e-3)
            break
    return tuple(a)


def _run_gen_read(batch: int) -> tuple[float, float]:
    """Returns (streaming rate, per-call rate).

    Streaming = the serving-loop number: N generate+recognize batches
    dispatched back-to-back (jax async pipelines host dispatch with device
    execution), results fetched at the end — the reference's offline
    generation sweep is exactly this shape.  Per-call = median latency
    with a forced fetch per call (stricter; includes one round-trip)."""
    import jax.numpy as jnp

    from affganwriting_tpu.gen.inference import make_generate_and_read_fn

    cfg, gen_vars, rec_vars, style, labels = _setup(batch)
    fn = make_generate_and_read_fn(cfg)

    percall = _median_rate(
        fn, (gen_vars, rec_vars, style, labels), batch, vary=_vary_style)

    n_stream = 10
    styles = [jnp.asarray(style + np.float32(i) * 1e-3)
              for i in range(n_stream)]
    for s in styles:
        float(np.asarray(s).ravel()[0])   # materialize inputs
    # warm the program
    out = fn(gen_vars, rec_vars, styles[0], labels)
    float(np.asarray(out[1]).ravel()[0])
    t0 = time.perf_counter()
    preds = [fn(gen_vars, rec_vars, s, labels)[1] for s in styles]
    for p in preds:
        float(np.asarray(p).ravel()[0])   # drain the stream
    dt = time.perf_counter() - t0
    return n_stream * batch / dt, percall


def _run_gen_only(batch: int) -> float:
    from affganwriting_tpu.gen.inference import make_generate_fn

    cfg, gen_vars, _, style, labels = _setup(batch)
    fn = make_generate_fn(cfg)
    return _median_rate(
        fn, (gen_vars, style, labels), batch, vary=_vary_style)


def _run_train_step(batch: int) -> float:
    """Images trained/sec through the full four-player step."""
    import jax

    from affganwriting_tpu.core.config import VOCAB, default_config
    from affganwriting_tpu.train.state import init_state
    from affganwriting_tpu.train.step import make_train_step

    cfg = default_config().replace(batch_size=batch)
    state = init_state(cfg, jax.random.key(0))
    step = jax.jit(make_train_step(cfg))

    rng = np.random.default_rng(0)
    lab = lambda w: VOCAB.pad_label(w, cfg.output_max_len)  # noqa: E731
    batch_d = {
        "style_imgs": rng.normal(size=(
            batch, cfg.img_height, cfg.img_width,
            cfg.style_stack)).astype(np.float32),
        "img_xt": rng.normal(size=(
            batch, cfg.img_height, cfg.img_width, 1)).astype(np.float32),
        "writer_ids": (np.arange(batch) % cfg.num_writers).astype(np.int32),
        "label_xt": np.asarray([lab("deep")] * batch, np.int32),
        "label_xt_swap": np.asarray([lab("dep")] * batch, np.int32),
        "label_ch0": np.asarray([lab("word")] * batch, np.int32),
    }
    key = jax.random.key(1)

    def fn(s, b, k):
        new_state, metrics, _ = step(s, b, k)
        return (metrics["l_total"], new_state)

    # state threads through; time per-step latency
    new_out = fn(state, batch_d, key)
    float(np.asarray(new_out[0]))
    times = []
    s = new_out[1]
    for _ in range(8):
        t0 = time.perf_counter()
        out = fn(s, batch_d, key)
        float(np.asarray(out[0]))
        times.append(time.perf_counter() - t0)
        s = out[1]
    dt = sorted(times)[len(times) // 2]
    return batch / dt


def _try(fn, batches):
    for b in batches:
        try:
            return fn(b), b
        except Exception as e:  # noqa: BLE001 — transient remote-compile 500s
            print(f"bench {fn.__name__} batch {b} failed: "
                  f"{type(e).__name__}", file=sys.stderr)
    return None, None


def main():
    if "--batch" in sys.argv:
        batches = [int(sys.argv[sys.argv.index("--batch") + 1])]
    else:
        batches = [2048, 1024, 256]

    res, b_used = _try(_run_gen_read, batches)
    if res is None:
        raise SystemExit("all gen+read batch sizes failed")
    gen_read, percall = res

    extra = {"gen_read_batch": b_used,
             "gen_read_percall_imgs_per_sec": round(percall, 1)}
    if "--quick" not in sys.argv:
        gen_only, b_g = _try(_run_gen_only, batches)
        if gen_only is not None:
            extra["gen_only_imgs_per_sec"] = round(gen_only, 1)
            extra["gen_only_batch"] = b_g
        train_rate, b_t = _try(_run_train_step, [64, 32, 8])
        if train_rate is not None:
            extra["train_imgs_per_sec"] = round(train_rate, 1)
            extra["train_batch"] = b_t

    target = 5000.0
    print(json.dumps({
        "metric": "generate+recognize 64x216 word images/sec/chip",
        "value": round(gen_read, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(gen_read / target, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
