"""A/B microbenchmarks: Pallas kernels vs the XLA-fused jnp paths.

``python -m affganwriting_tpu.cli.bench_kernels`` times each kernel against
its jnp equivalent at the decoder's real shapes on the attached chip and
prints one JSON line per shape.  Kernels only become defaults when they win
here (the round-1 AdaIN kernel lost this A/B and was deleted).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _time(fn, *args, iters: int = 20):
    out = fn(*args)
    float(np.asarray(out).ravel()[0])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(out).ravel()[0])
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from affganwriting_tpu.ops.in_relu_pallas import instance_norm_relu
    from affganwriting_tpu.ops.norms import instance_norm

    xla_fn = jax.jit(lambda x: jnp.sum(
        jax.nn.relu(instance_norm(x))))
    pl_fn = jax.jit(lambda x: jnp.sum(instance_norm_relu(x)))

    b = args.batch
    # the decoder's spatial-layout upsample stages at 64x216 words
    shapes = [(b, 16, 54, 256), (b, 32, 108, 128)]
    rng = np.random.default_rng(0)
    for shape in shapes:
        x = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
        t_xla = _time(xla_fn, x, iters=args.iters)
        t_pl = _time(pl_fn, x, iters=args.iters)
        print(json.dumps({
            "kernel": "in_relu",
            "shape": list(shape),
            "xla_ms": round(t_xla * 1e3, 2),
            "pallas_ms": round(t_pl * 1e3, 2),
            "speedup": round(t_xla / t_pl, 3),
        }))


if __name__ == "__main__":
    main()
