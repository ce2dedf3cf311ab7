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

    # chain the op inside ONE program so per-call dispatch/sync overhead
    # (tens of ms on the tunneled runtime) amortizes away; the +1e-3
    # between applications defeats CSE
    chain = 50

    def chained(op):
        def run(x):
            def body(h, _):
                return op(h) + jnp.asarray(1e-3, h.dtype), None

            h, _ = jax.lax.scan(body, x, None, length=chain)
            return jnp.sum(h)

        return jax.jit(run)

    xla_fn = chained(lambda h: jax.nn.relu(instance_norm(h)))
    pl_fn = chained(lambda h: instance_norm_relu(h))

    b = args.batch
    # the decoder's spatial-layout upsample stages at 64x216 words
    shapes = [(b, 16, 54, 256), (b, 32, 108, 128)]
    rng = np.random.default_rng(0)
    for shape in shapes:
        x = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
        t_xla = _time(xla_fn, x, iters=args.iters) / chain
        t_pl = _time(pl_fn, x, iters=args.iters) / chain
        print(json.dumps({
            "kernel": "in_relu",
            "shape": list(shape),
            "chain": chain,
            "xla_ms": round(t_xla * 1e3, 3),
            "pallas_ms": round(t_pl * 1e3, 3),
            "speedup": round(t_xla / t_pl, 3),
        }))


if __name__ == "__main__":
    main()
