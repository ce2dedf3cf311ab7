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

    # ---- decoder head: jnp tap-major reassociation vs the Pallas fold ----
    # (streaming: dispatch N, fetch one element of the last output — the
    # chain trick doesn't apply since head output shape != input shape)
    from affganwriting_tpu.models.decoder import PhaseHead

    def _stream(fn, a, bb, n=20):
        out = fn(a)
        float(np.asarray(out[(0,) * out.ndim]))
        t0 = time.perf_counter()
        for i in range(n):
            out = fn(a if i % 2 == 0 else bb)
        float(np.asarray(out[(0,) * out.ndim]))
        return (time.perf_counter() - t0) / n

    x4 = jnp.asarray(rng.normal(size=(b, 32, 108, 256)) * 0.5, jnp.bfloat16)
    x4b = x4 + jnp.bfloat16(0.01)
    head_j = PhaseHead(1, jnp.bfloat16)
    head_p = PhaseHead(1, jnp.bfloat16, use_pallas=True)
    v = jax.jit(head_j.init)(jax.random.key(0), x4)
    t_j = _stream(jax.jit(lambda t: head_j.apply(v, t)), x4, x4b,
                  args.iters)
    t_p = _stream(jax.jit(lambda t: head_p.apply(v, t)), x4, x4b,
                  args.iters)
    print(json.dumps({
        "kernel": "phase_head",
        "shape": [b, 32, 108, 256],
        "xla_ms": round(t_j * 1e3, 3),
        "pallas_ms": round(t_p * 1e3, 3),
        "speedup": round(t_j / t_p, 3),
    }))


if __name__ == "__main__":
    main()
