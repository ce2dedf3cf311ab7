"""parallel/multihost.py: process-local batch assembly + runtime init.

Single-process on the 8-device CPU mesh, ``global_batch`` must be exactly
``shard_batch`` (same values, same sharding) — that equivalence is what
lets trainers call it unconditionally; multi-process correctness then
rides on jax.make_array_from_process_local_data's own contract.
"""

import jax
import numpy as np

from affganwriting_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    shard_batch,
)
from affganwriting_tpu.parallel.multihost import global_batch, init_distributed


def test_global_batch_matches_shard_batch():
    mesh = make_mesh(jax.devices(), data=8, model=1)
    rng = np.random.default_rng(0)
    batch = {
        "img": rng.normal(size=(16, 8, 12, 1)).astype(np.float32),
        "label": np.arange(16 * 5, dtype=np.int32).reshape(16, 5),
    }
    a = shard_batch(mesh, batch)
    b = global_batch(mesh, batch)
    sh = batch_sharding(mesh)
    for k in batch:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
        assert b[k].sharding.is_equivalent_to(sh, b[k].ndim), k
        # every device holds 1/8 of the leading axis
        assert b[k].addressable_shards[0].data.shape[0] == 2


def test_global_batch_feeds_psum_step():
    """A jit'd mean over the 'data' axis sees the full global batch."""
    mesh = make_mesh(jax.devices(), data=8, model=1)
    x = np.arange(32, dtype=np.float32).reshape(32, 1)
    gb = global_batch(mesh, {"x": x})["x"]
    got = float(jax.jit(lambda v: v.mean())(gb))
    assert abs(got - x.mean()) < 1e-6


def test_init_distributed_noop_single_host(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert init_distributed() is False
