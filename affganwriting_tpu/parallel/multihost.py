"""Multi-host (DCN) data parallelism for pod slices.

The reference is strictly single-process (no DDP/NCCL/MPI anywhere —
SURVEY.md §2.3); this layer is the framework's own scale-out contract:
pure DP across hosts is sufficient at this model scale (<100M params), so
the only multi-host machinery needed is (a) runtime init and (b) turning
each process's local batch shard into one global jax.Array on the mesh.
Gradient psum stays inside the jit'd step — GSPMD routes the collective
over ICI within a slice and DCN across slices with no step change.

Single-process remains the default and the fully-tested path: every
function here degrades to the local equivalent when
``jax.process_count() == 1`` (the CPU-mesh tests pin that equivalence).
"""

from __future__ import annotations

import os
from typing import Any

import jax

from affganwriting_tpu.parallel.mesh import batch_sharding


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize the multi-process JAX runtime; no-op when single-host.

    Call once, before any other JAX API touches the backend.  With no
    arguments the TPU pod metadata (or ``JAX_COORDINATOR_ADDRESS``/
    ``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``) supplies the topology —
    ``jax.distributed.initialize`` auto-detects on Cloud TPU.  Returns
    True when a multi-process runtime was started.
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None and num_processes is None:
        # no explicit topology: on TPU pods jax auto-detects; elsewhere
        # stay single-process rather than hang waiting for a coordinator
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


def global_batch(mesh, host_batch: Any) -> Any:
    """Process-local numpy batch shards -> one global batch on the mesh.

    Each process passes only ITS slice of the global batch (global batch
    size = local batch size x process_count); the result is a pytree of
    jax.Arrays sharded over the mesh's 'data' axis, addressable shards
    fed from local memory with no cross-host gather
    (``jax.make_array_from_process_local_data``).  Single-process this is
    exactly ``shard_batch`` (the equivalence is test-pinned), so trainers
    can call it unconditionally.
    """
    sh = batch_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, x), host_batch)
