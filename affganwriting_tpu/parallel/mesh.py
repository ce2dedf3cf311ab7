"""Device mesh + sharding rules.

The reference has no distributed layer at all — its single multi-device
artifact is ``nn.DataParallel`` around VGG tap stages (reference:
GAN_word/modules_tro.py:341-346), dead in the active ResNet50 path.  Here
parallelism is a first-class component: a ``Mesh`` over ICI (and DCN for
multi-slice), batch sharded over the ``data`` axis, and tensor-parallel
sharding of the widest dense layers over the ``model`` axis.  XLA/GSPMD
inserts the collectives (psum for gradient sync, all-gather for TP params),
so the 4-player gradient step compiles to one program whose gradients equal
the reference's single-GPU gradients in expectation (SURVEY.md §5.8).
"""

from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices=None,
    data: int | None = None,
    model: int = 1,
) -> Mesh:
    """Build a 2D ('data', 'model') mesh.

    ``data`` defaults to n_devices // model.  The 'data' axis carries batch
    (DP, gradient psum over ICI); 'model' carries tensor-parallel shards of
    the widest dense layers (the text-encoder FC pyramid and AdaIN-param
    projections).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def parse_mesh_spec(spec: str, devices=None) -> Mesh | None:
    """CLI mesh spec -> Mesh.

    ``'none'``/'' -> None (single-device), ``'auto'`` -> all devices on
    'data', ``'8'`` -> data=8, ``'4x2'`` -> data=4 x model=2.
    """
    if not spec or spec == "none":
        return None
    if devices is None:
        devices = jax.devices()
    if spec == "auto":
        return make_mesh(devices, data=len(devices), model=1)
    if "x" in spec:
        d, m = spec.split("x")
        data, model = int(d), int(m)
    else:
        data, model = int(spec), 1
    return make_mesh(devices[: data * model], data=data, model=model)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place every array in a batch pytree with its leading axis over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


# --- tensor-parallel rules -------------------------------------------------
# Map param path regexes -> PartitionSpec.  Only the big dense layers are
# worth sharding at this model scale; convs are replicated (batch is the
# parallel axis for them).  Kernel layout for flax Dense is (in, out).
_TP_RULES: list[tuple[str, P]] = [
    # TextEncoderFC pyramid: 768->1024->2048->4096 (reference:
    # GAN_word/modules_tro.py:273-281) — shard the output features.
    (r"text_encoder/fc\d/kernel$", P(None, MODEL_AXIS)),
    (r"text_encoder/fc\d/bias$", P(MODEL_AXIS)),
    # mix: Linear(1024->512) applied at every (8,27) site
    (r"linear_mix/kernel$", P(MODEL_AXIS, None)),
]


def _spec_for(path: str) -> P:
    for pat, spec in _TP_RULES:
        if re.search(pat, path):
            return spec
    return P()


def _flatten_path(keypath) -> str:
    parts = []
    for k in keypath:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def param_shardings(mesh: Mesh, params: Any, *,
                    expect_tp: bool = False) -> Any:
    """NamedSharding pytree for a param tree: TP rules + replicate the rest.

    With ``expect_tp`` on a mesh whose model axis is >1, at least one leaf
    must match a TP rule — a regex that silently stops matching param
    paths would otherwise degrade tensor parallelism to replication with
    nothing failing.  Leave it off for trees that legitimately replicate
    (e.g. the recognizer in the serving pipeline)."""
    matched = [0]

    def one(keypath, x):
        spec = _spec_for(_flatten_path(keypath))
        # degenerate shapes (scalars) can't take a multi-axis spec
        if len(spec) > x.ndim:
            spec = P()
        if spec != P():
            matched[0] += 1
        return NamedSharding(mesh, spec)

    out = jax.tree_util.tree_map_with_path(one, params)
    if (expect_tp and dict(mesh.shape).get(MODEL_AXIS, 1) > 1
            and not matched[0]):
        raise ValueError(
            "mesh has a model axis >1 but no param path matched _TP_RULES "
            "— tensor parallelism would silently degrade to replication "
            "(param-path regex drift?)")
    return out


def shard_params(mesh: Mesh, params: Any, *, expect_tp: bool = False) -> Any:
    return jax.tree.map(
        jax.device_put, params,
        param_shardings(mesh, params, expect_tp=expect_tp)
    )


def shard_state(mesh: Mesh, state: Any) -> Any:
    """Place a whole trainer state pytree on the mesh: TP rules apply to
    any leaf whose path matches (params AND the matching optimizer moments
    — ``_spec_for`` searches the path suffix, so ``mu/text_encoder/fc1/
    kernel`` shards like the param it tracks); everything else replicates.

    A whole state always contains the TP-ruled layers when a model axis is
    in use, so rule coverage is asserted here (see ``param_shardings``).
    """
    return shard_params(mesh, state, expect_tp=True)
