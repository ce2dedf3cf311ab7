"""Persistent XLA compilation cache for CLI entry points.

Remote TPU compiles cost 1-7 minutes per program (and the attached-chip
runtime serializes them); a crash/interrupt + resume of a training run
would otherwise pay the full compile bill twice.  Every CLI calls
``enable_compile_cache()`` before building jit programs so identical
programs (same HLO) are restored from disk instead.

Opt out with ``AFFG_JAX_CACHE=""``; point elsewhere with
``AFFG_JAX_CACHE=/path``.

The cache dir is suffixed with a host-CPU fingerprint: XLA:CPU caches AOT
machine code keyed only by HLO, so an entry persisted on one host model
and loaded after the VM migrates to a different one is silently wrong
("Machine type used for XLA:CPU compilation doesn't match the machine
type for execution" → observed as a *determinism test failure*, not a
crash).  TPU entries are keyed by device target and would be safe to
share, but losing them across a host migration only costs a recompile.
"""

from __future__ import annotations

import functools
import os

_DEFAULT = "~/.cache/affganwriting_jax_tpu"


# Stable per-host-model cpuinfo fields.  Round 3 keyed on model name +
# flags only and a live VM migration still loaded stale XLA:CPU AOT
# entries ("machine type ... doesn't match" warnings, MULTICHIP_r03):
# the migrated host reported the same model string/flag set but differed
# in the microarchitectural fields XLA's codegen keys on.  Key on all of
# them (everything stable except runtime-volatile MHz/bogomips).
_CPUINFO_FIELDS = (
    "vendor_id", "cpu family", "model", "model name", "stepping",
    "microcode", "cache size", "flags", "bugs", "address sizes",
    "cache_alignment", "fpu", "cpuid level", "siblings", "cpu cores",
)


@functools.lru_cache(maxsize=1)
def host_tag() -> str:
    """Short fingerprint of the host CPU (full stable cpuinfo profile)."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            lines = [ln for ln in f
                     if ln.split(":", 1)[0].strip() in _CPUINFO_FIELDS]
        blob = "".join(sorted(set(lines)))
    except OSError:
        import platform

        blob = platform.processor() or platform.machine()
    return hashlib.sha256(blob.encode()).hexdigest()[:10]


def enable_compile_cache(path: str | None = None) -> str | None:
    """Enable jax's persistent compilation cache.  Returns the cache dir
    (None if disabled or unsupported by this jax)."""
    # Pin the XLA:CPU codegen flavor: a TF import (transformers pulls it
    # in) can flip oneDNN custom ops mid-process, and AOT entries written
    # under one flavor load under the other with "machine type doesn't
    # match" errors and silently wrong numerics (observed round 3 as a
    # validation-determinism failure).
    os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")
    cache_dir = path or os.environ.get("AFFG_JAX_CACHE", _DEFAULT)
    if not cache_dir:
        return None
    cache_dir = os.path.join(os.path.expanduser(cache_dir), host_tag())
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        return None
    try:  # cache small entries too (older jax lacks the knob)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    return cache_dir
