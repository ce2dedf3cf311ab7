"""Host-RSS watchdog: lossless self-restart before the OOM killer fires.

The tunneled TPU runtime leaks the host mirror of EVERY host->device
transfer (~one batch per training step; measured 22.9 MB/iter for a pure
``jax.device_put`` + jit + fetch loop — donation, explicit ``.delete()``
and identical content all still leak).  A multi-hour training run
therefore grows host RSS linearly until the kernel OOM-kills it (observed:
114 GB anon RSS at epoch 583 of the round-4 word-GAN run).

Framework mitigation (the trainers already have exact checkpoint/resume):
watch RSS at a safe boundary (epoch / iteration), and when it crosses the
threshold, save a latest checkpoint and ``os.execv`` the ORIGINAL command
line — the relaunched process resumes from the checkpoint with a fresh
address space.  This is the elastic-recovery pattern of SURVEY.md §5.3
applied to a runtime leak we cannot fix from here.
"""

from __future__ import annotations

import os
import sys


def rss_gb() -> float:
    """Current process resident set size in GiB (0.0 if unreadable)."""
    try:
        with open(f"/proc/{os.getpid()}/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / (1024 * 1024)
    except OSError:
        pass
    return 0.0


def maybe_restart(threshold_gb: float, save_fn, *, label: str = "") -> None:
    """If RSS exceeds ``threshold_gb``: run ``save_fn()`` (checkpoint!)
    and replace this process with its original command line.

    ``threshold_gb <= 0`` disables the watchdog.  The relaunch uses
    ``sys.orig_argv`` (the exact interpreter invocation, including ``-m``),
    so CLIs restart into their own resume path.  AFFG_RESTARTS counts
    generations in the child's env for observability.
    """
    if threshold_gb <= 0:
        return
    used = rss_gb()
    if used < threshold_gb:
        return
    gen = int(os.environ.get("AFFG_RESTARTS", "0")) + 1
    print(f"memwatch{f' [{label}]' if label else ''}: host RSS "
          f"{used:.1f} GiB >= {threshold_gb:.1f} GiB — saving checkpoint "
          f"and re-exec'ing to resume (restart #{gen}; known "
          "transfer-mirror leak in the tunneled runtime, see "
          "utils/memwatch.py)", flush=True)
    save_fn()
    os.environ["AFFG_RESTARTS"] = str(gen)
    argv = list(getattr(sys, "orig_argv", ())) or [sys.executable] + sys.argv
    # orig_argv[0] may be a bare "python" (shell PATH-resolved); execv does
    # not search PATH, so always exec the absolute interpreter
    os.execv(sys.executable, [sys.executable] + argv[1:])
