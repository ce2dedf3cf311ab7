"""Background-thread batch prefetch: the dataloader-parallelism runtime.

The reference overlaps host batch assembly with GPU compute via torch
DataLoader worker processes (``num_workers=2/4`` —
GAN_word/main_runold.py:70-71, line_generation configs).  The TPU-native
equivalent is simpler: jit dispatch is already asynchronous, so the only
serialized host work is *building* the numpy batch (augmentation, the
synthetic renderer, fg-mask caching).  A single background thread pulling
the batch iterator ahead of the train loop hides that prep behind device
compute; a bounded queue (``depth``) caps host memory at
``depth + 1`` in-flight batches.

Threads, not processes: batch prep is numpy-heavy (releases the GIL in
the hot loops) and the C++ batch kernels (native/preprocess.cpp) release
it explicitly, so a thread suffices and arrays cross to the consumer
zero-copy.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterable, Iterator

_DONE = object()


class _Failure:
    def __init__(self, exc: BaseException):
        self.exc = exc


def prefetch(batches: Iterable[Any], depth: int = 2) -> Iterator[Any]:
    """Iterate ``batches`` on a background thread, ``depth`` ahead.

    Yields exactly the source items in order.  An exception raised by the
    source is re-raised at the consumer's next pull (not swallowed in the
    thread).  If the consumer abandons iteration early (break / GC), the
    producer thread unblocks and exits: the generator's ``close()`` drains
    the queue and joins the thread.
    """
    if depth < 1:
        yield from batches
        return

    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def producer():
        try:
            for item in batches:
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
            q.put(_DONE)
        except BaseException as exc:  # noqa: BLE001 — re-raised consumer-side
            q.put(_Failure(exc))

    t = threading.Thread(target=producer, name="batch-prefetch", daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _DONE:
                return
            if isinstance(item, _Failure):
                raise item.exc
            yield item
    finally:
        stop.set()
        # drain so a blocked producer can observe ``stop`` and exit
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
        t.join(timeout=5.0)
