"""data/prefetch.py: the background-thread dataloader runtime.

The reference's equivalent is torch DataLoader ``num_workers``
(GAN_word/main_runold.py:70-71); these gates pin order preservation,
exception propagation, bounded memory, and clean early-exit shutdown.
"""

import threading
import time

import numpy as np
import pytest

from affganwriting_tpu.data.prefetch import prefetch


def test_order_and_identity():
    src = [{"i": np.full((4,), i)} for i in range(20)]
    out = list(prefetch(iter(src), depth=3))
    assert len(out) == 20
    for i, b in enumerate(out):
        assert b is src[i]   # zero-copy: the same object crosses threads


def test_exception_propagates():
    def gen():
        yield 1
        yield 2
        raise ValueError("boom")

    it = prefetch(gen(), depth=2)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(ValueError, match="boom"):
        next(it)


def test_bounded_lookahead():
    """A slow consumer never has more than depth+1 source items pulled."""
    pulled = []
    done = threading.Event()

    def gen():
        for i in range(100):
            pulled.append(i)
            yield i
        done.set()

    it = prefetch(gen(), depth=2)
    first = next(it)
    assert first == 0
    time.sleep(0.3)   # give the producer every chance to overrun
    assert not done.is_set()
    # queue(2) + the one blocked in put + the one yielded
    assert len(pulled) <= 5, pulled


def test_early_break_stops_producer():
    alive = threading.Event()
    alive.set()

    def gen():
        i = 0
        while alive.is_set():
            yield i
            i += 1
            time.sleep(0.01)

    it = prefetch(gen(), depth=2)
    for i, x in enumerate(it):
        if i >= 3:
            break
    it.close()   # generator close -> stop event -> producer joins
    n = sum(1 for t in threading.enumerate()
            if t.name == "batch-prefetch" and t.is_alive())
    assert n == 0
    alive.clear()


def test_depth_zero_is_passthrough():
    assert list(prefetch(iter([1, 2, 3]), depth=0)) == [1, 2, 3]
