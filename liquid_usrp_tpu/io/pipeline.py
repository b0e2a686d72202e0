"""Stage-pipelined stream processing: host I/O overlapped with device DSP.

The reference decouples hardware I/O from demodulation with an RX worker
pthread + condvar handshake (/root/reference/lib/ofdmtxrx.cc:554-636).  The
TPU equivalent: a producer thread keeps a bounded queue of IQ blocks filled
(from a file via the native double-buffered reader, or any iterator) while
the consumer drives the jitted synchronizer step; JAX's async dispatch
overlaps the device work with the next block's host-side preparation, so
the handshake is simply the queue.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator

import numpy as np

__all__ = ["BlockPrefetcher", "run_pipelined"]


class BlockPrefetcher:
    """Producer thread filling a bounded block queue from an iterator."""

    def __init__(self, source: Iterable[np.ndarray], depth: int = 4):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._src = iter(source)
        self._done = object()
        self._t = threading.Thread(target=self._fill, daemon=True)
        self._t.start()

    def _fill(self):
        try:
            for blk in self._src:
                self._q.put(blk)
        finally:
            self._q.put(self._done)

    def __iter__(self) -> Iterator[np.ndarray]:
        while True:
            item = self._q.get()
            if item is self._done:
                return
            yield item


def run_pipelined(source: Iterable[np.ndarray], step: Callable, state,
                  on_results: Callable | None = None, depth: int = 4,
                  block_size: int | None = None):
    """Drive ``step(state, block) -> (state, results)`` over a prefetched
    stream; returns the final state.

    ``source`` yields IQ blocks (ragged blocks are re-chunked to
    ``block_size`` when given); ``on_results`` receives each step's results
    while the next device step is already in flight (async dispatch).
    """
    import jax.numpy as jnp

    def rechunk(it):
        if block_size is None:
            yield from it
            return
        buf = np.zeros(0, np.complex64)
        for blk in it:
            buf = np.concatenate([buf, np.asarray(blk)])
            while len(buf) >= block_size:
                yield buf[:block_size]
                buf = buf[block_size:]
        if len(buf):
            yield np.concatenate(
                [buf, np.zeros(block_size - len(buf), np.complex64)])

    pending = None
    for blk in rechunk(BlockPrefetcher(source, depth)):
        state, results = step(state, jnp.asarray(blk))
        if pending is not None and on_results is not None:
            on_results(pending)      # consume previous while device runs
        pending = results
    if pending is not None and on_results is not None:
        on_results(pending)
    return state
