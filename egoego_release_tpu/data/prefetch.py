"""Background-thread batch prefetching (host -> device overlap).

The reference overlaps data loading with compute via torch DataLoader
workers (num_workers flags, e.g. trainer_head_estimation.py:227).  The TPU
analog: a daemon thread drains the (host, numpy) batch iterator into a
bounded queue, optionally `jax.device_put`-ing each batch with the desired
sharding so the host->HBM transfer overlaps the previous step's device
compute — by the time `train_step` dequeues a batch it is already resident.

Pure stdlib threading (numpy loading releases the GIL inside np.load / the
native C++ loader), no multiprocessing: on TPU hosts the loader thread and
the dispatch thread interleave fine, and device transfers are async.
"""

from __future__ import annotations

import queue
import threading

import jax


class PrefetchIterator:
    """Wrap a batch iterator with a bounded background prefetch queue.

    iterator:  yields pytrees of numpy arrays (host batches)
    prefetch:  queue depth (2 is enough to hide loading behind compute)
    sharding:  optional jax Sharding (or pytree of shardings) applied via
               device_put in the loader thread — batches arrive on device
    """

    _DONE = object()

    def __init__(self, iterator, prefetch: int = 2, sharding=None):
        self._it = iterator
        self._sharding = sharding
        self._q: queue.Queue = queue.Queue(maxsize=max(1, prefetch))
        self._err: BaseException | None = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            for batch in self._it:
                if self._sharding is not None:
                    batch = jax.device_put(batch, self._sharding)
                self._q.put(batch)
        except BaseException as e:  # surfaced on the consumer side
            self._err = e
        finally:
            self._q.put(self._DONE)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._DONE:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def prefetch_to_device(iterator, prefetch: int = 2, sharding=None):
    """Convenience wrapper: `for batch in prefetch_to_device(it): ...`."""
    return PrefetchIterator(iterator, prefetch=prefetch, sharding=sharding)
