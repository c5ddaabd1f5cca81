"""Background batch prefetching (DataLoader-workers analog)."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from egoego_release_tpu.data.prefetch import PrefetchIterator, prefetch_to_device


def test_prefetch_preserves_order_and_values():
    batches = [{"x": np.full((2, 3), i, np.float32)} for i in range(7)]
    out = list(PrefetchIterator(iter(batches), prefetch=3))
    assert len(out) == 7
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b["x"]), batches[i]["x"])


def test_prefetch_device_put():
    sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
    batches = [{"x": np.ones((2, 2), np.float32) * i} for i in range(3)]
    out = list(prefetch_to_device(iter(batches), sharding=sharding))
    assert all(isinstance(b["x"], jax.Array) for b in out)
    np.testing.assert_array_equal(np.asarray(out[2]["x"]), batches[2]["x"])


def test_prefetch_overlaps_loading():
    """With a slow producer and a slow consumer, total wall time must be
    close to max(producer, consumer), not their sum."""
    n, delay = 6, 0.05

    def slow_batches():
        for i in range(n):
            time.sleep(delay)
            yield {"x": np.full((1,), i, np.float32)}

    t0 = time.perf_counter()
    for b in PrefetchIterator(slow_batches(), prefetch=2):
        time.sleep(delay)  # consumer work
    overlapped = time.perf_counter() - t0
    # serial would be ~2*n*delay = 0.6s; overlapped ~ n*delay + delay
    assert overlapped < 1.7 * n * delay


def test_prefetch_propagates_errors():
    def bad():
        yield {"x": np.zeros(1)}
        raise ValueError("boom")

    it = PrefetchIterator(bad())
    next(it)
    try:
        next(it)
        raised = False
    except ValueError:
        raised = True
    assert raised
