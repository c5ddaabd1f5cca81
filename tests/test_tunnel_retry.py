"""Bounded relay-retry window (VERDICT r4 #1): wait_for_healthy_backend
must ride out short relay flaps — probe, sleep, re-probe — and give up
only when the next probe could not start inside the window.

Pure-logic tests with injected probe/sleep/clock; no jax backend touched.
"""

from egoego_release_tpu.utils.tunnel import wait_for_healthy_backend


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t

    def sleep(self, s):
        self.t += s


def make_probe(fail_n, clock, probe_cost=10.0, err="relay sick"):
    """Probe that fails `fail_n` times then succeeds, charging `probe_cost`
    seconds of fake time per call (a real probe blocks on backend init)."""
    calls = {"n": 0}

    def probe():
        calls["n"] += 1
        clock.sleep(probe_cost)
        return err if calls["n"] <= fail_n else None

    return probe, calls


def test_healthy_first_probe_returns_immediately():
    clock = FakeClock()
    probe, calls = make_probe(0, clock)
    sleeps = []
    err = wait_for_healthy_backend(
        300, 75, probe=probe, sleep=sleeps.append, clock=clock
    )
    assert err is None
    assert calls["n"] == 1
    assert sleeps == []  # no retry delay on the happy path


def test_fails_n_times_then_succeeds_within_window():
    clock = FakeClock()
    probe, calls = make_probe(3, clock)
    sleeps = []

    def sleep(s):
        sleeps.append(s)
        clock.sleep(s)

    err = wait_for_healthy_backend(
        400, 75, probe=probe, sleep=sleep, clock=clock
    )
    assert err is None
    assert calls["n"] == 4  # 3 failures + the success
    assert sleeps == [75, 75, 75]


def test_gives_up_when_window_exhausted():
    clock = FakeClock()
    probe, calls = make_probe(100, clock, err="still sick")
    sleeps = []

    def sleep(s):
        sleeps.append(s)
        clock.sleep(s)

    err = wait_for_healthy_backend(
        300, 75, probe=probe, sleep=sleep, clock=clock
    )
    assert err == "still sick"
    # probes at t=0(->10), 85(->95), 170(->180), 255(->265); at 265 the next
    # probe would start at 340 >= 300+0 deadline -> give up.  Exact count:
    # loop checks clock+interval >= deadline after each failure.
    assert calls["n"] >= 3
    assert clock.t <= 300 + 75 + 120  # bounded: window + one interval + probe


def test_zero_window_is_single_probe():
    """window smaller than one interval degrades to exactly one probe —
    the pre-round-5 behavior, still available via BENCH_RETRY_WINDOW=0."""
    clock = FakeClock()
    probe, calls = make_probe(100, clock, err="sick")
    err = wait_for_healthy_backend(
        0, 75, probe=probe, sleep=clock.sleep, clock=clock
    )
    assert err == "sick"
    assert calls["n"] == 1


def test_recovers_exactly_at_last_slot():
    """Success on the last probe that can still start inside the window."""
    clock = FakeClock()
    probe, calls = make_probe(2, clock, probe_cost=5.0)

    err = wait_for_healthy_backend(
        200, 75, probe=probe, sleep=clock.sleep, clock=clock
    )
    # probes at 0(->5), 80(->85), 160(->165): third succeeds inside window
    assert err is None
    assert calls["n"] == 3
