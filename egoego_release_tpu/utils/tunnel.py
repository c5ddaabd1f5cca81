"""Axon TPU-tunnel health checks shared by the bench/driver entry points.

jax clients HANG forever at 0% CPU (instead of erroring) when the relay
daemon behind JAX_PLATFORMS=axon is dead OR sick (observed rounds 3-4; see
CLAUDE.md "Environment gotchas"), so anything unattended must bound its
first backend touch.  Two failure modes require two probes:

1. relay process gone -> TCP connect fails -> ``check_axon_tunnel``
   catches it in <5 s.
2. relay LISTENING BUT SICK -> TCP connects fine, but any backend touch
   (``jax.devices()``) hangs forever.  Only an actual backend touch can
   detect this, and it must happen in a SUBPROCESS with a hard timeout so
   the caller survives the hang (``probe_backend_device_count``).
   This was the root cause of MULTICHIP_r03.json rc=124 (VERDICT r3 #1).
"""

from __future__ import annotations

import os
import subprocess
import sys

RELAY_ADDR = ("127.0.0.1", 8082)

#: Hard cap on the subprocess backend probe.  A healthy axon backend
#: enumerates devices in a few seconds (compilation, not enumeration, is
#: the slow part); 120 s is far beyond any healthy first touch.
#: EGOEGO_PROBE_TIMEOUT overrides (tests use a short one).
PROBE_TIMEOUT_S = float(os.environ.get("EGOEGO_PROBE_TIMEOUT", "120"))


def check_axon_tunnel() -> str | None:
    """Return an error string if JAX_PLATFORMS=axon but the relay's TCP
    port is unreachable; None when connectable or when not using axon.

    NOTE: a passing TCP probe does NOT mean the backend works — a
    listening-but-sick relay passes this and then hangs every client.
    Use :func:`probe_backend_device_count` before any unattended backend
    touch.
    """
    if os.environ.get("JAX_PLATFORMS", "") != "axon":
        return None
    import socket

    try:
        with socket.create_connection(RELAY_ADDR, timeout=5):
            return None
    except OSError as e:
        return (f"axon tunnel relay unreachable on "
                f"{RELAY_ADDR[0]}:{RELAY_ADDR[1]} ({e}); TPU unavailable "
                "on this host")


def probe_backend_device_count(timeout: float = PROBE_TIMEOUT_S) -> int:
    """Device count of this environment's jax backend, probed in a
    subprocess with a hard timeout; 0 on ANY failure.

    The child inherits the full environment (including the axon
    sitecustomize on PYTHONPATH) so it initializes exactly the backend the
    caller would.  A listening-but-sick relay makes the child hang at 0%
    CPU; the timeout kills it and we report 0 devices instead of hanging
    the caller forever.  The child exits cleanly on success, releasing the
    chip before the caller touches it (the CLAUDE.md 30 s-after-kill rule
    applies to killed clients, not clean exits).
    """
    # The probe must run a REAL computation, not just enumerate devices:
    # round-4 observation (sick relay live) — jax.devices() can RETURN in
    # this mode while the first actual dispatch hangs forever, so an
    # enumeration-only probe passes and the caller then hangs anyway.
    # The dispatch result gates the PRINT (not an assert: the child inherits
    # the caller's env, and PYTHONOPTIMIZE would strip an assert, silently
    # degrading the probe back to enumeration-only).
    probe_src = (
        "import jax, jax.numpy as jnp; "
        "n = len(jax.devices()); "
        "print(n if int(jnp.arange(4).sum()) == 6 else 0)"
    )
    try:
        res = subprocess.run(
            [sys.executable, "-c", probe_src],
            capture_output=True, text=True, timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        return 0
    if res.returncode != 0:
        return 0
    try:
        return int(res.stdout.strip().splitlines()[-1])
    except (ValueError, IndexError):
        return 0


def wait_for_healthy_backend(
    window_s: float,
    interval_s: float = 75.0,
    probe_timeout: float = PROBE_TIMEOUT_S,
    *,
    probe=None,
    sleep=None,
    clock=None,
) -> str | None:
    """Bounded retry: re-probe the axon backend until healthy or until
    ``window_s`` elapses.  Returns None on health, else the last error.

    Rationale (VERDICT r4 #1): rounds 3 and 4 both recorded value:null
    driver benchmarks because the relay happened to be sick AT DRIVER TIME
    while every number reproduced hours later on the same chip.  The relay
    flaps on the order of minutes, and the driver's budget (~600 s) has room
    for a probe loop ahead of the ~25-60 s warm-cache benchmark — so ride
    out short flaps instead of giving up after one probe cycle.

    The loop alternates a full health check (fast TCP probe + watchdogged
    real-dispatch subprocess — ``check_axon_backend``) with ``interval_s``
    sleeps, and gives up once the next probe could not START inside the
    window.  A healthy first probe returns immediately (no sleep), so the
    happy path costs one probe (~10-20 s backend init).

    ``probe``/``sleep``/``clock`` are injectable for unit tests (a mock
    probe that fails N times then succeeds — tests/test_tunnel_retry.py).
    """
    import time as _time

    probe = probe or (lambda: check_axon_backend(probe_timeout))
    sleep = sleep or _time.sleep
    clock = clock or _time.monotonic

    deadline = clock() + window_s
    err = probe()
    while err is not None:
        if clock() + interval_s >= deadline:
            return err
        sleep(interval_s)
        err = probe()
    return None


def check_axon_backend(timeout: float = PROBE_TIMEOUT_S) -> str | None:
    """Full health check: fast TCP probe, then a watchdogged backend touch.

    Returns an error string when JAX_PLATFORMS=axon and the backend is
    unusable (relay dead OR listening-but-sick); None when healthy or when
    not using axon.
    """
    err = check_axon_tunnel()
    if err is not None:
        return err
    if os.environ.get("JAX_PLATFORMS", "") != "axon":
        return None
    if probe_backend_device_count(timeout) < 1:
        return (
            "axon tunnel relay is listening but the backend is unresponsive "
            f"(a probe subprocess's first dispatch did not return within "
            f"{timeout:.0f}s — the documented listening-but-sick hang mode); "
            "TPU unavailable on this host"
        )
    return None
