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
