"""Axon TPU-tunnel health check shared by the bench entry points.

jax clients HANG forever at 0% CPU when the relay daemon behind
JAX_PLATFORMS=axon is dead (observed round 3; see CLAUDE.md), so anything
unattended must probe the relay's TCP port before touching jax.
"""

from __future__ import annotations

import os

RELAY_ADDR = ("127.0.0.1", 8082)


def check_axon_tunnel() -> str | None:
    """Return an error string if JAX_PLATFORMS=axon but the relay is
    unreachable; None when healthy or when not using axon."""
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
