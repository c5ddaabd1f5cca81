"""The driver contract itself: __graft_entry__.dryrun_multichip through the
REAL entry path (VERDICT r3 #8).

Rounds 1-3 tested the dryrun's pieces (mesh sharding, sharded chain,
pipelined eval) but not the entry function the driver actually calls, so a
regression in its env plumbing (PYTHONPATH scrub, XLA_FLAGS rewrite, the
axon backend probe) would only surface as a failed MULTICHIP_r{N}.json.
This test invokes it exactly as the driver does — a fresh subprocess that
imports __graft_entry__ — and asserts the success line.

Runs the parent under JAX_PLATFORMS=cpu with 1 visible device so
dryrun_multichip(4) must take the self-provisioning path (re-exec into a
virtual 4-device CPU child), which is the path the driver exercises on the
1-chip axon host.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cpu_child_env_patch(monkeypatch):
    """Point the inherited environment at a clean CPU jax for subprocesses
    (scrub the axon sitecustomize, which overrides JAX_PLATFORMS)."""
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("PYTHONPATH", os.pathsep.join(
        [REPO] + [
            p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
            if p and ".axon_site" not in p
        ]
    ))


def test_probe_backend_device_count_healthy_cpu(monkeypatch):
    """The watchdogged probe reports the child's real device count."""
    from egoego_release_tpu.utils import tunnel

    _cpu_child_env_patch(monkeypatch)
    # conftest forces 8 virtual CPU devices via XLA_FLAGS, inherited by the
    # probe child.
    assert tunnel.probe_backend_device_count(timeout=600) == 8
    # not on axon -> the full check short-circuits healthy
    assert tunnel.check_axon_backend() is None


def test_probe_backend_device_count_hang_times_out(tmp_path, monkeypatch):
    """A child that never returns (the listening-but-sick relay hang mode)
    is killed by the watchdog and reported as 0 devices."""
    import sys as _sys

    from egoego_release_tpu.utils import tunnel

    hang = tmp_path / "hang.sh"
    hang.write_text("#!/bin/sh\nsleep 60\n")
    hang.chmod(0o755)
    monkeypatch.setattr(_sys, "executable", str(hang))
    assert tunnel.probe_backend_device_count(timeout=2) == 0


def test_dryrun_multichip_entrypoint_subprocess():
    env = dict(os.environ)
    # Parent sees a 1-device CPU backend (axon sitecustomize stripped), so
    # the dryrun must self-provision its virtual mesh in a child.
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        [REPO] + [
            p for p in env.get("PYTHONPATH", "").split(os.pathsep)
            if p and ".axon_site" not in p
        ]
    )
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    res = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(4)"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1200,
    )
    assert res.returncode == 0, (
        f"dryrun entry failed rc={res.returncode}\n"
        f"stdout:\n{res.stdout}\nstderr:\n{res.stderr}"
    )
    assert "dryrun_multichip(4): mesh {'dp': 2, 'tp': 2} ok" in res.stdout, (
        res.stdout
    )
    assert "release-dims tp params 40/40" in res.stdout, res.stdout
