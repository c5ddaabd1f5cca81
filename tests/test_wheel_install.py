"""Wheel smoke test (VERDICT r4 #8): build the wheel, install it into a
clean venv, and exercise the INSTALLED copy — a console entry point, the
package import, and the native-loader build-on-first-use path (the
packaging rows claim "ship native sources in wheels"; this proves the
installed artifact, not the source tree, delivers them).

Slow-marked; everything runs in subprocesses against the venv's
interpreter with this repo stripped from sys.path, on CPU (the venv uses
--system-site-packages for the baked-in jax/flax deps — the wheel install
itself is --no-deps --no-index, so nothing touches the network).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd, env=None, cwd=None, timeout=600):
    res = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         cwd=cwd, timeout=timeout)
    assert res.returncode == 0, (
        f"{cmd}\nstdout:\n{res.stdout}\nstderr:\n{res.stderr}"
    )
    return res


@pytest.fixture(scope="module")
def wheel_venv(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("wheel")
    wheel_dir = tmp / "dist"
    _run([sys.executable, "-m", "pip", "wheel", "--no-deps", "--no-index",
          "--no-build-isolation", "-w", str(wheel_dir), REPO])
    wheels = list(wheel_dir.glob("egoego_release_tpu-*.whl"))
    assert len(wheels) == 1, f"expected one wheel, got {wheels}"

    # Isolated install via --target (NOT a venv: the base interpreter is
    # itself a venv, so `python -m venv --system-site-packages` would link
    # to the SYSTEM python's empty site-packages and lose jax/numpy — they
    # are baked into /opt/venv and not installable offline).  PYTHONPATH
    # carries ONLY the target dir, which simultaneously strips this repo
    # and the axon sitecustomize, so subprocesses run the INSTALLED copy
    # with CPU jax from the interpreter's own site-packages.
    target = tmp / "install"
    _run([sys.executable, "-m", "pip", "install", "--no-deps", "--no-index",
          "--target", str(target), str(wheels[0])])
    env = {k: v for k, v in os.environ.items()}
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(target)
    env["PYTHONNOUSERSITE"] = "1"
    return {"python": sys.executable, "bin": str(target / "bin"),
            "env": env, "site": str(target)}


def test_installed_package_resolves_from_venv(wheel_venv):
    res = _run(
        [wheel_venv["python"], "-c",
         "import egoego_release_tpu as m; print(m.__file__)"],
        env=wheel_venv["env"], cwd="/tmp",
    )
    path = res.stdout.strip()
    assert wheel_venv["site"] in path, (
        f"package resolved from {path}, not the venv"
    )


def test_console_entry_point_runs_real_eval(wheel_venv):
    """One packaged console script end to end from the installed copy:
    egoego-eval-stage2 --batch_seqs on a tiny synthetic fixture (window 16,
    timesteps 8, CPU)."""
    import joblib

    rng = np.random.RandomState(0)
    tmp = os.path.dirname(wheel_venv["site"])
    data = {
        i: {
            "seq_name": f"Transitions_mocap-w{i}",
            "trans": np.cumsum(rng.randn(20, 3).astype(np.float32) * 0.02, 0),
            "root_orient": (rng.randn(20, 3) * 0.2).astype(np.float32),
            "body_pose": (rng.randn(20, 63) * 0.2).astype(np.float32),
        }
        for i in range(3)
    }
    data_path = os.path.join(tmp, "amass_tiny.p")
    joblib.dump(data, data_path)
    rest_path = os.path.join(tmp, "rest.npy")
    np.save(rest_path, np.concatenate(
        [np.zeros((1, 3)), rng.uniform(-0.2, 0.2, (21, 3))]
    ).astype(np.float32))
    stats = ("/root/reference/test_data/ares/"
             "cano_min_max_mean_std_data_window_120.p")
    if not os.path.exists(stats):
        pytest.skip("bundled stats fixture unavailable")

    out_dir = os.path.join(tmp, "out")
    res = _run(
        [os.path.join(wheel_venv["bin"], "egoego-eval-stage2"),
         "--test_data_path", data_path, "--stats_path", stats,
         "--rest_offsets", rest_path, "--window", "16", "--timesteps", "8",
         "--batch_seqs", "3", "--out_dir", out_dir],
        env=wheel_venv["env"], cwd="/tmp",
    )
    assert "saved:" in res.stdout
    import json

    summary = json.load(open(os.path.join(
        out_dir, "stage2_diffusion_model_res_on_amass_test.json")))
    assert summary["num_seqs"] == 3
    assert np.isfinite(summary["mean"]["mpjpe"])


def test_native_loader_builds_from_installed_source(wheel_venv):
    """The wheel ships npy_loader.cpp (not the .so); the installed copy
    must g++-build it on first use next to the INSTALLED source and load
    batches correctly."""
    probe = r"""
import os, sys
import numpy as np
import egoego_release_tpu
from egoego_release_tpu.data import native_loader as nl

assert nl._SRC.endswith(".cpp") and os.path.exists(nl._SRC), nl._SRC
# the wheel must not ship a prebuilt .so; remove any stale build artifact
if os.path.exists(nl._SO):
    os.remove(nl._SO)
paths = []
rng = np.random.RandomState(0)
for i in range(4):
    p = os.path.join(os.environ["PROBE_TMP"], f"f{i}.npy")
    np.save(p, rng.randn(6).astype(np.float32))
    paths.append(p)
out = nl.load_npy_batch(paths, 6)
ref = np.stack([np.load(p) for p in paths])
assert np.allclose(out, ref), (out, ref)
# first use really built the .so next to the installed source
print("BUILT" if os.path.exists(nl._SO) else "FALLBACK")
"""
    env = dict(wheel_venv["env"])
    env["PROBE_TMP"] = os.path.dirname(wheel_venv["site"])
    res = _run([wheel_venv["python"], "-c", probe], env=env, cwd="/tmp")
    assert res.stdout.strip().splitlines()[-1] in ("BUILT", "FALLBACK")
    # with g++ baked into this image, the build path must actually be taken
    assert res.stdout.strip().splitlines()[-1] == "BUILT"
