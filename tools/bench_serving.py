"""Deserialize an egoego-export serving artifact and execute it, timed.

Closes the loop the live benches leave open (VERDICT r4 weak #6): the
packaged serving surface — `egoego-export` writing raw
`jax.export.Exported.serialize()` bytes, a serving host calling
`load_artifact(path).call(...)` with no model code — must run on the real
chip, not just round-trip on CPU (tests/test_serving_export.py).

Usage (after `egoego-export chain --batch_size 64 --n_frames 140 ...`):

  SERVE_ARTIFACT=/tmp/chain.stablehlo python tools/bench_serving.py

Prints one JSON line with steady-state sequences/sec through the
deserialized program.  The artifact's input signature is inferred from
`Exported.in_avals` (chain and e2e artifacts are supported).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_CHILD_ENV_MARK = "_EGOEGO_BENCH_SERVE_CHILD"


def _watchdogged_main():
    """bench.py pattern: fast TCP relay check, then everything in a child
    under a hard timeout (the axon listening-but-sick hang mode)."""
    import subprocess

    from egoego_release_tpu.utils.tunnel import check_axon_tunnel

    err = check_axon_tunnel()
    if err is not None:
        raise SystemExit(err)
    timeout_s = float(os.environ.get("SERVE_TIMEOUT", "900"))
    env = dict(os.environ)
    env[_CHILD_ENV_MARK] = "1"
    try:
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        raise SystemExit(
            f"bench subprocess exceeded the {timeout_s:.0f}s watchdog "
            "(axon relay listening-but-sick hang mode)"
        )
    sys.stderr.write(res.stderr)
    sys.stdout.write(res.stdout)
    if res.returncode != 0:
        raise SystemExit(res.returncode)


def _synth_input(aval, rng):
    """Synthesize a plausible operand for one input aval of the artifact."""
    import jax.numpy as jnp

    shape, dtype = tuple(aval.shape), aval.dtype
    if dtype == jnp.uint32:          # raw threefry key data
        return np.asarray([0, 7], np.uint32)
    if shape[-1:] == (4,) and len(shape) >= 2:  # quaternions (B,[T,]4)
        q = rng.randn(*shape).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        return q
    if len(shape) >= 3 and shape[-1] == 3 and shape[-2] == 3:  # rot matrices
        out = np.zeros(shape, np.float32)
        out[...] = np.eye(3, dtype=np.float32)
        return out
    if shape[-1:] == (3,) and len(shape) == 3:  # trajectories (B,T,3)
        return np.cumsum(rng.randn(*shape).astype(np.float32) * 0.01, axis=1)
    return rng.randn(*shape).astype(np.float32) * 0.1


def main():
    import jax

    from egoego_release_tpu.serving import load_artifact

    path = os.environ.get("SERVE_ARTIFACT", "/tmp/chain.stablehlo")
    n_runs = int(os.environ.get("SERVE_RUNS", "3"))

    t0 = time.perf_counter()
    exported = load_artifact(path)
    t_load = time.perf_counter() - t0

    rng = np.random.RandomState(0)
    args = [_synth_input(a, rng) for a in exported.in_avals]
    batch = next(
        (int(a.shape[0]) for a in exported.in_avals if len(a.shape) >= 2), 1
    )

    # Timing on the axon tunnel (BASELINE.md round-2 warning): an unchained
    # dispatch loop reports impossible numbers (a first cut here read 354k
    # seqs/sec), and block_until_ready does not reliably wait either (a
    # 5.2 s "warmup" pushed ~2 min of backlog into the timed loop).  The
    # only trustworthy sync is a blocking np.asarray fetch, so every call —
    # warmup included — is timed call -> fetch-one-output, and the steady
    # rate is the MEDIAN per-call time.
    call = jax.jit(exported.call)

    def timed_call(a):
        t0 = time.perf_counter()
        o = call(*a)
        np.asarray(jax.tree.leaves(o)[0])
        return o, time.perf_counter() - t0

    out, t_compile = timed_call(args)

    per_call = []
    for _ in range(n_runs):
        out, dt_i = timed_call(args)
        per_call.append(dt_i)
    dt = float(np.median(per_call)) * n_runs

    leaves = jax.tree.leaves(out)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves), (
        "artifact produced non-finite output"
    )
    print(json.dumps({
        "metric": "deserialized serving artifact sequences/sec/chip",
        "value": round(batch * n_runs / dt, 4),
        "unit": "seqs/sec",
        "artifact": os.path.basename(path),
        "artifact_bytes": os.path.getsize(path),
        "batch": batch,
        "platform": jax.devices()[0].platform,
        "load_sec": round(t_load, 3),
        "first_call_sec": round(t_compile, 3),
        "per_call_sec": [round(t, 3) for t in per_call],
        "outputs": [list(np.asarray(x).shape) for x in leaves],
    }))


if __name__ == "__main__":
    if os.environ.get(_CHILD_ENV_MARK) == "1":
        main()
    else:
        _watchdogged_main()
