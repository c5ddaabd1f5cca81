"""End-to-end chained-window sampling benchmark (BASELINE.md protocol).

Measures the reference's whole stage-2 inference unit: the canonical
sliding-window chain (per-window canonicalization, overlap inpainting,
head-continuity stitching) over 140-frame sequences — two chained windows of
DDPM-1000 at the full release model dims.  Prints one JSON line.

  python tools/bench_e2e.py            # bs=16, 3 timed runs
  E2E_BATCH=1 E2E_RUNS=5 python tools/bench_e2e.py
  E2E_DDIM=50 python tools/bench_e2e.py   # chained DDIM mode
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

_CHILD_ENV_MARK = "_EGOEGO_BENCH_E2E_CHILD"


def _watchdogged_main():
    """bench.py pattern: fast TCP relay check, then the WHOLE bench in a
    child under a hard timeout.  One backend init total — a pre-flight
    check_axon_backend() probe would pay a second full ~20-60 s axon init
    before every healthy run — while the watchdog still catches the
    listening-but-sick relay mode (child hangs at 0% CPU; parent kills it
    and fails fast instead of hanging forever)."""
    from egoego_release_tpu.utils.tunnel import check_axon_tunnel

    err = check_axon_tunnel()
    if err is not None:
        raise SystemExit(err)
    timeout_s = float(os.environ.get("E2E_TIMEOUT", "900"))
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


def main():
    jax.config.update("jax_default_prng_impl", "rbg")  # see bench.py

    from egoego_release_tpu.diffusion import CondGaussianDiffusion, DiffusionConfig
    from egoego_release_tpu.diffusion.gaussian_diffusion import NormStats

    bs = int(os.environ.get("E2E_BATCH", "16"))
    n_runs = int(os.environ.get("E2E_RUNS", "3"))
    ddim = int(os.environ.get("E2E_DDIM", "0"))
    T = int(os.environ.get("E2E_FRAMES", "140"))

    import dataclasses

    cfg = DiffusionConfig(
        # round-3 large-batch modes (BASELINE.md): E2E_FUSED=1 routes the
        # denoiser through the fused Pallas layer, E2E_MB=N chunks the
        # window batch
        fused_transformer=os.environ.get("E2E_FUSED", "0") == "1",
        # E2E_STEP=1: the fused denoise-STEP path (ops/fused_step.py)
        fused_step=os.environ.get("E2E_STEP", "0") == "1",
        # E2E_ACT_BF16=1: bf16 inter-layer activations inside fused_step
        fused_step_act_bf16=os.environ.get("E2E_ACT_BF16", "0") == "1",
        sample_microbatch=int(os.environ.get("E2E_MB", "0")),
    )
    if ddim:
        cfg = dataclasses.replace(cfg, sampler="ddim", ddim_steps=ddim)
    diff = CondGaussianDiffusion(cfg)
    params = diff.init_params(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    rest = jnp.asarray(rng.randn(22, 3).astype(np.float32) * 0.1)
    jpos = jnp.asarray(np.cumsum(rng.randn(bs, T, 3), 1).astype(np.float32) * 0.01)
    q = rng.randn(bs, T, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    jquat = jnp.asarray(q)
    stats = NormStats(
        jnp.asarray(-np.ones((22, 3)), jnp.float32),
        jnp.asarray(np.ones((22, 3)), jnp.float32),
    )

    def run(key):
        aa, _root = diff.sample_sliding_window_w_canonical_jit(
            params, key, jpos, jquat, stats, rest)
        return aa

    out = run(jax.random.PRNGKey(1))
    out.block_until_ready()

    t0 = time.perf_counter()
    for i in range(n_runs):
        out = run(jax.random.PRNGKey(2 + i))
    out.block_until_ready()
    dt = time.perf_counter() - t0

    stride = cfg.window - cfg.overlap_frames
    n_windows = max(1, -(-(T - cfg.overlap_frames) // stride))
    seqs = bs * n_runs / dt
    mode = (f"DDIM-{cfg.ddim_steps}" if cfg.sampler == "ddim"
            else f"DDPM-{cfg.timesteps}")
    print(json.dumps({
        "metric": f"chained {T}-frame sequences/sec/chip "
                  f"(canonical sliding windows, {mode})",
        "value": round(seqs, 2),
        "unit": "seqs/sec",
        "windows_per_sec": round(seqs * n_windows, 2),
        "batch": bs,
    }))


if __name__ == "__main__":
    if os.environ.get(_CHILD_ENV_MARK) == "1":
        main()
    else:
        _watchdogged_main()
