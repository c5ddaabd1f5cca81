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
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp



def _check_axon_tunnel():
    """Fail fast when the axon backend is unusable — relay dead (TCP) OR
    listening-but-sick (watchdogged subprocess probe of jax.devices();
    clients hang forever at 0% CPU otherwise — see
    egoego_release_tpu/utils/tunnel.py)."""
    from egoego_release_tpu.utils.tunnel import check_axon_backend

    err = check_axon_backend()
    if err is not None:
        raise SystemExit(err)


def main():
    _check_axon_tunnel()
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
    main()
