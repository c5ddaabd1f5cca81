"""Benchmark: DDPM sampling throughput on the flagship stage-2 model.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload = the reference's structural cost driver (SURVEY §6): the full
1000-step reverse-diffusion chain over 120-frame windows with the released
stage-2 architecture (d_model 512, 4 layers, 4 heads, d_k=d_v=256), i.e.
1000 sequential denoiser forwards per window batch.  Here the chain is one
lax.scan jitted on device; throughput is measured as completed
window-samples per second per chip.

Baseline: the same workload measured with an equivalent PyTorch
implementation (tools/measure_torch_baseline.py) on this host's CPU —
recorded in BASELINE_MEASURED.json (the reference repo publishes no numbers
and its GPU environment is unavailable; see BASELINE.md).
"""

import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp

_METRIC = "DDPM window-samples/sec/chip (T=120, 1000 steps, stage-2 model)"
_CHILD_ENV_MARK = "_EGOEGO_BENCH_CHILD"


def _error_json(err: str) -> None:
    print(json.dumps({
        "metric": _METRIC,
        "value": None,
        "unit": "samples/sec",
        "error": err,
    }))


def _watchdogged_main() -> None:
    """Run the real benchmark in a child process under a hard timeout.

    The axon relay has TWO failure modes (utils/tunnel.py): dead (TCP
    connect fails — caught in <5 s) and LISTENING-BUT-SICK (TCP connects,
    but the first jax backend touch hangs forever at 0% CPU; the
    MULTICHIP_r03 rc=124 root cause, VERDICT r3 #1).  Only an actual
    backend touch detects the second, so the whole benchmark runs in a
    subprocess the parent can kill: the driver always gets ONE JSON line —
    a number or an error — never a timeout.

    Round-5 (VERDICT r4 #1): the relay flaps on the order of minutes while
    the driver's budget is ~600 s, so instead of giving up after one probe
    cycle the parent RE-PROBES inside a bounded window
    (BENCH_RETRY_WINDOW, default 300 s; probes every BENCH_RETRY_INTERVAL
    = 75 s) before emitting the error JSON.  The probe runs a REAL dispatch
    in a killable subprocess (wait_for_healthy_backend), so listening-but-
    sick is detected too.  A healthy first probe costs one backend init
    (~10-20 s); the benchmark itself hits the persistent compilation cache
    (see main()) so a warm healthy run stays well inside the watchdog.
    """
    from egoego_release_tpu.utils.tunnel import wait_for_healthy_backend

    window_s = float(os.environ.get("BENCH_RETRY_WINDOW", "300"))
    interval_s = float(os.environ.get("BENCH_RETRY_INTERVAL", "75"))
    err = wait_for_healthy_backend(window_s, interval_s)
    if err is not None:
        _error_json(err)
        raise SystemExit(2)

    # Generous for a healthy run (warm compile cache: ~30-60 s; COLD
    # relay-side compile measured ~420 s in round 5) yet inside the
    # driver's own budget (~600 s).
    timeout_s = float(os.environ.get("BENCH_TIMEOUT", "480"))
    env = dict(os.environ)
    env[_CHILD_ENV_MARK] = "1"
    try:
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        _error_json(
            "benchmark subprocess exceeded the "
            f"{timeout_s:.0f}s watchdog (axon relay listening-but-sick "
            "hang mode — jax backend touch never returned); TPU "
            "unavailable on this host"
        )
        raise SystemExit(2)
    sys.stderr.write(res.stderr)
    if res.returncode != 0:
        tail = res.stderr.strip().splitlines()[-1] if res.stderr.strip() else ""
        _error_json(
            f"benchmark subprocess failed with rc={res.returncode}"
            + (f": {tail}" if tail else "")
        )
        raise SystemExit(2)
    sys.stdout.write(res.stdout)


def main():
    # rbg PRNG for the per-step sampling noise: measured +2% end-to-end over
    # threefry on v5e (BASELINE.md round-2 sweep).  DDPM sampling has no
    # noise-stream parity requirement (the reference draws from torch's RNG),
    # so the faster generator is safe; golden-chain parity tests inject
    # explicit noise and are unaffected.
    jax.config.update("jax_default_prng_impl", "rbg")
    # Persistent compilation cache: a COLD relay-side compile of this
    # workload measured ~420 s (round 5) vs ~25 s warm — without the cache
    # a single cold compile eats the whole driver budget.  Any interactive
    # bench run warms it for the driver's end-of-round run on this host.
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/egoego_jax_bench_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import dataclasses

    from egoego_release_tpu.diffusion import CondGaussianDiffusion, DiffusionConfig
    from egoego_release_tpu.diffusion.gaussian_diffusion import head_condition_mask

    # Round-3 tune (BASELINE.md "large-batch cliff"): the fused Pallas
    # decoder-layer kernel WINS at bs>=128 (21.5 vs 33.1 us/sample at 256 —
    # XLA's composed-graph fusion degrades at large batch while the kernel's
    # grid scales), and lax.map microbatching holds each chunk at its
    # optimum.  bs=256 fused + mb=64 measured 53.5-54.0 samples/sec vs 45.4-46.2
    # for round-2's XLA bs=48.  Numerics: bf16-rounding-level drift vs the
    # flax path (end-of-chain max ~0.019 on outputs with std 0.69); parity
    # mode (and all golden tests) stay on the flax path.
    # Round-3 update: the fused denoise-STEP path (ops/fused_step.py — the
    # whole reverse step as n_dec_layers pallas_calls, frames padded to the
    # sublane tile) matches the fused-layer+microbatch number at bs=256
    # WITHOUT needing microbatch chunking (53.8 vs 53.4-54.0) and wins the
    # canonical chain outright (39.8 vs 32.9 seqs/sec, tools/bench_e2e.py) —
    # so it is now the single default for both.  BENCH_STEP=0 BENCH_FUSED=1
    # restores the round-3 fused-layer path; both 0 = plain XLA.
    bs = int(os.environ.get("BENCH_BATCH", "256"))
    step = os.environ.get("BENCH_STEP", "1") == "1"
    fused = os.environ.get("BENCH_FUSED", "0") == "1"
    mb = int(os.environ.get("BENCH_MICROBATCH", "64" if fused and not step else "0"))
    cfg = dataclasses.replace(
        DiffusionConfig(),  # full released config
        fused_step=step, fused_transformer=fused, sample_microbatch=mb,
    )
    diff = CondGaussianDiffusion(cfg)
    params = diff.init_params(jax.random.PRNGKey(0))
    x_start = jnp.zeros((bs, cfg.window, cfg.d_feats), jnp.float32)
    cond_mask = head_condition_mask(bs, cfg.window)

    run = jax.jit(lambda p, k: diff.p_sample_loop(p, k, x_start, cond_mask))

    # warmup/compile
    out = run(params, jax.random.PRNGKey(1))
    out.block_until_ready()

    n_runs = int(os.environ.get("BENCH_RUNS", "3"))
    t0 = time.perf_counter()
    for i in range(n_runs):
        out = run(params, jax.random.PRNGKey(2 + i))
    out.block_until_ready()
    dt = time.perf_counter() - t0

    samples_per_sec = bs * n_runs / dt

    baseline_path = os.path.join(os.path.dirname(__file__), "BASELINE_MEASURED.json")
    vs_baseline = None
    vs_baseline_kind = None
    vs_measured_torch_cpu = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        # the reference publishes no numbers and its GPU env is unavailable
        # (BASELINE.md): the headline ratio divides by an ANALYTIC V100-class
        # estimate, labeled as such so it cannot be misread as a measured GPU;
        # the measured comparison available in-environment is equivalent-torch
        # on this host's (1-core) CPU, reported under its own key.
        est = base.get("estimated_reference_gpu_samples_per_sec")
        cpu = base.get("torch_reference_samples_per_sec")
        if est:
            vs_baseline = samples_per_sec / est
            vs_baseline_kind = "analytic-gpu-estimate"
        elif cpu:
            vs_baseline = samples_per_sec / cpu
            vs_baseline_kind = "measured-torch-cpu-1core"
        if cpu:
            vs_measured_torch_cpu = samples_per_sec / cpu

    print(
        json.dumps(
            {
                "metric": "DDPM window-samples/sec/chip (T=120, 1000 steps, stage-2 model)",
                "value": round(samples_per_sec, 4),
                "unit": "samples/sec",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
                "vs_baseline_kind": vs_baseline_kind,
                "vs_measured_torch_cpu_1core": (
                    round(vs_measured_torch_cpu, 1) if vs_measured_torch_cpu else None
                ),
            }
        )
    )


if __name__ == "__main__":
    if os.environ.get(_CHILD_ENV_MARK) == "1":
        main()
    else:
        _watchdogged_main()
