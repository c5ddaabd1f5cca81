"""Measure the fused Pallas decoder-layer kernel vs the XLA (flax) denoiser
forward at the flagship stage-2 scale on the real TPU.

Timing uses a data-dependent `lax.scan` of chained forwards — per-call host
timing through the axon tunnel pipelines dispatches and reports impossible
numbers (>1.6 PFLOPS); the chained scan matches the full-sampler throughput
observed by bench.py.  Results recorded in BASELINE.md.

Usage: python tools/bench_fused_layer.py [--bs 64] [--steps 100] [--bt 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=64)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--bt", type=int, default=4)
    args = ap.parse_args()

    from egoego_release_tpu.diffusion import CondGaussianDiffusion, DiffusionConfig
    from egoego_release_tpu.ops.fused_layer import fused_denoiser_apply

    cfg = DiffusionConfig()  # release dims: d_model 512, 4 layers, dk=dv=256
    diff = CondGaussianDiffusion(cfg)
    key = jax.random.PRNGKey(0)
    params = diff.init_params(key, bs=1)
    src = jax.random.normal(key, (args.bs, cfg.window, 2 * cfg.d_feats), jnp.float32)
    t = jnp.full((args.bs,), 500, jnp.int32)
    n = args.steps

    def make(apply_fn):
        def body(x, _):
            out = apply_fn(params, x, t)
            # feed the model output back in: forces true serialization
            return jnp.concatenate([out, x[..., cfg.d_feats:]], -1), ()

        @jax.jit
        def run(x0):
            xf, _ = jax.lax.scan(body, x0, None, length=n)
            return xf

        return run

    runs = {
        "xla": make(lambda p, s, tt: diff.denoiser.apply(p, s, tt)),
        "fused": make(lambda p, s, tt: fused_denoiser_apply(
            p, s, tt, None, cfg=cfg, batch_tile=args.bt)),
    }
    outs, times = {}, {}
    for name, run in runs.items():
        r = run(src)
        r.block_until_ready()               # compile + warm
        t0 = time.perf_counter()
        r = run(src)
        r.block_until_ready()
        dt = (time.perf_counter() - t0) / n
        outs[name], times[name] = r, dt
        gflops = 183.2 * args.bs / 64       # per batch-forward (XLA cost analysis)
        print(f"{name:>6s}: {dt * 1e3:7.3f} ms/forward  "
              f"{gflops / dt / 1e3:7.1f} TFLOPS  ({args.bs / dt:8.0f} window-fwd/s)")
    diff_max = float(jnp.abs(outs["xla"] - outs["fused"]).max())
    print(f"max|diff| after {n} chained forwards: {diff_max:.4e} "
          f"(bf16 matmul inputs both)")
    print(f"speedup fused/xla: {times['xla'] / times['fused']:.3f}x")


if __name__ == "__main__":
    main()
