"""Chain-level MFU: sustained TFLOPS of the canonical sliding-window chain.

BASELINE.md pins the BARE denoiser forward at ~126 TFLOPS (64% of the
197-TFLOPS v5e bf16 peak) but never states the sustained MFU of the real
inference unit — the canonical chain (transformer_cond_diffusion_model.py:
330-467 semantics): per 140-frame sequence, 1000 DDPM steps over TWO chained
windows (a full 120-frame window and a ragged 30-frame tail), each step one
denoiser forward plus the posterior update.  This tool computes the analytic
FLOPs of one sequence under both conventions and converts a measured
seqs/sec rate into sustained TFLOPS / MFU:

  * USEFUL FLOPs — real token/feature counts (t_tokens, d_feats): the
    model-math convention (what any implementation must compute)
  * EXECUTED FLOPs — the shapes the fused-step kernels actually run
    (frames padded to the f32 sublane tile 8, features to the 128-lane
    tile): the hardware-utilization convention

  CHAIN_SEQS_PER_SEC=39.8 python tools/chain_mfu.py     # arithmetic only
  CHAIN_MEASURE=1 python tools/chain_mfu.py             # bench first (TPU)

FLOPs model matches ops/fused_step.py exactly: stem = two (T, Dp) @ (Dp, dm)
matmuls, n_dec_layers x (QKV + per-head attention + out-proj + 2-matmul FFN
with d_hid = d_model — transformer.py:12), output projection (T, dm) @
(dm, Dp); elementwise/posterior work is ignored (<0.1% of the matmul FLOPs).
"""

import json
import os
import subprocess
import sys

V5E_BF16_PEAK_TFLOPS = 197.0


def round_up(x, m):
    return (x + m - 1) // m * m


def forward_flops(t_data, t_tokens, d, dm, n_head, d_k, d_v, n_layers):
    """Per-SAMPLE matmul FLOPs of one denoiser forward at the given shapes
    (t_tokens = attention/FFN token count, t_data = stem/proj row count,
    d = feature width).  Mirrors ops/fused_step.py kernel shapes and
    ops/fused_layer._layer_cost."""
    stem = 2 * 2 * t_data * d * dm                    # x@Wx + x_cond@Wc
    per_layer = (
        2 * t_tokens * dm * 3 * n_head * d_k          # QKV projections
        + 2 * n_head * t_tokens * t_tokens * (d_k + d_v)  # scores + context
        + 2 * t_tokens * n_head * d_v * dm            # attention out-proj
        + 4 * t_tokens * dm * dm                      # FFN (d_hid = dm)
    )
    proj = 2 * t_data * dm * d                        # linear_out
    return stem + n_layers * per_layer + proj


def chain_flops(frames=140, window=120, overlap=10, timesteps=1000,
                d=198, dm=512, n_head=4, d_k=256, d_v=256, n_layers=4):
    """(useful, executed) FLOPs for ONE sequence through the chain."""
    stride = window - overlap
    starts = list(range(0, max(frames - overlap, 1), stride))
    useful = executed = 0
    windows = []
    for s in starts:
        t_data = min(window, frames - s)
        t_tokens = t_data + 1
        # fused-step padding: frames -> sublane tile 8, features -> lane 128
        td_p = round_up(t_data, 8)
        tp = round_up(td_p + 1, 8)
        dp = round_up(d, 128)
        u = forward_flops(t_data, t_tokens, d, dm, n_head, d_k, d_v, n_layers)
        e = forward_flops(td_p, tp, dp, dm, n_head, d_k, d_v, n_layers)
        useful += timesteps * u
        executed += timesteps * e
        windows.append({"t_data": t_data, "t_tokens_padded": tp,
                        "gflops_useful": round(timesteps * u / 1e9, 1),
                        "gflops_executed": round(timesteps * e / 1e9, 1)})
    return useful, executed, windows


def main():
    seqs = os.environ.get("CHAIN_SEQS_PER_SEC")
    measured = None
    if os.environ.get("CHAIN_MEASURE", "0") == "1":
        env = dict(os.environ)
        env.setdefault("E2E_STEP", "1")
        env.setdefault("E2E_BATCH", "256")
        out = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__),
                                          "bench_e2e.py")],
            env=env, capture_output=True, text=True, timeout=1800,
        )
        if out.returncode != 0:
            raise SystemExit(f"bench_e2e failed:\n{out.stdout}\n{out.stderr}")
        measured = json.loads(out.stdout.strip().splitlines()[-1])
        seqs = measured["value"]
    if seqs is None:
        seqs = 39.8  # BASELINE.md round-3 fused-step chain best (bs=256)
    seqs = float(seqs)

    useful, executed, windows = chain_flops()
    result = {
        "metric": "canonical-chain sustained MFU (v5e bf16 peak "
                  f"{V5E_BF16_PEAK_TFLOPS} TFLOPS)",
        "seqs_per_sec": seqs,
        "windows": windows,
        "per_seq_gflops_useful": round(useful / 1e9, 1),
        "per_seq_gflops_executed": round(executed / 1e9, 1),
        "sustained_tflops_useful": round(seqs * useful / 1e12, 1),
        "sustained_tflops_executed": round(seqs * executed / 1e12, 1),
        "mfu_useful": round(seqs * useful / 1e12 / V5E_BF16_PEAK_TFLOPS, 3),
        "mfu_executed": round(seqs * executed / 1e12 / V5E_BF16_PEAK_TFLOPS, 3),
    }
    if measured is not None:
        result["bench_e2e"] = measured
    print(json.dumps(result))


if __name__ == "__main__":
    main()
