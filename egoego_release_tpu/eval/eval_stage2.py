"""Stage-2 diffusion eval on the AMASS test split.

CLI mirror of the reference's eval_stage2.py: for each test sequence
(Transitions_mocap + HumanEva, first `window` frames — eval_stage2.py:94,114),
FK the GT, snap to the floor, condition the diffusion model on the GT head
pose, sample, and run the metric suite; dump a JSON summary.

Usage:
  python -m egoego_release_tpu.eval.eval_stage2 \
      --test_data_path <test_amass_smplh_motion.p> \
      --checkpoint stage2_diffusion_4.pt \
      --smplh_path smpl_models/smplh_amass [--sample_bs 8]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import jax

from egoego_release_tpu.data.formats import load_motion_dict
from egoego_release_tpu.eval.build import build_pipeline
from egoego_release_tpu.eval.pipeline import evaluate_sequence, gt_from_smpl_params

TEST_SUBSETS = ("Transitions_mocap", "HumanEva")  # eval_stage2.py:94


def run(opt) -> dict:
    pipeline = build_pipeline(
        stats_path=opt.stats_path,
        smplh_path=opt.smplh_path,
        rest_offsets_path=opt.rest_offsets,
        diffusion_ckpt=opt.checkpoint,
        window=opt.window,
        sampler="ddim" if opt.ddim_steps else "ddpm",
        ddim_steps=opt.ddim_steps or 50,
        timesteps=opt.timesteps,
        fused_transformer=opt.fused,
        fused_step=opt.fused_step,
        sample_microbatch=opt.sample_microbatch,
    )
    if opt.dp * opt.tp > 1:
        from egoego_release_tpu.parallel.mesh import make_mesh

        pipeline.shard(make_mesh(dp=opt.dp, tp=opt.tp))
    data = load_motion_dict(opt.test_data_path)

    key = jax.random.PRNGKey(opt.seed)
    agg: dict[str, list] = {}
    per_seq = {}

    # gather eligible sequences (first `window` frames of long-enough seqs,
    # Transitions_mocap/HumanEva subsets — eval_stage2.py:94,114)
    eligible = []
    for idx in data:
        rec = data[idx]
        seq_name = rec.get("seq_name", str(idx))
        if opt.filter_subsets and not any(s in seq_name for s in TEST_SUBSETS):
            continue
        if rec["trans"].shape[0] < opt.window:
            continue
        eligible.append((seq_name, rec))
        if opt.max_seqs and len(eligible) >= opt.max_seqs:
            break

    def record_result(seq_name, md):
        per_seq[seq_name] = {
            k: float(np.mean(v)) for k, v in md.items() if k != "single_jpe"
        }
        for k, v in per_seq[seq_name].items():
            agg.setdefault(k, []).append(v)
        print(f"[{len(per_seq)}] {seq_name}: mpjpe={per_seq[seq_name]['mpjpe']:.2f}mm "
              f"head_dist={per_seq[seq_name]['head_dist']:.4f}")

    if opt.batch_seqs <= 1:
        # per-sequence path (best-of-sample_bs selection, like the reference)
        for seq_name, rec in eligible:
            t = opt.window
            gt_jrot, gt_jpos, gt_head_pose = gt_from_smpl_params(
                pipeline, rec["trans"][:t], rec["root_orient"][:t], rec["body_pose"][:t]
            )
            key, sk = jax.random.split(key)
            md, _ = evaluate_sequence(
                pipeline, np.asarray(gt_head_pose), gt_jrot, gt_jpos, sk,
                sample_bs=opt.sample_bs,
            )
            record_result(seq_name, md)
    else:
        # batched path: N single-window sequences share one diffusion chain,
        # GT prep is ONE batched FK per chunk, and the chunks run through the
        # software-pipelined driver (host floor clustering / metric
        # unflattening overlap the neighbouring chunks' device-bound chains)
        from egoego_release_tpu.eval.pipeline import run_batches_pipelined

        t = opt.window
        chunks = [eligible[s : s + opt.batch_seqs]
                  for s in range(0, len(eligible), opt.batch_seqs)]
        batches = [{
            "gt_trans": np.stack([rec["trans"][:t] for _, rec in chunk]),
            "gt_root_orient": np.stack(
                [rec["root_orient"][:t] for _, rec in chunk]
            ),
            "gt_body_pose": np.stack(
                [rec["body_pose"][:t] for _, rec in chunk]
            ),
        } for chunk in chunks]
        key, sk = jax.random.split(key)
        import time as _time

        t0 = _time.perf_counter()
        res = run_batches_pipelined(pipeline, batches, sk,
                                    sample_bs=opt.sample_bs)
        dt = _time.perf_counter() - t0
        print(f"batched eval: {len(eligible)} seqs in {dt:.1f}s "
              f"({len(eligible) / dt:.2f} seqs/sec incl. first-chunk "
              "compile)")
        for chunk, b in zip(chunks, res):
            for (seq_name, _), md in zip(chunk, b["metrics"]):
                record_result(seq_name, md)
    n_eval = len(per_seq)

    summary = {k: float(np.mean(v)) for k, v in agg.items()}
    result = {"mean": summary, "per_seq": per_seq, "num_seqs": n_eval}
    os.makedirs(opt.out_dir, exist_ok=True)
    out_path = os.path.join(opt.out_dir, "stage2_diffusion_model_res_on_amass_test.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print("mean:", json.dumps(summary, indent=2))
    print("saved:", out_path)
    return result


def parse_opt(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--test_data_path", required=True,
                   help="AMASS test motion pickle (test_amass_smplh_motion.p)")
    p.add_argument("--stats_path", required=True,
                   help="min/max stats pickle (cano_min_max_mean_std_data_window_120.p)")
    p.add_argument("--checkpoint", default=None, help="stage2 torch .pt checkpoint")
    p.add_argument("--smplh_path", default=None)
    p.add_argument("--rest_offsets", default=None)
    p.add_argument("--window", type=int, default=120)
    p.add_argument("--timesteps", type=int, default=1000,
                   help="DDPM steps (1000 = reference; lower for smoke runs)")
    p.add_argument("--sample_bs", type=int, default=1)
    p.add_argument("--batch_seqs", type=int, default=16,
                   help="sequences per diffusion batch (TPU-native batched eval)")
    p.add_argument("--ddim_steps", type=int, default=0,
                   help="use the fast DDIM sampler with N steps (0 = parity DDPM-1000)")
    p.add_argument("--fused", action="store_true",
                   help="fused Pallas decoder-layer denoiser (faster at "
                        "batch>=128; bf16-rounding-level drift — BASELINE.md)")
    p.add_argument("--fused_step", action="store_true",
                   help="fused denoise-STEP kernels (ops/fused_step.py): the "
                        "fastest canonical-chain mode (39.8 vs 32.9 seqs/sec "
                        "at bs=256 — BASELINE.md round-3); bf16-level drift")
    p.add_argument("--sample_microbatch", type=int, default=0,
                   help="chunk the sampling batch to N inside the jit "
                        "(large-batch cliff fix; 0 = off)")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel mesh size: sequences/samples fan "
                        "across chips (SURVEY §2.4 eval fan-out)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel mesh size for the denoiser params")
    p.add_argument("--max_seqs", type=int, default=0)
    p.add_argument("--filter_subsets", action="store_true", default=True)
    p.add_argument("--no_filter_subsets", dest="filter_subsets", action="store_false")
    p.add_argument("--out_dir", default="./results")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    run(parse_opt(argv))


if __name__ == "__main__":
    main()
