"""Full-pipeline eval on ARES / GIMO / Kinpoly-MoCap.

CLI mirror of the reference's eval_egoego.py: per test sequence,
  stage 1 (HeadNet + GravityNet) -> stage-1 head metrics
  -> qpos GT -> FK -> floor snap -> head-pose floor alignment
  -> stage-2 conditional diffusion (best of --sample_bs by MPJPE)
  -> full metric suite -> JSON dump.

Scene splits, "step"-sequence exclusion, and SLAM-failure blacklists follow
eval_egoego.py:213-233.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp

from egoego_release_tpu.data.formats import load_motion_dict
from egoego_release_tpu.data.headpose import (
    ARESHeadPoseDataset,
    GIMOHeadPoseDataset,
    RealWorldHeadPoseDataset,
)
from egoego_release_tpu.eval.build import build_pipeline
from egoego_release_tpu.eval.pipeline import (
    HEAD_IDX,
    evaluate_sequence,
    stage1_metrics,
)
from egoego_release_tpu.ops import fk as fk_mod
from egoego_release_tpu.ops import geometry

ARES_TEST_SCENES = ("office_0", "hotel_0", "room_2", "frl_apartment_4", "apartment_0")
GIMO_TEST_SCENES = ("storeroom0217", "classroom0219", "lab0220", "kitchen0214")


def select_dataset(opt):
    if opt.test_on_ares:
        return ARESHeadPoseDataset(opt.data_root_folder, train=False,
                                   window=opt.window, for_eval=True)
    if opt.test_on_gimo:
        return GIMOHeadPoseDataset(opt.data_root_folder, train=False,
                                   window=opt.window, for_eval=True)
    return RealWorldHeadPoseDataset(opt.data_root_folder, train=False,
                                    window=opt.window, for_eval=True,
                                    eval_on_kinpoly_mocap=True)


def keep_sequence(opt, seq_name: str, bad_seqs: set) -> bool:
    if seq_name in bad_seqs or seq_name + ".npz" in bad_seqs:
        return False
    if opt.test_on_ares:
        return seq_name.split("-")[0] in ARES_TEST_SCENES
    if opt.test_on_gimo:
        return seq_name.split("-")[0] in GIMO_TEST_SCENES
    return "step" not in seq_name


def run(opt) -> dict:
    pipeline = build_pipeline(
        stats_path=opt.stats_path,
        smplh_path=opt.smplh_path,
        rest_offsets_path=opt.rest_offsets,
        diffusion_ckpt=opt.diffusion_ckpt,
        headnet_ckpt=opt.headnet_ckpt,
        gravitynet_ckpt=opt.gravitynet_ckpt,
        window=opt.window,
        headnet_window=opt.headnet_window,
        timesteps=opt.timesteps,
        fused_transformer=opt.fused,
        fused_step=opt.fused_step,
        sample_microbatch=opt.sample_microbatch,
        of_bf16=opt.of_bf16,
        of_int8=opt.of_int8,
    )
    if opt.dp * opt.tp > 1:
        from egoego_release_tpu.parallel.mesh import make_mesh

        pipeline.shard(make_mesh(dp=opt.dp, tp=opt.tp))
    ds = select_dataset(opt)
    full_body_gt = load_motion_dict(opt.full_body_gt_path)
    bad_seqs: set = set()
    if opt.bad_seq_path and os.path.exists(opt.bad_seq_path):
        bad_seqs = set(pickle.load(open(opt.bad_seq_path, "rb"))["bad_seq"])

    key = jax.random.PRNGKey(opt.seed)
    agg: dict[str, list] = {}
    per_seq = {}
    n_eval = 0

    eligible = []
    for i in range(len(ds)):
        rec = ds[i]
        seq_name = rec["seq_name"]
        if not keep_sequence(opt, seq_name, bad_seqs):
            continue
        gt_key = seq_name + ".npz" if opt.test_on_ares else seq_name
        if gt_key not in full_body_gt:
            continue
        eligible.append((seq_name, rec, full_body_gt[gt_key]))
        if opt.max_seqs and len(eligible) >= opt.max_seqs:
            break

    batch_seqs = opt.batch_seqs
    if batch_seqs > 1 and (opt.mujoco_xml or opt.save_html_vis):
        print("WARNING: --batch_seqs is incompatible with --mujoco_xml/"
              "--save_html_vis; falling back to the per-sequence path")
        batch_seqs = 1
    if batch_seqs > 1:
        # TPU fan-in: bucket same-length sequences, run chunks through the
        # software-pipelined driver (qpos GT decode + stage 1 + chain +
        # metrics; host work overlaps the neighbouring chunks' chains)
        from egoego_release_tpu.eval.pipeline import run_batches_pipelined

        buckets: dict = {}
        for item in eligible:
            seq_name, rec, gt_rec = item
            # every stacked array's length is part of the key — SLAM results
            # may be truncated and GT head_pose may be shorter than qpos
            # (the per-sequence path min-trims; stacking cannot)
            bkey = (np.asarray(rec["of"]).shape[0],
                    np.asarray(rec["head_pose"]).shape[0],
                    np.asarray(rec["aligned_slam_trans"]).shape[0],
                    np.asarray(rec["ori_slam_trans"]).shape[0],
                    np.asarray(gt_rec["qpos"]).shape[0],
                    np.asarray(gt_rec["head_pose"]).shape[0])
            buckets.setdefault(bkey, []).append(item)

        chunks = []
        for items in buckets.values():
            for s in range(0, len(items), batch_seqs):
                chunks.append(items[s : s + batch_seqs])
        batches = [{
            "records": None if opt.use_gt_head_pose else [it[1] for it in chunk],
            "gt_qpos": np.stack(
                [np.asarray(it[2]["qpos"], np.float32) for it in chunk]
            ),
            "gt_head_pose": np.stack(
                [np.asarray(it[2]["head_pose"], np.float32) for it in chunk]
            ),
        } for chunk in chunks]
        key, sk = jax.random.split(key)
        import time as _time
        _t0 = _time.perf_counter()
        res = run_batches_pipelined(pipeline, batches, sk,
                                    sample_bs=opt.sample_bs)
        _dt = _time.perf_counter() - _t0
        _n = sum(len(c) for c in chunks)
        print(f"batched eval: {_n} seqs in {_dt:.1f}s "
              f"({_n / _dt:.2f} seqs/sec incl. first-chunk compile)")
        for chunk, b in zip(chunks, res):
            for j, ((seq_name, _, _), md) in enumerate(zip(chunk, b["metrics"])):
                entry = {k: float(np.mean(v)) for k, v in md.items()
                         if k != "single_jpe"}
                if b["s1"] is not None:
                    s1_e, s1_o, s1_t = (float(v[j]) for v in b["s1"])
                else:
                    # GT-head mode: the per-sequence path reports exact zeros
                    # (it compares the GT head pose against itself)
                    s1_e = s1_o = s1_t = 0.0
                entry.update({"s1_e_head": s1_e, "s1_o_head": s1_o,
                              "s1_t_head": s1_t})
                per_seq[seq_name] = entry
                for k2, v in entry.items():
                    agg.setdefault(k2, []).append(v)
                n_eval += 1
                print(f"[{n_eval}] {seq_name}: mpjpe={entry['mpjpe']:.2f}mm "
                      f"head_dist={entry['head_dist']:.4f}")
        eligible = []  # handled

    for seq_name, rec, gt_rec in eligible:
        # ---- stage 1 ----
        if opt.use_gt_head_pose:
            head_pose = np.asarray(gt_rec["head_pose"], np.float32)
        else:
            s1 = pipeline.stage1_head_pose(rec)
            head_pose = np.asarray(s1["head_pose"])
        t_gt = gt_rec["head_pose"].shape[0]
        head_pose = head_pose[:t_gt]

        s1_e, s1_o, s1_t = stage1_metrics(head_pose, gt_rec["head_pose"])
        print(f"{seq_name}: stage1 E={s1_e:.4f} O={s1_o:.4f} T={s1_t:.1f}mm")

        # ---- GT body via qpos codec + FK (eval_egoego.py:315-335) ----
        gt_trans, gt_aa24 = geometry.qpos_to_smpl(
            jnp.asarray(gt_rec["qpos"].astype(np.float32))
        )
        gt_aa = gt_aa24[:, :22]
        if opt.mujoco_xml:
            # exact kinpoly skeleton constants from the bundled humanoid XML
            from egoego_release_tpu.ops.mujoco_xml import load_mujoco_skeleton, qpos_fk

            sk = load_mujoco_skeleton(opt.mujoco_xml)
            mj_quat, mj_pos = qpos_fk(sk, jnp.asarray(gt_rec["qpos"].astype(np.float32)))
            # reorder mujoco bodies into SMPL joint order for the metric suite
            order = [int(np.argsort(geometry.MUJOCO2SMPL_JOINT_IDX)[j]) for j in range(22)]
            gt_jrot = mj_quat[:, order]
            gt_jpos = mj_pos[:, order]
        else:
            gt_jrot, gt_jpos = fk_mod.fk_smpl(gt_trans, gt_aa, pipeline.rest_offsets)
        floor, _, _ = geometry.determine_floor_height_and_contacts(np.asarray(gt_jpos), 30)
        gt_jpos = gt_jpos.at[:, :, 2].add(-floor)

        # align the predicted head pose to the floor-snapped GT start (:334-335)
        move = np.asarray(gt_jpos[0, HEAD_IDX]) - head_pose[0, :3]
        head_pose = head_pose.copy()
        head_pose[:, :3] += move

        if opt.use_gt_head_pose:
            head_pose = np.concatenate(
                [np.asarray(gt_jpos[:, HEAD_IDX]), np.asarray(gt_jrot[:, HEAD_IDX])], -1
            )

        # ---- stage 2 + metrics ----
        key, sk = jax.random.split(key)
        md, best = evaluate_sequence(
            pipeline, head_pose, gt_jrot, gt_jpos, sk, sample_bs=opt.sample_bs
        )
        if opt.save_html_vis:
            from egoego_release_tpu.vis.html_viewer import vis_skeleton_motion_html

            os.makedirs(opt.out_dir, exist_ok=True)
            # center every layer at the same initial-head-xy origin the
            # prediction uses (pipeline.py subtracts it), or the head
            # polyline floats metres from the skeletons for sequences whose
            # GT starts away from the world origin
            t_vis = best["pred_jpos"].shape[0]
            origin_xy = np.asarray(gt_jpos[0:1, HEAD_IDX, :]) * [1.0, 1.0, 0.0]
            vis_skeleton_motion_html(
                best["pred_jpos"],
                os.path.join(opt.out_dir, seq_name + ".html"),
                gt_jpos=np.asarray(gt_jpos)[:t_vis] - origin_xy[:, None, :],
                head_traj=head_pose[:t_vis, :3] - origin_xy,
                title=seq_name,
            )
        entry = {k: float(np.mean(v)) for k, v in md.items() if k != "single_jpe"}
        entry.update({"s1_e_head": s1_e, "s1_o_head": s1_o, "s1_t_head": s1_t})
        per_seq[seq_name] = entry
        for k, v in entry.items():
            agg.setdefault(k, []).append(v)
        n_eval += 1
        print(f"  mpjpe={entry['mpjpe']:.2f}mm head_dist={entry['head_dist']:.4f}")

    summary = {k: float(np.mean(v)) for k, v in agg.items()}
    result = {"mean": summary, "per_seq": per_seq, "num_seqs": n_eval}
    os.makedirs(opt.out_dir, exist_ok=True)
    tag = "ares" if opt.test_on_ares else ("gimo" if opt.test_on_gimo else "kinpoly")
    out_path = os.path.join(opt.out_dir, f"egoego_pipeline_res_on_{tag}.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print("mean:", json.dumps(summary, indent=2))
    return result


def parse_opt(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_root_folder", required=True)
    p.add_argument("--full_body_gt_path", required=True,
                   help="kinpoly-format mocap_annotations.p with qpos experts")
    p.add_argument("--bad_seq_path", default=None)
    p.add_argument("--stats_path", required=True)
    p.add_argument("--diffusion_ckpt", default=None)
    p.add_argument("--headnet_ckpt", default=None)
    p.add_argument("--gravitynet_ckpt", default=None)
    p.add_argument("--smplh_path", default=None)
    p.add_argument("--rest_offsets", default=None)
    p.add_argument("--window", type=int, default=120)
    p.add_argument("--headnet_window", type=int, default=60)
    p.add_argument("--timesteps", type=int, default=1000,
                   help="DDPM steps (1000 = reference; lower for smoke runs)")
    p.add_argument("--sample_bs", type=int, default=1)
    p.add_argument("--batch_seqs", type=int, default=1,
                   help="TPU fan-in: bucket same-length sequences and run N "
                        "per pipelined diffusion chain (composes with "
                        "--sample_bs best-of-N and --dp/--tp)")
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
    p.add_argument("--of_bf16", action="store_true",
                   help="upload optical-flow features bf16 (halves the "
                        "pipeline's dominant host->device stream; cast back "
                        "to f32 in-program — bf16 rounding of the ResNet "
                        "embeddings is the only deviation)")
    p.add_argument("--of_int8", action="store_true",
                   help="upload optical-flow features int8 with per-frame "
                        "absmax scales (quarter the f32 stream; dequantized "
                        "in-program — coarser than bf16 for small features)")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel mesh size: the sample_bs best-of "
                        "candidates fan across chips (SURVEY §2.4)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel mesh size for the denoiser params")
    p.add_argument("--max_seqs", type=int, default=0)
    p.add_argument("--test_on_ares", action="store_true")
    p.add_argument("--test_on_gimo", action="store_true")
    p.add_argument("--use_gt_head_pose", action="store_true")
    p.add_argument("--save_html_vis", action="store_true",
                   help="write an interactive HTML pred-vs-GT skeleton "
                        "animation per sequence")
    p.add_argument("--mujoco_xml", default=None,
                   help="humanoid XML for exact kinpoly-skeleton GT decoding")
    p.add_argument("--out_dir", default="./results")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    run(parse_opt(argv))


if __name__ == "__main__":
    main()
