"""TrajARNet baseline evaluation.

Mirror of the kinpoly baseline eval scripts
(kinpoly/scripts/eval_pose_all.py / eval_amass_metrics.py, the non-RL
"statear" path): roll the trained kinematic policy over expert head
conditions, FK both prediction and GT, and run the same metric suite the
EgoEgo eval uses — so the baseline and the diffusion pipeline are compared
on identical numbers.

  python -m egoego_release_tpu.eval.eval_trajar \
      --expert_path mocap_annotations.p --ckpt results/trajar/final \
      --rest_offsets rest.npy
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from egoego_release_tpu.data.kinpoly import StateARDataset
from egoego_release_tpu.eval import metrics as metrics_mod
from egoego_release_tpu.models.trajar import TrajARNet
from egoego_release_tpu.ops import fk as fk_mod
from egoego_release_tpu.ops import geometry


def eval_record(model, params, rec: dict, rest_offsets, return_qpos: bool = False):
    data = {k: jnp.asarray(rec[k][None]) for k in
            ("head_pose", "head_vels", "obj_pose", "obj_head_relative_poses")}
    gt_qpos = jnp.asarray(rec["qpos"])
    out = model.apply(params, data, init_qpos=gt_qpos[:1])
    pred_qpos = np.asarray(out["qpos"][0])

    def fk(qpos):
        trans, aa24 = geometry.qpos_to_smpl(qpos)
        return fk_mod.fk_smpl(trans, aa24[:, :22], jnp.asarray(rest_offsets))

    pred_q, pred_p = fk(out["qpos"][0])
    gt_q, gt_p = fk(gt_qpos)
    if not np.isfinite(np.asarray(pred_p)).all():
        # an untrained/underfit policy can diverge through the qpos feedback
        # loop (the reference's rollout would too); report it instead of NaNs
        out_d = {"diverged": 1.0}
        return (out_d, pred_qpos) if return_qpos else out_d
    md = metrics_mod.compute_metrics_for_smpl(
        gt_q, gt_p, jnp.float32(0.0), pred_q, pred_p, jnp.float32(0.0)
    )
    out_d = {k: float(np.mean(v)) for k, v in md.items() if k != "single_jpe"}
    out_d["diverged"] = 0.0
    return (out_d, pred_qpos) if return_qpos else out_d


def run(opt) -> dict:
    from egoego_release_tpu.eval.build import load_rest_offsets

    rest = load_rest_offsets(opt.smplh_path, opt.rest_offsets)
    ds = StateARDataset(opt.expert_path, fr_num=opt.fr_num, train=False)

    qpos_records = {} if opt.mujoco_xml else None

    rest_t = tuple(map(tuple, np.asarray(rest).tolist()))
    model = TrajARNet(rnn_hdim=opt.rnn_hdim, mlp_hsize=(1024, 512), rest_offsets=rest_t)
    if opt.ckpt and os.path.exists(opt.ckpt):
        import orbax.checkpoint as ocp

        params = ocp.PyTreeCheckpointer().restore(os.path.abspath(opt.ckpt))
        params = jax.tree.map(jnp.asarray, params)
    else:
        print("WARNING: no TrajARNet checkpoint; using random init")
        rec0 = ds.sample_seq(0)
        data0 = {k: jnp.asarray(rec0[k][None]) for k in
                 ("head_pose", "head_vels", "obj_pose", "obj_head_relative_poses")}
        params = model.init(jax.random.PRNGKey(0), data0)

    agg: dict[str, list] = {}
    per_seq = {}
    for i in range(len(ds)):
        rec = ds.sample_seq(i)
        md, pred_qpos = eval_record(model, params, rec, rest, return_qpos=True)
        per_seq[rec["seq_name"]] = md
        for k, v in md.items():
            agg.setdefault(k, []).append(v)
        if qpos_records is not None and not md.get("diverged"):
            qpos_records[rec["seq_name"]] = {
                "qpos": pred_qpos, "qpos_gt": np.asarray(rec["qpos"]),
            }
        if md.get("diverged"):
            print(f"{rec['seq_name']}: DIVERGED")
        else:
            print(f"{rec['seq_name']}: mpjpe={md['mpjpe']:.2f}mm")
        if opt.max_seqs and i + 1 >= opt.max_seqs:
            break

    summary = {k: float(np.mean(v)) for k, v in agg.items()}
    result = {"mean": summary, "per_seq": per_seq}

    if qpos_records:
        # the kinpoly qpos metric path (eval_metrics_imu_rec.compute_metrics)
        # over the exact mujoco skeleton, reported alongside the tensor suite
        from egoego_release_tpu.eval.qpos_metrics import (
            _fk_take,
            compute_metrics_for_qpos_records,
        )
        from egoego_release_tpu.ops.mujoco_xml import load_mujoco_skeleton

        skeleton = load_mujoco_skeleton(opt.mujoco_xml)
        for rec in qpos_records.values():
            rec["head_pose_gt"] = _fk_take(skeleton, rec["qpos_gt"])[1]
        qpos_md = compute_metrics_for_qpos_records(qpos_records, skeleton)
        result["qpos_metrics"] = {
            k: float(np.mean(v)) for k, v in qpos_md.items() if k != "single_jpe"
        }
        print("qpos-path mpjpe: %.2f mm, slide_pred: %.2f"
              % (qpos_md["mpjpe"], qpos_md["slide_pred"]))

    if qpos_records and opt.physics_metrics:
        # simulator-grounded penetration/sliding/success metrics
        # (eval_amass_metrics.py compute_physcis_metris / compute_obj_interact)
        from egoego_release_tpu.eval.physics_metrics import (
            compute_physics_metrics,
            interaction_success,
        )
        from egoego_release_tpu.rl.mujoco_env import MujocoHumanoidEnv

        env = MujocoHumanoidEnv(opt.mujoco_xml, residual_force=False)
        obj_bodies = tuple(opt.obj_bodies or ())
        phys_agg: dict[str, list] = {}
        for name, rec in qpos_records.items():
            obj_pose = rec.get("obj_pose")
            # write object qpos into the sim only when the model has slots
            # for it (the plain humanoid XML has none)
            obj_pose_sim = None
            if obj_pose is not None:
                extra = env.model.nq - rec["qpos"].shape[1]
                if extra > 0:
                    obj_pose_sim = np.asarray(obj_pose)[:, :extra]
            pm_pred = compute_physics_metrics(env, rec["qpos"], obj_pose=obj_pose_sim)
            pm_gt = compute_physics_metrics(env, rec["qpos_gt"], obj_pose=obj_pose_sim)
            action = name.split("-")[0] if "-" in name else "None"
            try:
                succ = interaction_success(
                    action, pm_pred["pen_seq_info"], rec["qpos"],
                    pm_pred["head_pose"],
                    head_pose_gt=pm_gt["head_pose"], obj_pose=obj_pose,
                    env=env, obj_body_names=obj_bodies,
                )
                phys_agg.setdefault("succ", []).append(float(succ))
            except ValueError as e:
                # object-action take without object data/bodies on this model
                print(f"{name}: success not scoreable ({e})")
            for k, v in (("pen_pred", pm_pred["pen"]), ("pen_gt", pm_gt["pen"]),
                         ("slide_pred", pm_pred["sliding"]),
                         ("slide_gt", pm_gt["sliding"])):
                phys_agg.setdefault(k, []).append(v)
        result["physics_metrics"] = {
            k: float(np.mean(v)) for k, v in phys_agg.items()
        }
        print("physics: pen_pred=%.2fmm succ=%.2f"
              % (result["physics_metrics"]["pen_pred"],
                 result["physics_metrics"]["succ"]))

    os.makedirs(opt.out_dir, exist_ok=True)
    with open(os.path.join(opt.out_dir, "trajar_baseline_res.json"), "w") as f:
        json.dump(result, f, indent=2)
    print("mean:", json.dumps(summary, indent=2))
    return summary


def parse_opt(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--expert_path", required=True)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--smplh_path", default=None)
    p.add_argument("--rest_offsets", default=None)
    p.add_argument("--fr_num", type=int, default=90)
    p.add_argument("--rnn_hdim", type=int, default=512)
    p.add_argument("--max_seqs", type=int, default=0)
    p.add_argument("--mujoco_xml", default=None,
                   help="humanoid XML; when given, also report the kinpoly "
                        "qpos-path metric suite (eval/qpos_metrics.py)")
    p.add_argument("--physics_metrics", action="store_true",
                   help="with --mujoco_xml: also run the simulator-grounded "
                        "penetration/sliding/success suite "
                        "(eval/physics_metrics.py; needs mujoco)")
    p.add_argument("--obj_bodies", nargs="*", default=None,
                   help="object body names on the XML for sit/avoid/step "
                        "success scoring (e.g. Chair Step)")
    p.add_argument("--out_dir", default="./results")
    return p.parse_args(argv)


def main(argv=None):
    run(parse_opt(argv))


if __name__ == "__main__":
    main()
