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


def eval_record(model, params, rec: dict, rest_offsets) -> dict:
    data = {k: jnp.asarray(rec[k][None]) for k in
            ("head_pose", "head_vels", "obj_pose", "obj_head_relative_poses")}
    gt_qpos = jnp.asarray(rec["qpos"])
    out = model.apply(params, data, init_qpos=gt_qpos[:1])

    def fk(qpos):
        trans, aa24 = geometry.qpos_to_smpl(qpos)
        return fk_mod.fk_smpl(trans, aa24[:, :22], jnp.asarray(rest_offsets))

    pred_q, pred_p = fk(out["qpos"][0])
    gt_q, gt_p = fk(gt_qpos)
    if not np.isfinite(np.asarray(pred_p)).all():
        # an untrained/underfit policy can diverge through the qpos feedback
        # loop (the reference's rollout would too); report it instead of NaNs
        return {"diverged": 1.0}
    md = metrics_mod.compute_metrics_for_smpl(
        gt_q, gt_p, jnp.float32(0.0), pred_q, pred_p, jnp.float32(0.0)
    )
    out_d = {k: float(np.mean(v)) for k, v in md.items() if k != "single_jpe"}
    out_d["diverged"] = 0.0
    return out_d


def run(opt) -> dict:
    from egoego_release_tpu.eval.build import load_rest_offsets

    rest = load_rest_offsets(opt.smplh_path, opt.rest_offsets)
    ds = StateARDataset(opt.expert_path, fr_num=opt.fr_num, train=False)

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
        md = eval_record(model, params, rec, rest)
        per_seq[rec["seq_name"]] = md
        for k, v in md.items():
            agg.setdefault(k, []).append(v)
        if md.get("diverged"):
            print(f"{rec['seq_name']}: DIVERGED")
        else:
            print(f"{rec['seq_name']}: mpjpe={md['mpjpe']:.2f}mm")
        if opt.max_seqs and i + 1 >= opt.max_seqs:
            break

    summary = {k: float(np.mean(v)) for k, v in agg.items()}
    os.makedirs(opt.out_dir, exist_ok=True)
    with open(os.path.join(opt.out_dir, "trajar_baseline_res.json"), "w") as f:
        json.dump({"mean": summary, "per_seq": per_seq}, f, indent=2)
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
    p.add_argument("--out_dir", default="./results")
    return p.parse_args(argv)


if __name__ == "__main__":
    run(parse_opt())
