"""Demo pipeline on the bundled ARES fixture.

CLI mirror of the reference's run_egoego.py: load the demo sequence, run
stage 1 (HeadNet + GravityNet), condition stage-2 diffusion on the predicted
head pose, FK-decode, floor-snap, and export per-frame predictions (npz +
optional .obj meshes for Blender).

Usage:
  python -m egoego_release_tpu.eval.run_egoego \
      --data_root_folder test_data/ares \
      --stats_path test_data/ares/cano_min_max_mean_std_data_window_120.p \
      [--headnet_ckpt ... --gravitynet_ckpt ... --diffusion_ckpt ...] \
      --smplh_path smpl_models/smplh_amass --out_dir demo_out
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp

from egoego_release_tpu.data.headpose import ARESDemoDataset
from egoego_release_tpu.eval.build import build_pipeline
from egoego_release_tpu.ops import geometry


def run(opt):
    pipeline = build_pipeline(
        stats_path=opt.stats_path,
        smplh_path=opt.smplh_path,
        rest_offsets_path=opt.rest_offsets,
        diffusion_ckpt=opt.diffusion_ckpt,
        headnet_ckpt=opt.headnet_ckpt,
        gravitynet_ckpt=opt.gravitynet_ckpt,
        window=opt.window,
        timesteps=opt.timesteps,
    )
    ds = ARESDemoDataset(opt.data_root_folder)
    os.makedirs(opt.out_dir, exist_ok=True)
    key = jax.random.PRNGKey(opt.seed)

    for i in range(len(ds)):
        rec = ds[i]
        print("sequence:", rec["seq_name"])
        s1 = pipeline.stage1_head_pose(rec)
        head_pose = np.array(s1["head_pose"])
        # demo floor offset for the bundled sequence (run_egoego.py:136)
        head_pose[:, 2] += opt.demo_floor_offset

        key, sk = jax.random.split(key)
        local_aa, root_pos = pipeline.stage2_generate(
            jnp.asarray(head_pose), sk, sample_bs=1
        )
        pred_jrot, pred_jpos = pipeline.fk(root_pos, local_aa)

        # re-detect the floor on the prediction and snap (run_egoego.py:170)
        floor, _, _ = geometry.determine_floor_height_and_contacts(
            np.asarray(pred_jpos[0]), fps=30
        )
        root_out = np.array(root_pos[0])
        root_out[:, 2] -= floor

        out_path = os.path.join(opt.out_dir, rec["seq_name"] + ".npz")
        np.savez(
            out_path,
            local_aa=np.asarray(local_aa[0]),
            root_pos=root_out,
            head_pose=head_pose,
            pred_scale=float(s1["pred_scale"]),
            pred_jpos=np.asarray(pred_jpos[0]),
        )
        print("saved:", out_path)

        if opt.export_objs and opt.smplh_path:
            from egoego_release_tpu.vis.mesh_export import export_obj_sequence

            export_obj_sequence(
                opt.smplh_path, np.asarray(local_aa[0]), root_out,
                os.path.join(opt.out_dir, rec["seq_name"] + "_objs"),
            )

        if opt.save_html_vis:
            from egoego_release_tpu.vis.html_viewer import vis_skeleton_motion_html

            pred_snapped = np.asarray(pred_jpos[0]).copy()
            pred_snapped[:, :, 2] -= floor
            html_path = vis_skeleton_motion_html(
                pred_snapped,
                os.path.join(opt.out_dir, rec["seq_name"] + ".html"),
                head_traj=head_pose[:, :3],
                title=rec["seq_name"],
            )
            print("saved:", html_path)


def parse_opt(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_root_folder", required=True)
    p.add_argument("--stats_path", required=True)
    p.add_argument("--diffusion_ckpt", default=None)
    p.add_argument("--headnet_ckpt", default=None)
    p.add_argument("--gravitynet_ckpt", default=None)
    p.add_argument("--smplh_path", default=None)
    p.add_argument("--rest_offsets", default=None)
    p.add_argument("--window", type=int, default=120)
    p.add_argument("--timesteps", type=int, default=1000,
                   help="DDPM steps (reduce only for smoke tests)")
    p.add_argument("--demo_floor_offset", type=float, default=-0.13)
    p.add_argument("--export_objs", action="store_true")
    p.add_argument("--save_html_vis", action="store_true",
                   help="write a standalone interactive HTML skeleton "
                        "animation per sequence (vis/html_viewer.py)")
    p.add_argument("--out_dir", default="./demo_out")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    run(parse_opt(argv))


if __name__ == "__main__":
    main()
