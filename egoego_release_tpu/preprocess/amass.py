"""AMASS preprocessing CLI.

Port of utils/data_utils/process_amass_dataset.py: per-sequence npz
processing (middle-80% trim, SMPL-H forward for joints, floor-height fit +
contacts, terrain discard, 30 fps resample, head-pose features) followed by
aggregation into the joblib motion pickles the datasets consume
(amass_smplh_motion.p -> train_/test_ splits).

TPU-first: the SMPL forward runs as the batched JAX LBS (ops/smpl.py) in one
shot per chunk; head features use the batched FK/rotation ops instead of
per-frame torch loops.

Usage:
  python -m egoego_release_tpu.preprocess.amass process \
      --amass_root <amass npz root> --smplh_path <smpl models> --out <dir>
  python -m egoego_release_tpu.preprocess.amass aggregate \
      --processed_root <dir> --out <dir>/amass_smplh_motion.p
"""

from __future__ import annotations

import argparse
import os
import time

import joblib
import numpy as np
import jax
import jax.numpy as jnp

from egoego_release_tpu.ops import fk as fk_mod
from egoego_release_tpu.ops import geometry
from egoego_release_tpu.ops import rotations as rot
from egoego_release_tpu.ops.smpl import lbs, load_smpl_npz

NUM_BETAS = 10
OUT_FPS = 30
DISCARD_SHORTER_THAN = 1.0  # seconds
SPLIT_FRAME_LIMIT = 2000

TRAIN_DATASETS = (
    "CMU", "MPI_Limits", "TotalCapture", "Eyes_Japan_Dataset", "KIT",
    "BioMotionLab_NTroje", "BMLmovi", "EKUT", "ACCAD",
)
TEST_DATASETS = ("Transitions_mocap", "HumanEva")


def head_features(root_orient: np.ndarray, pose_body: np.ndarray, joints: np.ndarray):
    """Global head rot/trans (+ diffs) and kinpoly head_qpos/head_vels
    (process_amass_dataset.py:455-478)."""
    local_aa = jnp.concatenate(
        [jnp.asarray(root_orient)[:, None], jnp.asarray(pose_body).reshape(-1, 21, 3)],
        axis=1,
    )
    gmat = fk_mod.local_to_global_matrix(rot.axis_angle_to_matrix(local_aa))
    head_mat = gmat[:, fk_mod.HEAD_IDX]
    head_trans = jnp.asarray(joints[:, fk_mod.HEAD_IDX])

    head_mat_diff = jnp.matmul(jnp.swapaxes(head_mat[:-1], -1, -2), head_mat[1:])
    head_quat = rot.matrix_to_quat(head_mat)
    head_qpos = jnp.concatenate([head_trans, head_quat], axis=-1)
    return {
        "head_qpos": np.asarray(head_qpos, np.float32),
        "head_vels": np.asarray(geometry.get_head_vel(head_qpos), np.float32),
        "global_head_rot_6d": np.asarray(rot.matrix_to_rot6d(head_mat), np.float32),
        "global_head_trans": np.asarray(head_trans, np.float32),
        "global_head_rot_6d_diff": np.asarray(rot.matrix_to_rot6d(head_mat_diff), np.float32),
        "global_head_trans_diff": np.asarray(head_trans[1:] - head_trans[:-1], np.float32),
    }


def process_seq(input_path: str, output_path: str, model, fps_override=None):
    """One AMASS npz -> processed npz (process_amass_dataset.py:340-492)."""
    t0 = time.time()
    bdata = np.load(input_path)
    gender = "male"  # reference forces one skeleton (:352)
    fps = float(fps_override or bdata["mocap_framerate"])
    if "BMLhandball" in input_path:
        fps = 240.0
    if "20160930_50032" in input_path or "20161014_50033" in input_path:
        fps = 59.0

    num_frames = bdata["poses"].shape[0]
    sl = slice(int(0.1 * num_frames), int(0.9 * num_frames))  # middle 80%
    trans = bdata["trans"][sl].astype(np.float32)
    root_orient = bdata["poses"][sl, :3].astype(np.float32)
    pose_body = bdata["poses"][sl, 3:66].astype(np.float32)
    pose_hand = bdata["poses"][sl, 66:].astype(np.float32)
    betas = np.zeros(NUM_BETAS, np.float32)
    num_frames = trans.shape[0]
    if num_frames < DISCARD_SHORTER_THAN * fps:
        return None

    # SMPL forward in chunks (joints only)
    n_body_joints = 22
    joints = []
    j_full = model.parents.shape[0]
    n_model_betas = model.shapedirs.shape[-1]
    for s in range(0, num_frames, SPLIT_FRAME_LIMIT):
        e = min(s + SPLIT_FRAME_LIMIT, num_frames)
        aa = np.zeros((e - s, j_full, 3), np.float32)
        aa[:, 0] = root_orient[s:e]
        aa[:, 1:22] = pose_body[s:e].reshape(-1, 21, 3)
        n_hand = min(j_full - 22, pose_hand.shape[1] // 3)
        aa[:, 22:22 + n_hand] = pose_hand[s:e, : n_hand * 3].reshape(-1, n_hand, 3)
        b = np.zeros((e - s, n_model_betas), np.float32)
        b[:, :NUM_BETAS] = betas
        j, _ = lbs(model, jnp.asarray(b), jnp.asarray(aa), jnp.asarray(trans[s:e]),
                   want_verts=False)
        joints.append(np.asarray(j[:, :n_body_joints]))
    joint_seq = np.concatenate(joints)

    floor_height, contacts, discard = geometry.determine_floor_height_and_contacts(
        joint_seq, int(fps)
    )
    trans[:, 2] -= floor_height
    joint_seq[:, :, 2] -= floor_height

    if OUT_FPS < fps:
        idx = np.linspace(0, num_frames - 1, num=int(OUT_FPS / fps * num_frames), dtype=int)
        trans, root_orient, pose_body = trans[idx], root_orient[idx], pose_body[idx]
        contacts, joint_seq = contacts[idx], joint_seq[idx]
        fps = OUT_FPS
    if discard:
        return None

    feats = head_features(root_orient, pose_body, joint_seq)
    out = dict(
        fps=fps, gender=gender, floor_height=floor_height, contacts=contacts,
        trans=trans, root_orient=root_orient, pose_body=pose_body,
        betas=betas, joints=joint_seq, **feats,
    )
    output_path = output_path[:-4] + "_%d_frames_%d_fps.npz" % (trans.shape[0], int(fps))
    np.savez(output_path, **out)
    print(f"{input_path}: {trans.shape[0]} frames in {time.time()-t0:.1f}s")
    return output_path


def aggregate(processed_root: str, out_path: str):
    """Merge processed npz tree -> single joblib pickle + train/test splits
    (prep_smpl_to_single_data + reorganize_data,
    process_amass_dataset.py:495-583)."""
    data = {}
    for subset in sorted(os.listdir(processed_root)):
        subset_path = os.path.join(processed_root, subset)
        if not os.path.isdir(subset_path):
            continue
        for dirpath, _, files in os.walk(subset_path):
            for f in sorted(files):
                if not f.endswith(".npz"):
                    continue
                d = np.load(os.path.join(dirpath, f))
                rel = os.path.relpath(dirpath, processed_root).replace(os.sep, "-")
                name = f"{rel}-{f}"
                data[name] = {
                    "root_orient": d["root_orient"], "body_pose": d["pose_body"],
                    "trans": d["trans"], "beta": d["betas"], "seq_name": name,
                    "gender": str(d["gender"]),
                    "head_qpos": d["head_qpos"], "head_vels": d["head_vels"],
                    "global_head_trans": d["global_head_trans"],
                    "global_head_rot_6d": d["global_head_rot_6d"],
                    "global_head_rot_6d_diff": d["global_head_rot_6d_diff"],
                    "global_head_trans_diff": d["global_head_trans_diff"],
                }
    joblib.dump(data, out_path)

    train = {k: v for k, v in data.items() if k.split("-")[0] in TRAIN_DATASETS}
    test = {k: v for k, v in data.items() if k.split("-")[0] in TEST_DATASETS}
    base = os.path.basename(out_path)
    joblib.dump(dict(enumerate(train.values())),
                out_path.replace(base, "train_" + base))
    joblib.dump(dict(enumerate(test.values())),
                out_path.replace(base, "test_" + base))
    print(f"aggregated {len(data)} seqs ({len(train)} train / {len(test)} test)")


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    pp = sub.add_parser("process")
    pp.add_argument("--amass_root", required=True)
    pp.add_argument("--smplh_path", required=True)
    pp.add_argument("--out", required=True)
    pa = sub.add_parser("aggregate")
    pa.add_argument("--processed_root", required=True)
    pa.add_argument("--out", required=True)
    args = p.parse_args(argv)

    if args.cmd == "process":
        model = load_smpl_npz(os.path.join(args.smplh_path, "male", "model.npz"))
        for dirpath, _, files in os.walk(args.amass_root):
            for f in sorted(files):
                if f.endswith(".npz"):
                    rel = os.path.relpath(dirpath, args.amass_root)
                    od = os.path.join(args.out, rel)
                    os.makedirs(od, exist_ok=True)
                    process_seq(os.path.join(dirpath, f), os.path.join(od, f), model)
    else:
        aggregate(args.processed_root, args.out)


if __name__ == "__main__":
    main()
