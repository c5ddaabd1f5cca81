"""ARES / GIMO dataset processing CLI.

Port of utils/data_utils/process_ares_dataset.py (and the GIMO analog,
utils/gimo_utils/process_gimo_data.py): walks a root of rendered sequences
({scene}/{seq}/ with `raft_flows/*.npy` + `ori_motion_seq.npz`), runs the
SMPL forward for joints, fits the floor, builds head-pose features, and
emits the motion pickle the head-pose datasets consume (incl. of_files
paths), plus train/test scene splits.

The SMPL forward is the batched JAX LBS; head features reuse
preprocess/amass.head_features.

GIMO input contract (replacing the reference's dataset-creation tooling,
utils/gimo_utils/extract_pose_params.py + segment_seq_images.py, which are
out of scope — they fit VPoser to raw GIMO captures and segment the ego
video): this CLI expects each GIMO sequence already expressed in the same
`ori_motion_seq.npz` schema the rendered ARES sequences use — SMPL params
(root_orient (T,3), body_pose (T,63), trans (T,3), beta, gender) at 30 fps
plus `raft_flows/*.npy` per-frame flow — i.e. the OUTPUT of the reference's
VPoser fitting step, not its raw inputs.
"""

from __future__ import annotations

import argparse
import os

import joblib
import numpy as np
import jax.numpy as jnp

from egoego_release_tpu.ops import geometry
from egoego_release_tpu.ops.smpl import lbs, load_smpl_npz
from egoego_release_tpu.preprocess.amass import SPLIT_FRAME_LIMIT, head_features

ARES_TEST_SCENES = ("office_0", "hotel_0", "room_2", "frl_apartment_4", "apartment_0")


def extract_motion_for_renders(amass_processed_root: str, render_root: str,
                               index_pkl_path: str) -> int:
    """Attach the source AMASS motion window to each rendered sequence
    folder as ori_motion_seq.npz (extract_amass_motion_for_ares.py:24-55):
    the index pickle maps each rendered seq to its processed-AMASS npz path
    plus a [start_frame_idx, start+num_frames) window.  Per-frame arrays are
    sliced; scalars (fps/gender/betas/floor_height) pass through."""
    import pickle

    with open(index_pkl_path, "rb") as f:
        index = pickle.load(f)

    written = 0
    for entry in index.values():
        src = np.load(os.path.join(amass_processed_root, entry["path"]),
                      allow_pickle=True)
        s = int(entry["start_frame_idx"])
        e = s + int(entry["num_frames"])
        n_total = src["trans"].shape[0]
        out = {}
        for key in src.files:
            arr = src[key]
            if arr.ndim >= 1 and arr.shape[0] == n_total:
                out[key] = arr[s:e]
            else:
                out[key] = arr
        seq_folder = os.path.join(render_root, entry["scene_name"], entry["seq_name"])
        os.makedirs(seq_folder, exist_ok=True)
        np.savez(os.path.join(seq_folder, "ori_motion_seq.npz"), **out)
        written += 1
    print(f"extracted motion for {written} rendered sequences")
    return written


def process_rendered_seq(seq_folder: str, model, fps: int = 30) -> dict | None:
    """One rendered sequence folder -> motion record with of_files."""
    flow_folder = os.path.join(seq_folder, "raft_flows")
    motion_path = os.path.join(seq_folder, "ori_motion_seq.npz")
    if not (os.path.isdir(flow_folder) and os.path.exists(motion_path)):
        return None
    of_files = sorted(
        os.path.join(flow_folder, f)
        for f in os.listdir(flow_folder)
        if f.endswith(".npy")
    )

    d = np.load(motion_path)
    root_orient = np.asarray(d["root_orient"], np.float32)
    pose_body = np.asarray(d["pose_body"], np.float32)
    trans = np.array(d["trans"], np.float32)
    betas = np.asarray(d["betas"], np.float32)
    gender = str(d["gender"]) if "gender" in d else "male"
    t = root_orient.shape[0]

    j_full = model.parents.shape[0]
    n_model_betas = model.shapedirs.shape[-1]
    joints = []
    for s in range(0, t, SPLIT_FRAME_LIMIT):
        e = min(s + SPLIT_FRAME_LIMIT, t)
        aa = np.zeros((e - s, j_full, 3), np.float32)
        aa[:, 0] = root_orient[s:e]
        aa[:, 1:22] = pose_body[s:e].reshape(-1, 21, 3)
        b = np.zeros((e - s, n_model_betas), np.float32)
        b[:, : min(betas.shape[0], n_model_betas)] = betas[:n_model_betas]
        j, _ = lbs(model, jnp.asarray(b), jnp.asarray(aa), jnp.asarray(trans[s:e]),
                   want_verts=False)
        joints.append(np.asarray(j[:, :22]))
    joint_seq = np.concatenate(joints)

    floor_height, _, _ = geometry.determine_floor_height_and_contacts(joint_seq, fps)
    trans[:, 2] -= floor_height
    joint_seq[:, :, 2] -= floor_height

    feats = head_features(root_orient, pose_body, joint_seq)
    return {
        "root_orient": root_orient, "body_pose": pose_body, "trans": trans,
        "beta": betas, "gender": gender, "of_files": of_files, **feats,
    }


def process_root(rendered_root: str, smplh_path: str, out_folder: str,
                 dataset: str = "ares"):
    model = load_smpl_npz(os.path.join(smplh_path, "male", "model.npz"))
    os.makedirs(out_folder, exist_ok=True)
    data = {}
    for scene in sorted(os.listdir(rendered_root)):
        scene_path = os.path.join(rendered_root, scene)
        if not os.path.isdir(scene_path):
            continue
        for seq in sorted(os.listdir(scene_path)):
            rec = process_rendered_seq(os.path.join(scene_path, seq), model)
            if rec is None:
                continue
            name = f"{scene}-{seq}"
            rec["seq_name"] = name
            data[name] = rec
            print(f"{name}: {rec['trans'].shape[0]} frames")

    out_path = os.path.join(out_folder, f"{dataset}_smplh_motion.p")
    joblib.dump(data, out_path)

    test_scenes = ARES_TEST_SCENES if dataset == "ares" else ()
    train = {k: v for k, v in data.items() if k.split("-")[0] not in test_scenes}
    test = {k: v for k, v in data.items() if k.split("-")[0] in test_scenes}
    joblib.dump(dict(enumerate(train.values())),
                os.path.join(out_folder, f"train_{dataset}_smplh_motion.p"))
    joblib.dump(dict(enumerate(test.values())),
                os.path.join(out_folder, f"test_{dataset}_smplh_motion.p"))
    print(f"{dataset}: {len(data)} seqs ({len(train)} train / {len(test)} test)")
    return out_path


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd")
    pp = sub.add_parser("process", help="rendered seqs -> motion pickle")
    pp.add_argument("--rendered_root", required=True)
    pp.add_argument("--smplh_path", required=True)
    pp.add_argument("--out", required=True)
    pp.add_argument("--dataset", choices=["ares", "gimo"], default="ares")
    pe = sub.add_parser(
        "extract",
        help="attach AMASS motion windows to rendered seq folders "
             "(extract_amass_motion_for_ares.py)",
    )
    pe.add_argument("--amass_processed_root", required=True)
    pe.add_argument("--rendered_root", required=True)
    pe.add_argument("--index_pkl", required=True)
    # back-compat: no subcommand = process (the original flag surface).
    # Decide BEFORE parsing: with subparsers, parse_known_args would match
    # the first flag VALUE against the subcommand choices and exit(2).
    import sys

    argv = list(argv) if argv is not None else sys.argv[1:]
    if argv and argv[0] not in ("process", "extract", "-h", "--help"):
        argv = ["process"] + argv
    args = p.parse_args(argv)
    if args.cmd is None:
        p.error("a subcommand (process/extract) or the process flags are required")
    if args.cmd == "process":
        process_root(args.rendered_root, args.smplh_path, args.out, args.dataset)
    else:
        extract_motion_for_renders(
            args.amass_processed_root, args.rendered_root, args.index_pkl
        )


if __name__ == "__main__":
    main()
