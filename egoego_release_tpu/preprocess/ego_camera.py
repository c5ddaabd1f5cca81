"""Egocentric camera poses for ARES-style synthesis (Habitat-compatible).

Port of the computational core of
utils/habitat_utils/save_obs_replica_from_motion_seq.py:190-252 — everything
except the habitat-sim render call (an external C++ binary, exactly like
Blender/DROID-SLAM in this framework's host-tool policy):

  1. head orientation = global rotation of SMPL joint 15 from the motion's
     local rotation matrices (`batch_rigid_transform` -> A[:, 15]; here
     ops/fk.local_to_global_matrix)
  2. camera frame = head frame with the 1st and 3rd COLUMNS negated (:239-242
     — the camera looks along -z with +y up in its own frame)
  3. world conversion z-up (SMPL/mp3d) -> y-up (habitat):
     quat_from_two_vectors([0,0,-1], GRAVITY=[0,-1,0]) == Rx(-90deg) (:221-222)
  4. agent pose per frame = (R_mh @ head_cam_pos, R_mh @ camera_rot) (:244-249)

The CLI walks the reference's per-motion layout (`<root>/<motion>/
motion_seq.npz` with root_orient (T,3,3)|(T,3), pose_body (T,21,3,3),
joints (T,22,3), head_cam_v_pos (T,3)) and writes `camera_poses.npz` with
positions (T,3), quats_wxyz (T,4), mats4 (T,4,4) — consumable by habitat-sim
(via mn.Quaternion) or any other renderer.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax.numpy as jnp

from egoego_release_tpu.ops import fk as fk_mod
from egoego_release_tpu.ops import rotations as rot

# z-up (SMPL / mp3d) -> y-up (habitat): Rx(-90 deg); maps -z to habitat
# GRAVITY (0,-1,0) like quat_from_two_vectors([0,0,-1], GRAVITY)
MP3D_TO_HABITAT = np.array(
    [[1.0, 0.0, 0.0],
     [0.0, 0.0, 1.0],
     [0.0, -1.0, 0.0]]
)


def head_orientation(root_orient: np.ndarray, pose_body: np.ndarray) -> np.ndarray:
    """Global head-joint (15) rotations (T, 3, 3) from per-joint local
    rotation matrices: root (T,3,3) or axis-angle (T,3); body (T,21,3,3) or
    (T,21,3)."""
    root = np.asarray(root_orient)
    if root.ndim == 2:  # axis-angle
        root = np.asarray(rot.axis_angle_to_matrix(jnp.asarray(root)))
    body = np.asarray(pose_body)
    if body.ndim == 3:  # (T, 21, 3) axis-angle
        body = np.asarray(rot.axis_angle_to_matrix(jnp.asarray(body)))
    local = np.concatenate([root[:, None], body], axis=1)  # (T, 22, 3, 3)
    glob = np.asarray(fk_mod.local_to_global_matrix(jnp.asarray(local)))
    return glob[:, fk_mod.HEAD_IDX]


def camera_rotation_from_head(head_rot: np.ndarray) -> np.ndarray:
    """Negate the 1st and 3rd columns (:239-242): camera -z forward, +y up."""
    return np.stack(
        [-head_rot[..., :, 0], head_rot[..., :, 1], -head_rot[..., :, 2]],
        axis=-1,
    )


def camera_poses_from_motion(
    root_orient: np.ndarray,
    pose_body: np.ndarray,
    head_cam_pos: np.ndarray,        # (T, 3) z-up head-camera positions
) -> dict:
    """-> dict(positions (T,3) y-up, quats_wxyz (T,4), mats4 (T,4,4))."""
    head_rot = head_orientation(root_orient, pose_body)
    cam_rot = camera_rotation_from_head(head_rot)
    pos_hab = head_cam_pos @ MP3D_TO_HABITAT.T
    rot_hab = np.einsum("ij,tjk->tik", MP3D_TO_HABITAT, cam_rot)
    quats = np.asarray(rot.matrix_to_quat(jnp.asarray(rot_hab)))
    mats4 = np.tile(np.eye(4), (len(pos_hab), 1, 1))
    mats4[:, :3, :3] = rot_hab
    mats4[:, :3, 3] = pos_hab
    return {
        "positions": pos_hab.astype(np.float32),
        "quats_wxyz": quats.astype(np.float32),
        "mats4": mats4.astype(np.float32),
    }


def process_motion_dir(motion_dir: str, overwrite: bool = False) -> bool:
    out_path = os.path.join(motion_dir, "camera_poses.npz")
    if os.path.exists(out_path) and not overwrite:
        return False
    seq_path = os.path.join(motion_dir, "motion_seq.npz")
    if not os.path.exists(seq_path):
        return False
    seq = np.load(seq_path)
    head_pos = (
        seq["head_cam_v_pos"] if "head_cam_v_pos" in seq
        else seq["joints"][:, fk_mod.HEAD_IDX]     # fallback: head joint
    )
    poses = camera_poses_from_motion(seq["root_orient"], seq["pose_body"], head_pos)
    np.savez(out_path, **poses)
    return True


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data_dir", required=True,
                    help="root of <motion>/motion_seq.npz dirs (:156)")
    ap.add_argument("--overwrite", action="store_true")
    args = ap.parse_args(argv)
    n = 0
    for name in sorted(os.listdir(args.data_dir)):
        d = os.path.join(args.data_dir, name)
        if os.path.isdir(d) and process_motion_dir(d, args.overwrite):
            n += 1
    print(f"wrote camera_poses.npz for {n} motions")


if __name__ == "__main__":
    main()
