"""Kinpoly-format expert record construction (qpos conversion CLI).

Port of utils/data_utils/convert_amass_to_qpos.py (+ the shared
post_process_expert features from
kinpoly/relive/data_process/convert_amass_ego_syn_to_qpos.py:152-...):
SMPL motion -> MuJoCo-layout qpos (76) / qvel (75) plus head-pose features
and object-relative poses, emitted as a mocap_annotations.p-style pickle.

The reference derives qpos through a MuJoCo env (smpl_to_qpose +
env-side FK); here the codec is the closed-form ZYX euler conversion
(ops/geometry.py) and the head pose comes from the batched JAX FK — no
simulator in the loop.
"""

from __future__ import annotations

import argparse

import joblib
import numpy as np
import jax.numpy as jnp

from egoego_release_tpu.data.formats import load_motion_dict
from egoego_release_tpu.ops import fk as fk_mod
from egoego_release_tpu.ops import geometry
from egoego_release_tpu.ops import rotations as rot


def get_qvel_fd(qpos: jnp.ndarray, dt: float = 1.0 / 30.0) -> jnp.ndarray:
    """Finite-difference qvel (T-1, 75): linear vel (world), root angular vel
    in the root frame with (-pi, pi] wrapping, joint-angle rates
    (kinpoly/relive/utils/torch_utils.py:284-302), vectorized."""
    v = (qpos[1:, :3] - qpos[:-1, :3]) / dt
    qrel = rot.quat_multiply(qpos[1:, 3:7], rot.quat_invert(qpos[:-1, 3:7]))
    rv = rot.quat_to_axis_angle(rot.standardize_quat(qrel)) / dt
    rv = geometry.transform_vec(rv, qpos[:-1, 3:7], "root")
    joint_vel = (qpos[1:, 7:] - qpos[:-1, 7:]) / dt
    return jnp.concatenate([v, rv, joint_vel], axis=-1)


def motion_to_expert(
    trans: np.ndarray,        # (T, 3)
    pose_aa22: np.ndarray,    # (T, 22, 3) SMPL-order local axis-angle
    rest_offsets,             # (22, 3)
    obj_pose: np.ndarray | None = None,  # (T, 7) object pose; identity default
    dt: float = 1.0 / 30.0,
) -> dict:
    """One sequence -> kinpoly expert record {qpos, qvel, head_pose,
    head_vels, obj_pose, obj_head_relative_poses}."""
    t = trans.shape[0]
    # pad to 24 joints with zero hand rotations (SMPL order) for the codec
    aa24 = np.zeros((t, 24, 3), np.float32)
    aa24[:, :22] = pose_aa22
    qpos = geometry.smpl_to_qpos(jnp.asarray(trans.astype(np.float32)), jnp.asarray(aa24))
    qvel = get_qvel_fd(qpos, dt)

    gq, gp = fk_mod.fk_smpl(
        jnp.asarray(trans.astype(np.float32)),
        jnp.asarray(pose_aa22.astype(np.float32)),
        jnp.asarray(rest_offsets),
    )
    head_pose = jnp.concatenate(
        [gp[:, fk_mod.HEAD_IDX], gq[:, fk_mod.HEAD_IDX]], axis=-1
    )
    head_vels = geometry.get_head_vel(head_pose, dt)

    if obj_pose is None:
        obj_pose = np.tile(
            np.asarray([0, 0, 0, 1, 0, 0, 0], np.float32), (t, 1)
        )
    obj_rel = geometry.get_obj_relative_pose(
        jnp.asarray(obj_pose.astype(np.float32)), head_pose, num_objs=obj_pose.shape[1] // 7
    )
    return {
        "qpos": np.asarray(qpos, np.float32),
        "qvel": np.asarray(qvel, np.float32),
        "head_pose": np.asarray(head_pose, np.float32),
        "head_vels": np.asarray(head_vels, np.float32),
        "obj_pose": np.asarray(obj_pose, np.float32),
        "obj_head_relative_poses": np.asarray(obj_rel, np.float32),
    }


def convert_motion_pickle(motion_path: str, out_path: str, rest_offsets) -> dict:
    """Reference-format motion pickle -> mocap_annotations.p-style pickle
    keyed by seq_name (convert_amass_to_qpos.py output schema)."""
    data = load_motion_dict(motion_path)
    out = {}
    for k in data:
        rec = data[k]
        pose_aa = np.concatenate(
            [np.asarray(rec["root_orient"], np.float32)[:, None],
             np.asarray(rec["body_pose"], np.float32).reshape(-1, 21, 3)], axis=1
        )
        expert = motion_to_expert(np.asarray(rec["trans"], np.float32), pose_aa, rest_offsets)
        expert["seq_name"] = rec.get("seq_name", str(k))
        out[expert["seq_name"]] = expert
    joblib.dump(out, out_path)
    print(f"wrote {len(out)} expert records -> {out_path}")
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--motion_path", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--smplh_path", default=None)
    p.add_argument("--rest_offsets", default=None)
    args = p.parse_args(argv)

    from egoego_release_tpu.eval.build import load_rest_offsets

    rest = load_rest_offsets(args.smplh_path, args.rest_offsets)
    convert_motion_pickle(args.motion_path, args.out, rest)


if __name__ == "__main__":
    main()
