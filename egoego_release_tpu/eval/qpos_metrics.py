"""The kinpoly qpos-record metric suite, reference-exact.

Port of `compute_metrics` / `compute_physcis_metris` / the qpos-space
`compute_foot_sliding` (kinpoly/scripts/eval_metrics_imu_rec.py:123-221,
350-398) — the metric path the kinpoly baselines report.  The reference
builds a MuJoCo env at module import purely to FK qpos frames; here FK goes
through ops/mujoco_xml.qpos_fk (validated against real MuJoCo to 2e-5,
tests/test_mujoco_env.py), so the suite needs no simulator — and the whole
thing is tested against the reference's own functions running on real
MuJoCo (tests/test_reference_oracle.py::test_reference_qpos_metrics_parity).

Input format matches the reference: {take: {"qpos" (T,76), "qpos_gt" (T,76),
"head_pose_gt" (T,7)}}.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from egoego_release_tpu.ops import geometry
from egoego_release_tpu.ops import rotations as rot
from egoego_release_tpu.ops.mujoco_xml import MujocoSkeleton, qpos_fk

# qpos-space foot-sliding constants (eval_metrics_imu_rec.py:385-386)
FS_H = 0.033
FS_Z_THRESHOLD = 0.65


def norm_qpos(qpos: np.ndarray) -> np.ndarray:
    """Unit-normalize the root quaternion columns of a (T, 76) qpos record
    (kinpoly/scripts/vis_mesh_gen.py:609-613) — the record prep its stats
    driver applies to both pred and GT before `compute_metrics`."""
    out = np.asarray(qpos, np.float64).copy()
    out[:, 3:7] /= np.linalg.norm(out[:, 3:7], axis=1)[:, None]
    return out


def trans_to_velocity(root_trans: np.ndarray) -> np.ndarray:
    """Root translation (T, 3) -> per-frame velocity (T-1, 3)
    (vis_mesh_gen.py:615-618)."""
    root_trans = np.asarray(root_trans)
    return root_trans[1:] - root_trans[:-1]


def velocity_to_trans(init_root_trans: np.ndarray,
                      root_velocity: np.ndarray) -> np.ndarray:
    """Integrate per-frame root velocities back to absolute translation
    (vis_mesh_gen.py:620-633; the reference's python loop is a cumsum)."""
    init = np.asarray(init_root_trans, np.float64)
    vel = np.asarray(root_velocity, np.float64)
    return np.concatenate([init[None], init[None] + np.cumsum(vel, axis=0)])


def qvel_fd_heading(qpos: np.ndarray, dt: float) -> np.ndarray:
    """get_joint_vels (relive/utils/metrics.py:38-44): per-frame qvel with
    the linear part in the heading frame."""
    qpos = jnp.asarray(qpos, jnp.float32)
    v = (qpos[1:, :3] - qpos[:-1, :3]) / dt
    v = geometry.transform_vec(v, qpos[:-1, 3:7], "heading")
    qrel = rot.quat_multiply(qpos[1:, 3:7], rot.quat_invert(qpos[:-1, 3:7]))
    rv = rot.quat_to_axis_angle(rot.standardize_quat(qrel)) / dt
    rv = geometry.transform_vec(rv, qpos[:-1, 3:7], "root")
    joint_vel = (qpos[1:, 7:] - qpos[:-1, 7:]) / dt
    return np.asarray(jnp.concatenate([v, rv, joint_vel], axis=-1))


def qpos_foot_sliding(foot_pos: np.ndarray, qpos: np.ndarray) -> float:
    """(eval_metrics_imu_rec.py:383-398): displacement weighted by
    2 - 2^(h/H) where the foot is grounded by its first-3-frame mean height,
    counted only while low AND the root is up (no sliding charge when
    sitting/fallen)."""
    seq_len = len(qpos)
    z = qpos[1:, 2]
    foot = np.asarray(foot_pos, np.float64).copy()
    foot[:, -1] -= np.mean(foot[:3, -1])
    disp = np.linalg.norm(foot[1:, :2] - foot[:-1, :2], axis=1)
    avg_h = (foot[:-1, -1] + foot[1:, -1]) / 2
    subset = np.logical_and(avg_h < FS_H, z > FS_Z_THRESHOLD)
    stats = np.abs(disp * (2 - 2 ** (avg_h / FS_H)))[subset]
    return float(np.sum(stats) / seq_len * 1000)


def _pose_mat4(trans: np.ndarray, quat: np.ndarray) -> np.ndarray:
    mats = np.tile(np.eye(4), (trans.shape[0], 1, 1))
    mats[:, :3, :3] = np.asarray(rot.quat_to_matrix(jnp.asarray(quat, jnp.float32)))
    mats[:, :3, 3] = trans
    return mats


def _frob(x: np.ndarray, y: np.ndarray) -> float:
    err = np.matmul(x, np.linalg.inv(y))
    return float(
        np.linalg.norm(np.eye(x.shape[-1]) - err, ord="fro", axis=(1, 2)).mean()
    )


def _fk_take(skeleton: MujocoSkeleton, qpos: np.ndarray):
    quat, pos = qpos_fk(skeleton, jnp.asarray(qpos, jnp.float32))
    quat, pos = np.asarray(quat), np.asarray(pos)
    head = skeleton.body_names.index("Head")
    l_toe = skeleton.body_names.index("L_Toe")
    r_toe = skeleton.body_names.index("R_Toe")
    head_pose = np.concatenate([pos[:, head], quat[:, head]], axis=-1)
    return pos, head_pose, pos[:, l_toe], pos[:, r_toe]


def compute_metrics_for_qpos_records(
    results: dict, skeleton: MujocoSkeleton, dt: float = 1.0 / 30.0
) -> dict:
    """compute_metrics (:123-221) over {take: {qpos, qpos_gt, head_pose_gt}}
    — mean of per-take metrics."""
    agg: dict[str, list] = {}

    def add(key, val):
        agg.setdefault(key, []).append(val)

    for take, res in results.items():
        traj_pred = np.asarray(res["qpos"], np.float64)
        traj_gt = np.asarray(res["qpos_gt"], np.float64)
        head_pose_gt = np.asarray(res["head_pose_gt"], np.float64)

        vels_gt = qvel_fd_heading(traj_gt, dt)
        vels_pred = qvel_fd_heading(traj_pred, dt)
        accels_pred = np.diff(vels_pred, axis=0) / dt
        accels_gt = np.diff(vels_gt, axis=0) / dt  # noqa: F841 (ref computes, drops)

        jpos_pred, head_pose, l_toe_p, r_toe_p = _fk_take(skeleton, traj_pred)
        jpos_gt, _, l_toe_g, r_toe_g = _fk_take(skeleton, traj_gt)

        slide_pred = (qpos_foot_sliding(l_toe_p, traj_pred)
                      + qpos_foot_sliding(r_toe_p, traj_pred)) / 2
        slide_gt = (qpos_foot_sliding(l_toe_g, traj_gt)
                    + qpos_foot_sliding(r_toe_g, traj_gt)) / 2

        add("root_dist", _frob(_pose_mat4(traj_pred[:, :3], traj_pred[:, 3:7]),
                               _pose_mat4(traj_gt[:, :3], traj_gt[:, 3:7])))
        add("root_rot_dist", _frob(
            _pose_mat4(traj_pred[:, :3], traj_pred[:, 3:7])[:, :3, :3],
            _pose_mat4(traj_gt[:, :3], traj_gt[:, 3:7])[:, :3, :3]))
        add("head_dist", _frob(_pose_mat4(head_pose[:, :3], head_pose[:, 3:]),
                               _pose_mat4(head_pose_gt[:, :3], head_pose_gt[:, 3:])))
        add("head_rot_dist", _frob(
            _pose_mat4(head_pose[:, :3], head_pose[:, 3:])[:, :3, :3],
            _pose_mat4(head_pose_gt[:, :3], head_pose_gt[:, 3:])[:, :3, :3]))

        add("vel_dist", float(np.linalg.norm(vels_pred - vels_gt, axis=1).mean()))

        accel_gt_fd = jpos_gt[:-2] - 2 * jpos_gt[1:-1] + jpos_gt[2:]
        accel_pr_fd = jpos_pred[:-2] - 2 * jpos_pred[1:-1] + jpos_pred[2:]
        add("accel_dist", float(
            np.linalg.norm(accel_pr_fd - accel_gt_fd, axis=2).mean() * 1000
        ))

        jp = jpos_pred - jpos_pred[:, 0:1]
        jg = jpos_gt - jpos_gt[:, 0:1]
        per_joint = np.linalg.norm(jp - jg, axis=2)
        single_jpe = per_joint.mean(axis=0) * 1000
        add("mpjpe", float(per_joint.mean() * 1000))
        add("mpjpe_wo_hand", float(single_jpe[:18].mean()))
        add("single_jpe", single_jpe)
        for i in range(single_jpe.shape[0]):
            add(f"jpe_{i}", float(single_jpe[i]))

        add("root_trans_dist", float(
            np.linalg.norm(traj_pred[:, :3] - traj_gt[:, :3], axis=1).mean() * 1000
        ))
        add("head_trans_dist", float(
            np.linalg.norm(head_pose[:, :3] - head_pose_gt[:, :3], axis=1).mean() * 1000
        ))
        add("slide_pred", slide_pred)
        add("slide_gt", slide_gt)

    return {k: np.mean(v) for k, v in agg.items()}
