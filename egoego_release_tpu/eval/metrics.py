"""Evaluation metric suite, batched + on-device.

Ports the SMPL-tensor metric path actually used by the reference's eval
drivers (`compute_metrics_for_smpl`,
kinpoly/scripts/eval_metrics_imu_rec.py:264-342 and
compute_foot_sliding_for_smpl :222-262, compute_accel/compute_error_accel
:66-107) and the stage-1 head metrics
(egoego/eval/head_pose_metrics.py:26-43).  The reference loops over frames in
numpy with a MuJoCo env imported at module load; here everything is
vectorized jnp and needs no simulator.

All functions accept a single sequence (T leading) and are vmap-able over a
batch of sequences.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from egoego_release_tpu.ops import rotations as rot
from egoego_release_tpu.ops.fk import HEAD_IDX

Array = jax.Array


def pose_to_mat4(trans: Array, quat: Array) -> Array:
    """(..., 3) + (..., 4) -> homogeneous (..., 4, 4).
    Quaternions are normalized first (the reference's quaternion_matrix
    normalizes too)."""
    r = rot.quat_to_matrix(rot.quat_normalize(quat))
    m = jnp.zeros(trans.shape[:-1] + (4, 4), dtype=trans.dtype)
    m = m.at[..., :3, :3].set(r)
    m = m.at[..., :3, 3].set(trans)
    m = m.at[..., 3, 3].set(1.0)
    return m


def _rigid_inverse(m: Array) -> Array:
    """Closed-form inverse of homogeneous rigid transforms (..., 4, 4)."""
    r = m[..., :3, :3]
    t = m[..., :3, 3]
    rt = jnp.swapaxes(r, -1, -2)
    inv = jnp.zeros_like(m)
    inv = inv.at[..., :3, :3].set(rt)
    inv = inv.at[..., :3, 3].set(-jnp.einsum("...ij,...j->...i", rt, t))
    inv = inv.at[..., 3, 3].set(1.0)
    return inv


def frobenius_norm_4x4(x: Array, y: Array) -> Array:
    """mean_t ||I - x_t y_t^{-1}||_F over (T, 4, 4) pairs
    (kinpoly/relive/utils/metrics.py:64-72)."""
    err = jnp.eye(4, dtype=x.dtype) - jnp.matmul(x, _rigid_inverse(y))
    return jnp.sqrt(jnp.sum(err * err, axis=(-2, -1))).mean()


def frobenius_norm_rot(x: Array, y: Array) -> Array:
    """mean_t ||I - Rx Ry^T||_F over (T, 3, 3)."""
    err = jnp.eye(3, dtype=x.dtype) - jnp.matmul(x, jnp.swapaxes(y, -1, -2))
    return jnp.sqrt(jnp.sum(err * err, axis=(-2, -1))).mean()


def compute_accel(joints: Array) -> Array:
    """mean_t mean_j ||j_{t+2} - 2 j_{t+1} + j_t|| (T, J, 3) -> scalar."""
    accel = joints[2:] - 2 * joints[1:-1] + joints[:-2]
    return jnp.linalg.norm(accel, axis=-1).mean()


def compute_error_accel(joints_gt: Array, joints_pred: Array) -> Array:
    a_gt = joints_gt[:-2] - 2 * joints_gt[1:-1] + joints_gt[2:]
    a_pr = joints_pred[:-2] - 2 * joints_pred[1:-1] + joints_pred[2:]
    return jnp.linalg.norm(a_pr - a_gt, axis=-1).mean()


def compute_foot_sliding(global_jpos: Array, floor_height: Array) -> Array:
    """Displacement-weighted foot sliding, mm
    (eval_metrics_imu_rec.py:222-262).  global_jpos: (T, 22, 3)."""
    seq_len = global_jpos.shape[0]
    jpos = global_jpos.at[:, :, 2].add(-floor_height)

    def one_joint(pos, thresh):
        disp = jnp.linalg.norm(pos[1:, :2] - pos[:-1, :2], axis=-1)
        h = pos[:-1, 2]
        stat = jnp.abs(disp * (2.0 - 2.0 ** (h / thresh)))
        return jnp.sum(jnp.where(h < thresh, stat, 0.0)) / seq_len * 1000.0

    lankle = one_joint(jpos[:, 7], 0.08)
    rankle = one_joint(jpos[:, 8], 0.08)
    ltoe = one_joint(jpos[:, 10], 0.04)
    rtoe = one_joint(jpos[:, 11], 0.04)
    return (lankle + ltoe + rankle + rtoe) / 4.0


def compute_metrics_for_smpl(
    gt_global_quat: Array,    # (T, 22, 4)
    gt_global_jpos: Array,    # (T, 22, 3)
    gt_floor_height: Array,   # scalar
    pred_global_quat: Array,
    pred_global_jpos: Array,
    pred_floor_height: Array,
) -> dict[str, Array]:
    """Full metric dict, one sequence (eval_metrics_imu_rec.py:264-342)."""
    root_mat_pred = pose_to_mat4(pred_global_jpos[:, 0], pred_global_quat[:, 0])
    root_mat_gt = pose_to_mat4(gt_global_jpos[:, 0], gt_global_quat[:, 0])
    head_mat_pred = pose_to_mat4(pred_global_jpos[:, HEAD_IDX], pred_global_quat[:, HEAD_IDX])
    head_mat_gt = pose_to_mat4(gt_global_jpos[:, HEAD_IDX], gt_global_quat[:, HEAD_IDX])

    jpos_pred = pred_global_jpos - pred_global_jpos[:, 0:1]
    jpos_gt = gt_global_jpos - gt_global_jpos[:, 0:1]
    per_joint = jnp.linalg.norm(jpos_pred - jpos_gt, axis=-1)  # (T, 22)
    single_jpe = per_joint.mean(axis=0) * 1000.0

    res = {
        "root_dist": frobenius_norm_4x4(root_mat_pred, root_mat_gt),
        "root_rot_dist": frobenius_norm_rot(root_mat_pred[:, :3, :3], root_mat_gt[:, :3, :3]),
        "root_trans_dist": jnp.linalg.norm(
            pred_global_jpos[:, 0] - gt_global_jpos[:, 0], axis=-1
        ).mean() * 1000.0,
        "head_dist": frobenius_norm_4x4(head_mat_pred, head_mat_gt),
        "head_rot_dist": frobenius_norm_rot(head_mat_pred[:, :3, :3], head_mat_gt[:, :3, :3]),
        "head_trans_dist": jnp.linalg.norm(
            pred_global_jpos[:, HEAD_IDX] - gt_global_jpos[:, HEAD_IDX], axis=-1
        ).mean() * 1000.0,
        "mpjpe": per_joint.mean() * 1000.0,
        "mpjpe_wo_hand": single_jpe[:18].mean(),
        "single_jpe": single_jpe,
        "accel_pred": compute_accel(pred_global_jpos) * 1000.0,
        "accel_gt": compute_accel(gt_global_jpos) * 1000.0,
        "accel_err": compute_error_accel(pred_global_jpos, gt_global_jpos) * 1000.0,
        "pred_fs": compute_foot_sliding(pred_global_jpos, pred_floor_height),
        "gt_fs": compute_foot_sliding(gt_global_jpos, gt_floor_height),
    }
    # per-joint jpe_<i> keys exactly as the reference emits them
    # (eval_metrics_imu_rec.py:301-303); single_jpe keeps the array form
    for i in range(single_jpe.shape[0]):
        res[f"jpe_{i}"] = single_jpe[i]
    return res


def compute_head_pose_metrics(
    head_trans: Array, head_rot: Array, gt_head_trans: Array, gt_head_rot: Array
):
    """Stage-1 head metrics (egoego/eval/head_pose_metrics.py:26-43).
    head_trans: (T, 3); head_rot: (T, 3, 3)."""
    pred_mat = jnp.zeros((head_trans.shape[0], 4, 4), head_trans.dtype)
    pred_mat = pred_mat.at[:, :3, :3].set(head_rot)
    pred_mat = pred_mat.at[:, :3, 3].set(head_trans)
    pred_mat = pred_mat.at[:, 3, 3].set(1.0)
    gt_mat = jnp.zeros_like(pred_mat)
    gt_mat = gt_mat.at[:, :3, :3].set(gt_head_rot)
    gt_mat = gt_mat.at[:, :3, 3].set(gt_head_trans)
    gt_mat = gt_mat.at[:, 3, 3].set(1.0)

    head_dist = frobenius_norm_4x4(pred_mat, gt_mat)
    head_rot_dist = frobenius_norm_rot(head_rot, gt_head_rot)
    head_trans_err = jnp.linalg.norm(head_trans - gt_head_trans, axis=-1).mean() * 1000.0
    return head_dist, head_rot_dist, head_trans_err


def compute_metrics_for_qpos(
    gt_qpos: Array,       # (T, 76) kinpoly expert qpos
    pred_qpos: Array,     # (T, 76)
    rest_offsets: Array,  # (22, 3)
    gt_floor_height: Array | float = 0.0,
    pred_floor_height: Array | float = 0.0,
) -> dict[str, Array]:
    """Metric suite over kinpoly qpos records.

    The reference's qpos metric path (`compute_metrics`,
    kinpoly/scripts/eval_metrics_imu_rec.py:123-221) FKs qpos through a
    MuJoCo env built at module import; here the records go through the
    closed-form qpos codec + JAX FK and the same tensor metric suite — no
    simulator.
    """
    from egoego_release_tpu.ops import geometry

    def fk(qpos):
        trans, aa24 = geometry.qpos_to_smpl(qpos)
        from egoego_release_tpu.ops import fk as fk_mod

        return fk_mod.fk_smpl(trans, aa24[:, :22], rest_offsets)

    gt_q, gt_p = fk(gt_qpos)
    pr_q, pr_p = fk(pred_qpos)
    return compute_metrics_for_smpl(
        gt_q, gt_p, jnp.float32(gt_floor_height),
        pr_q, pr_p, jnp.float32(pred_floor_height),
    )


batched_metrics_for_smpl = jax.vmap(compute_metrics_for_smpl)
