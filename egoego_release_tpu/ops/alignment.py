"""Trajectory alignment (Umeyama) and SLAM-trajectory preparation.

Replaces the reference's dependency on the `evo` package
(egoego/model/head_normal_estimation_transformer.py:15-16,169-212 and
egoego/data/ares_headpose_dataset.py) with a pure-JAX Umeyama solve, and
ports the first-frame SLAM alignment (ares_headpose_dataset.py:122-147) and
the floor-normal -> gravity rotation
(head_normal_estimation_transformer.py:47-61).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from egoego_release_tpu.ops import rotations as rot

Array = jax.Array


def umeyama(src: Array, dst: Array, with_scale: bool = True):
    """Least-squares similarity transform: dst ~= s * R @ src + t.

    src, dst: (N, 3) point sets. Returns (R (3,3), t (3,), s scalar).
    Same solution as evo's umeyama_alignment (Umeyama 1991), including the
    reflection (det) correction.
    """
    mu_src = jnp.mean(src, axis=0)
    mu_dst = jnp.mean(dst, axis=0)
    sc = src - mu_src
    dc = dst - mu_dst
    n = src.shape[0]
    cov = (dc.T @ sc) / n  # (3, 3)
    var_src = jnp.mean(jnp.sum(sc * sc, axis=-1))

    u, d, vt = jnp.linalg.svd(cov)
    s_mat = jnp.eye(3, dtype=src.dtype)
    det_sign = jnp.sign(jnp.linalg.det(u) * jnp.linalg.det(vt))
    s_mat = s_mat.at[2, 2].set(det_sign)

    r = u @ s_mat @ vt
    scale = jnp.where(
        with_scale, jnp.trace(jnp.diag(d) @ s_mat) / jnp.maximum(var_src, 1e-12), 1.0
    ).astype(src.dtype)
    t = mu_dst - scale * (r @ mu_src)
    return r, t, scale


def align_xy_plane_traj(traj_est: Array, traj_ref: Array):
    """xy-plane trajectory alignment with scale.

    traj_est, traj_ref: (T, 7) = trans(3) + quat wxyz(4).  Both z coordinates
    are pinned to 1 before the Umeyama solve (reference behavior —
    head_normal_estimation_transformer.py:169-212), so the fit is effectively
    a rotation about z plus in-plane translation/scale.

    Returns (R (3,3), aligned_est_positions (T,3), ref_positions (T,3)).
    """
    est_pos = traj_est[:, :3].at[:, 2].set(1.0)
    ref_pos = traj_ref[:, :3].at[:, 2].set(1.0)
    r, t, s = umeyama(est_pos, ref_pos, with_scale=True)
    aligned = s * (est_pos @ r.T) + t
    return r, aligned, ref_pos


def align_slam_to_first_frame(slam_trans: Array, slam_quat: Array, gt_head_pose0: Array):
    """Rotate+translate a SLAM trajectory so its first frame matches GT.

    slam_trans: (T, 3); slam_quat: (T, 4) wxyz; gt_head_pose0: (7,) first GT
    head pose (trans + quat wxyz).  Mirrors
    ares_headpose_dataset.py:122-147 (load_slam_res_and_align_first).

    Returns (aligned_trans (T,3), aligned_rot_mat (T,3,3), aligned_quat (T,4)).
    """
    slam_rot_mat = rot.quat_to_matrix(slam_quat)  # (T, 3, 3)
    gt_rot0 = rot.quat_to_matrix(gt_head_pose0[3:])
    pred2gt = gt_rot0 @ slam_rot_mat[0].T  # (3, 3)

    aligned_mat = jnp.einsum("ij,tjk->tik", pred2gt, slam_rot_mat)
    aligned_quat = rot.matrix_to_quat(aligned_mat)
    aligned_trans = jnp.einsum("ij,tj->ti", pred2gt, slam_trans)
    aligned_trans = aligned_trans + (gt_head_pose0[:3] - aligned_trans[0])
    return aligned_trans, aligned_mat, aligned_quat


def align_slam_to_first_frame_np(slam_trans, slam_quat, gt_head_pose0):
    """Numpy twin of align_slam_to_first_frame for dataset constructors.

    The headpose loaders align every sequence at load time; doing that with
    JAX ops costs one tunnel round trip per sequence (~0.1-1 s each through
    axon — CLAUDE.md), so dataset load over N sequences was O(N) round
    trips.  Same math, same quaternion conventions (Shepperd's pivot)."""
    import numpy as np

    slam_trans = np.asarray(slam_trans, np.float32)
    gt_head_pose0 = np.asarray(gt_head_pose0, np.float32)
    slam_rot_mat = rot.quat_to_matrix_np(slam_quat)
    gt_rot0 = rot.quat_to_matrix_np(gt_head_pose0[3:])
    pred2gt = gt_rot0 @ slam_rot_mat[0].T

    aligned_mat = np.einsum("ij,tjk->tik", pred2gt, slam_rot_mat)
    aligned_quat = rot.matrix_to_quat_np(aligned_mat)
    aligned_trans = np.einsum("ij,tj->ti", pred2gt, slam_trans)
    aligned_trans = aligned_trans + (gt_head_pose0[:3] - aligned_trans[0])
    return (
        aligned_trans.astype(np.float32),
        aligned_mat.astype(np.float32),
        aligned_quat.astype(np.float32),
    )


def rotation_matrix_from_two_vectors(vec1: Array, vec2: Array) -> Array:
    """Rotation matrix aligning vec1 to vec2 (Rodrigues form).

    Port of head_normal_estimation_transformer.py:47-56.
    """
    a = vec1 / jnp.maximum(jnp.linalg.norm(vec1), 1e-12)
    b = vec2 / jnp.maximum(jnp.linalg.norm(vec2), 1e-12)
    v = jnp.cross(a, b)
    c = jnp.dot(a, b)
    s2 = jnp.maximum(jnp.sum(v * v), 1e-20)
    kmat = jnp.asarray(
        [[0.0, -v[2], v[1]], [v[2], 0.0, -v[0]], [-v[1], v[0], 0.0]], dtype=vec1.dtype
    )
    return jnp.eye(3, dtype=vec1.dtype) + kmat + (kmat @ kmat) * ((1.0 - c) / s2)


def rotation_from_floor_normal(pred_floor_normal: Array) -> Array:
    """Gravity-align rotation from a predicted floor normal to +z.

    Port of cal_rotation_from_floor_normal
    (head_normal_estimation_transformer.py:58-61).
    """
    up = jnp.asarray([0.0, 0.0, 1.0], dtype=pred_floor_normal.dtype)
    return rotation_matrix_from_two_vectors(pred_floor_normal, up)
