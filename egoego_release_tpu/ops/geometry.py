"""Geometry feature extraction: heading-frame velocities, qpos codecs, and
floor-height estimation.

Ports:
  * get_head_vel                  <- kinpoly/relive/data_process/convert_amass_ego_syn_to_qpos.py:46-72
  * get_obj_relative_pose         <- same file :126-151
  * transform_vec semantics       <- kinpoly/relive/utils/torch_utils.py:255 (numpy variant)
  * qpos <-> SMPL codec           <- utils/data_utils/process_kinpoly_qpos2smpl.py:57-93
  * determine_floor_height_and_contacts
                                  <- utils/data_utils/process_amass_dataset.py:160-338

The per-frame python loops of the reference become batched jnp; floor-height
clustering stays host-side numpy (per-sequence scalar work on ~100 points —
not worth a device round trip) with DBSCAN semantics.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from egoego_release_tpu.ops import heading as heading_mod
from egoego_release_tpu.ops import rotations as rot

Array = jax.Array

# thresholds from process_kinpoly_qpos2smpl.py:42-52 / process_amass_dataset.py
FLOOR_VEL_THRESH = 0.005
FLOOR_HEIGHT_OFFSET = 0.01
# terrain-discard heuristic (process_amass_dataset.py:58-61)
TERRAIN_HEIGHT_THRESH = 0.04
ROOT_HEIGHT_THRESH = 0.04
CLUSTER_SIZE_THRESH = 0.25
CONTACT_VEL_THRESH = 0.005
CONTACT_TOE_HEIGHT_THRESH = 0.04
CONTACT_ANKLE_HEIGHT_THRESH = 0.08

# MuJoCo humanoid joint ordering -> SMPL ordering (process_kinpoly_qpos2smpl.py:64)
MUJOCO2SMPL_JOINT_IDX = np.asarray(
    [0, 1, 5, 9, 2, 6, 10, 3, 7, 11, 4, 8, 12, 14, 19, 13, 15, 20, 16, 21, 17, 22, 18, 23]
)


# ---------------------------------------------------------------------------
# heading-frame velocities
# ---------------------------------------------------------------------------

def transform_vec(v: Array, q: Array, mode: str = "heading") -> Array:
    """Express vectors v in the (heading-stripped or full) body frame of q.

    mode='heading': rotate by inverse of the heading quat;
    mode='root':    rotate by inverse of q itself.
    v: (..., 3); q: (..., 4) wxyz.
    """
    if mode == "heading":
        frame_q = heading_mod.get_heading_quat(q)
    elif mode == "root":
        frame_q = q
    else:
        raise ValueError(mode)
    return rot.quat_apply(rot.quat_invert(frame_q), v)


def get_head_vel(head_pose: Array, dt: float = 1.0 / 30.0) -> Array:
    """Finite-difference head velocity in local frames, (T, 7) -> (T, 6):
    linear velocity in the heading frame, angular velocity in the root frame,
    last frame duplicated (get_head_vel, convert_amass_ego_syn_to_qpos.py:46-72).
    """
    trans = head_pose[:, :3]
    quat = head_pose[:, 3:7]

    v = (trans[1:] - trans[:-1]) / dt
    v_local = transform_vec(v, quat[:-1], "heading")

    qrel = rot.quat_multiply(quat[1:], rot.quat_invert(quat[:-1]))
    # standardize (w >= 0) so the rotation vector is wrapped to (-pi, pi],
    # matching the reference's explicit angle wrapping (:59-63)
    aa = rot.quat_to_axis_angle(rot.standardize_quat(qrel))
    rv = aa / dt
    rv_local = transform_vec(rv, quat[:-1], "root")

    vels = jnp.concatenate([v_local, rv_local], axis=-1)  # (T-1, 6)
    return jnp.concatenate([vels, vels[-1:]], axis=0)


def get_obj_relative_pose(obj_poses: Array, ref_poses: Array, num_objs: int = 1) -> Array:
    """Object pose relative to a reference (head) pose, heading frame
    (convert_amass_ego_syn_to_qpos.py:126-151).
    obj_poses: (T, num_objs*7); ref_poses: (T, 7).  Returns (T, num_objs*7)."""
    ref_pos = ref_poses[:, :3]
    ref_rot = ref_poses[:, 3:7]
    q_heading = heading_mod.get_heading_quat(ref_rot)

    outs = []
    for o in range(num_objs):
        obj_pos = obj_poses[:, o * 7 : o * 7 + 3]
        obj_quat = obj_poses[:, o * 7 + 3 : o * 7 + 7]
        diff_loc = transform_vec(obj_pos - ref_pos, ref_rot, "heading")
        quat_local = rot.quat_multiply(rot.quat_invert(q_heading), obj_quat)
        outs.append(jnp.concatenate([diff_loc, quat_local], axis=-1))
    return jnp.concatenate(outs, axis=-1)


# ---------------------------------------------------------------------------
# qpos codec
# ---------------------------------------------------------------------------

def qpos_to_smpl(qpos: Array):
    """MuJoCo qpos (T, 76) -> (trans (T, 3), pose_aa (T, 24, 3)) in SMPL joint
    order (qpos_to_smpl_data, process_kinpoly_qpos2smpl.py:57-93).

    qpos layout: [trans(3), root quat wxyz(4), 23 joints x ZYX euler(69)].
    """
    trans = qpos[:, :3]
    root_aa = rot.quat_to_axis_angle(qpos[:, 3:7])
    eulers = qpos[:, 7:].reshape(-1, 23, 3)

    # intrinsic Z-Y-X euler to matrix: R = Rz(a) @ Ry(b) @ Rx(c)
    a, b, c = eulers[..., 0], eulers[..., 1], eulers[..., 2]
    ca, sa = jnp.cos(a), jnp.sin(a)
    cb, sb = jnp.cos(b), jnp.sin(b)
    cc, sc = jnp.cos(c), jnp.sin(c)
    m = jnp.stack(
        [
            ca * cb, ca * sb * sc - sa * cc, ca * sb * cc + sa * sc,
            sa * cb, sa * sb * sc + ca * cc, sa * sb * cc - ca * sc,
            -sb, cb * sc, cb * cc,
        ],
        axis=-1,
    ).reshape(eulers.shape[:-1] + (3, 3))
    joint_aa = rot.matrix_to_axis_angle(m)  # (T, 23, 3)

    aa = jnp.concatenate([root_aa[:, None, :], joint_aa], axis=1)  # (T, 24, 3) mujoco order
    return trans, aa[:, MUJOCO2SMPL_JOINT_IDX]


def smpl_to_qpos(trans: Array, pose_aa: Array) -> Array:
    """Inverse codec: SMPL trans + 24-joint axis-angle -> qpos (T, 76)."""
    smpl2mujoco = np.argsort(MUJOCO2SMPL_JOINT_IDX)
    aa_mj = pose_aa[:, smpl2mujoco]
    root_quat = rot.axis_angle_to_quat(aa_mj[:, 0])
    m = rot.axis_angle_to_matrix(aa_mj[:, 1:])
    # matrix -> intrinsic ZYX euler
    b = -jnp.arcsin(jnp.clip(m[..., 2, 0], -1.0, 1.0))
    a = jnp.arctan2(m[..., 1, 0], m[..., 0, 0])
    c = jnp.arctan2(m[..., 2, 1], m[..., 2, 2])
    eulers = jnp.stack([a, b, c], axis=-1).reshape(trans.shape[0], -1)
    return jnp.concatenate([trans, root_quat, eulers], axis=-1)


# ---------------------------------------------------------------------------
# floor height (host-side numpy; tiny per-sequence scalar work)
# ---------------------------------------------------------------------------

def _dbscan_1d(x: np.ndarray, eps: float = 0.005, min_samples: int = 3) -> np.ndarray:
    """DBSCAN labels for 1-D points; uses sklearn when present, else an
    equivalent sort-and-split fallback.  Returns labels (-1 = noise)."""
    try:
        from sklearn.cluster import DBSCAN

        return DBSCAN(eps=eps, min_samples=min_samples).fit(x.reshape(-1, 1)).labels_
    except ImportError:
        order = np.argsort(x)
        xs = x[order]
        labels = np.full(x.shape[0], -1, dtype=np.int64)
        # core points: >= min_samples points within eps
        counts = np.asarray([(np.abs(xs - xi) <= eps).sum() for xi in xs])
        core = counts >= min_samples
        prev_core_x = None
        cur = -1
        for i in range(len(xs)):
            if not core[i]:
                continue
            if prev_core_x is None or xs[i] - prev_core_x > eps:
                cur += 1
            labels[order[i]] = cur
            prev_core_x = xs[i]
        # attach border points to nearest core cluster within eps
        for i in range(len(xs)):
            if core[i] or labels[order[i]] != -1:
                continue
            d = np.abs(xs - xs[i])
            cand = np.where(core & (d <= eps))[0]
            if cand.size:
                labels[order[i]] = labels[order[cand[np.argmin(d[cand])]]]
        return labels


def determine_floor_height_and_contacts(
    body_joint_seq: np.ndarray, fps: int = 30,
    discard_terrain_sequences: bool = True,
):
    """Floor height + per-joint contacts + terrain-sequence discard
    (process_amass_dataset.py:160-338; constants :52-61).

    body_joint_seq: (T, >=22, 3) numpy.  Returns (offset_floor_height,
    contacts (T, 22), discard_seq).  discard_seq is True when some static-
    foot-height cluster sits above the floor cluster by TERRAIN_HEIGHT_THRESH
    with the root raised by ROOT_HEIGHT_THRESH and enough support frames
    (> CLUSTER_SIZE_THRESH * fps) — the "person steps onto objects" heuristic
    (:267-277); `discard_terrain_sequences` mirrors DISCARD_TERRAIN_SEQUENCES.
    """
    J = {"hips": 0, "leftLeg": 4, "rightLeg": 5, "leftFoot": 7, "rightFoot": 8,
         "leftToeBase": 10, "rightToeBase": 11, "leftHand": 20, "rightHand": 21}
    num_frames = body_joint_seq.shape[0]

    def vel(seq):
        v = np.linalg.norm(seq[1:] - seq[:-1], axis=1)
        return np.append(v, v[-1])

    left_toe = body_joint_seq[:, J["leftToeBase"]]
    right_toe = body_joint_seq[:, J["rightToeBase"]]
    left_toe_vel, right_toe_vel = vel(left_toe), vel(right_toe)
    root_heights = body_joint_seq[:, J["hips"], 2]

    all_inds = np.arange(num_frames)
    left_static = left_toe_vel < FLOOR_VEL_THRESH
    right_static = right_toe_vel < FLOOR_VEL_THRESH
    static_heights = np.concatenate(
        [left_toe[:, 2][left_static], right_toe[:, 2][right_static]]
    )
    static_inds = np.concatenate([all_inds[left_static], all_inds[right_static]])

    discard_seq = False
    if static_heights.shape[0] > 0:
        labels = _dbscan_1d(static_heights, eps=0.005, min_samples=3)
        # per-cluster (toe median, root median, size); the noise label (-1)
        # participates like any other cluster, as in the reference (:235)
        clusters = []
        min_median = min_root_median = float("inf")
        for label in np.unique(labels):
            in_cluster = labels == label
            toe_median = float(np.median(static_heights[in_cluster]))
            cluster_frame_inds = np.unique(static_inds[in_cluster])
            root_median = float(np.median(root_heights[cluster_frame_inds]))
            clusters.append((toe_median, root_median, int(in_cluster.sum())))
            if toe_median < min_median:
                min_median = toe_median
                min_root_median = root_median
        floor_height = min_median
        offset_floor_height = floor_height - FLOOR_HEIGHT_OFFSET

        if discard_terrain_sequences:
            for toe_median, root_median, size in clusters:
                if (
                    root_median > min_root_median + ROOT_HEIGHT_THRESH
                    and toe_median > min_median + TERRAIN_HEIGHT_THRESH
                    and size > int(CLUSTER_SIZE_THRESH * fps)
                ):
                    discard_seq = True
                    break
    else:
        floor_height = offset_floor_height = 0.0

    def contact(joint, thresh):
        seq = body_joint_seq[:, J[joint]]
        return (vel(seq) < CONTACT_VEL_THRESH) & (seq[:, 2] - floor_height < thresh)

    contacts = np.zeros((num_frames, 22))
    contacts[:, J["leftFoot"]] = contact("leftFoot", CONTACT_ANKLE_HEIGHT_THRESH)
    contacts[:, J["rightFoot"]] = contact("rightFoot", CONTACT_ANKLE_HEIGHT_THRESH)
    contacts[:, J["leftToeBase"]] = contact("leftToeBase", CONTACT_TOE_HEIGHT_THRESH)
    contacts[:, J["rightToeBase"]] = contact("rightToeBase", CONTACT_TOE_HEIGHT_THRESH)
    contacts[:, J["leftHand"]] = contact("leftHand", CONTACT_ANKLE_HEIGHT_THRESH)
    contacts[:, J["rightHand"]] = contact("rightHand", CONTACT_ANKLE_HEIGHT_THRESH)
    contacts[:, J["leftLeg"]] = contact("leftLeg", CONTACT_ANKLE_HEIGHT_THRESH)
    contacts[:, J["rightLeg"]] = contact("rightLeg", CONTACT_ANKLE_HEIGHT_THRESH)

    return offset_floor_height, contacts, discard_seq
