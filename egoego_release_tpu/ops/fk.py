"""SMPL 22-joint forward / inverse kinematics, vectorized for TPU.

Replaces the reference's per-joint python loops
(egoego/data/amass_diffusion_dataset.py:92-143 local2global_pose /
quat_ik_torch / quat_fk_torch, and fk_smpl at :265-293) with level-parallel
updates: joints at the same kinematic-tree depth are processed together, so
FK is 8 small batched ops instead of 21 sequential ones, and the whole thing
stays inside one XLA fusion.

The kinematic tree is the standard SMPL-H body tree (first 22 joints of
kintree_table in the SMPL-H npz; see also body_model/utils.py:9 in the
reference).  Rest-pose bone offsets come from the SMPL model (betas=0) and
are passed in explicitly — see ops/smpl.py for loading them from a model npz.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from egoego_release_tpu.ops import rotations as rot

Array = jax.Array

# parent index per joint; root's parent is itself (offset 0 handles it).
SMPL_PARENTS = np.asarray(
    [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19],
    dtype=np.int32,
)
NUM_JOINTS = 22
HEAD_IDX = 15
ROOT_IDX = 0

# joints grouped by depth in the tree (computed once from SMPL_PARENTS).
def _levels(parents: np.ndarray):
    depth = np.zeros(len(parents), dtype=np.int32)
    for j in range(1, len(parents)):
        depth[j] = depth[parents[j]] + 1
    levels = []
    for d in range(1, depth.max() + 1):
        js = np.nonzero(depth == d)[0]
        levels.append((js, parents[js]))
    return levels


_LEVELS = _levels(SMPL_PARENTS)


def fk_from_local_quat(local_quat: Array, local_offsets: Array, root_trans: Array | None = None):
    """Forward kinematics.

    local_quat:    (..., 22, 4) local joint rotations (root = global orient)
    local_offsets: (22, 3) or (..., 22, 3) rest-pose bone offsets
                   (root offset is the rest root position or zeros)
    root_trans:    optional (..., 3) added to all joint positions

    Returns (global_quat (...,22,4), global_jpos (...,22,3)).

    Matches quat_fk_torch (amass_diffusion_dataset.py:127-143) + the
    root_trans addition in fk_smpl (:291).
    """
    local_offsets = jnp.broadcast_to(local_offsets, local_quat.shape[:-1] + (3,))

    gq = local_quat
    gp = local_offsets
    # Level-parallel accumulation: at each depth, compose with (already-final)
    # parent results.  Scatter via .at[] keeps everything static-shaped.
    for js, ps in _LEVELS:
        parent_q = gq[..., ps, :]
        parent_p = gp[..., ps, :]
        new_q = rot.quat_multiply(parent_q, local_quat[..., js, :])
        new_p = rot.quat_apply(parent_q, local_offsets[..., js, :]) + parent_p
        gq = gq.at[..., js, :].set(new_q)
        gp = gp.at[..., js, :].set(new_p)

    if root_trans is not None:
        gp = gp + root_trans[..., None, :]
    return gq, gp


def ik_to_local_quat(global_quat: Array) -> Array:
    """Global joint rotations -> local (relative-to-parent) rotations.

    Matches quat_ik_torch (amass_diffusion_dataset.py:109-125).
    """
    parents = jnp.asarray(SMPL_PARENTS[1:], dtype=jnp.int32)
    parent_q = global_quat[..., parents, :]
    child_local = rot.quat_multiply(rot.quat_invert(parent_q), global_quat[..., 1:, :])
    return jnp.concatenate([global_quat[..., :1, :], child_local], axis=-2)


def local_to_global_matrix(local_mat: Array) -> Array:
    """Local rotation matrices (..., 22, 3, 3) -> global, level-parallel.

    Matches local2global_pose (amass_diffusion_dataset.py:92-107).
    """
    g = local_mat
    for js, ps in _LEVELS:
        g = g.at[..., js, :, :].set(jnp.matmul(g[..., ps, :, :], local_mat[..., js, :, :]))
    return g


def fk_smpl(root_trans: Array, local_aa: Array, rest_offsets: Array):
    """FK from axis-angle local rotations (reference fk_smpl,
    amass_diffusion_dataset.py:265-293).

    root_trans: (..., 3); local_aa: (..., 22, 3); rest_offsets: (22, 3).
    Returns (global_quat (...,22,4), global_jpos (...,22,3)).
    """
    local_quat = rot.matrix_to_quat(rot.axis_angle_to_matrix(local_aa))
    return fk_from_local_quat(local_quat, rest_offsets, root_trans)
