"""SMPL-H body model as batched XLA ops.

Replaces the reference's torch smplx / human_body_prior stack
(body_model/body_model.py:11-117, and `run_smpl_model` at
egoego/data/amass_diffusion_dataset.py:15-81): npz loading, shape/pose
blendshapes, joint regression, and linear blend skinning, all as einsums that
XLA tiles onto the MXU.

Design notes (TPU-first):
  * gender mixing: the reference regroups the batch by gender and runs two
    models (:39-74); here male/female parameter tensors are stacked and
    selected per-element with jnp.where — branchless, no host-side regrouping.
  * the model npz is user-provided exactly as in the reference (SMPL models
    are licensed and not redistributable); tests use synthetic models.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from egoego_release_tpu.ops import fk as fk_mod
from egoego_release_tpu.ops import rotations as rot

Array = jax.Array


class SMPLModel(NamedTuple):
    """Static SMPL-H parameters (one gender)."""

    v_template: Array    # (V, 3)
    shapedirs: Array     # (V, 3, n_betas)
    posedirs: Array      # (V, 3, (J_full-1)*9)
    j_regressor: Array   # (J_full, V)
    weights: Array       # (V, J_full)
    parents: Array       # (J_full,) int32, parents[0] == -1
    faces: Array | None = None  # (F, 3) int32


def load_smpl_npz(path: str, num_betas: int = 16) -> SMPLModel:
    """Load a SMPL-H model npz (same file the reference consumes —
    smpl_models/smplh_amass/{gender}/model.npz)."""
    data = np.load(path, allow_pickle=True)
    shapedirs = np.asarray(data["shapedirs"], dtype=np.float32)
    if shapedirs.shape[-1] > num_betas:
        # smplh_amass models concatenate 300 shape dirs; the reference keeps 16
        shapedirs = shapedirs[:, :, :num_betas]
    parents = np.asarray(data["kintree_table"][0], dtype=np.int64)
    parents[0] = -1
    j_reg = data["J_regressor"]
    if hasattr(j_reg, "toarray"):
        j_reg = j_reg.toarray()
    return SMPLModel(
        v_template=jnp.asarray(data["v_template"], dtype=jnp.float32),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(np.asarray(data["posedirs"], dtype=np.float32)),
        j_regressor=jnp.asarray(np.asarray(j_reg, dtype=np.float32)),
        weights=jnp.asarray(np.asarray(data["weights"], dtype=np.float32)),
        parents=jnp.asarray(parents.astype(np.int32)),
        faces=jnp.asarray(np.asarray(data["f"], dtype=np.int32)) if "f" in data else None,
    )


def _fk_transforms(parents: np.ndarray, rot_mats: Array, joints: Array):
    """Per-joint world transforms for LBS.

    rot_mats: (B, J, 3, 3) local rotations; joints: (B, J, 3) rest joints.
    Returns (posed_joints (B, J, 3), rel_transforms (B, J, 4, 4)).
    """
    parents = np.asarray(parents)
    offsets = joints.at[:, 1:].add(-joints[:, parents[1:]])  # bone vectors

    j = rot_mats.shape[1]
    t = jnp.zeros(rot_mats.shape[:2] + (4, 4), rot_mats.dtype)
    t = t.at[..., :3, :3].set(rot_mats)
    t = t.at[..., :3, 3].set(offsets)
    t = t.at[..., 3, 3].set(1.0)

    # level-parallel composition over the kinematic tree
    depth = np.zeros(j, dtype=np.int32)
    for i in range(1, j):
        depth[i] = depth[parents[i]] + 1
    g = t
    for d in range(1, depth.max() + 1):
        js = np.nonzero(depth == d)[0]
        g = g.at[:, js].set(jnp.matmul(g[:, parents[js]], t[:, js]))

    posed_joints = g[..., :3, 3]
    # subtract the rest-joint contribution: G' = G - pack(G @ [J;0])
    rest_correction = jnp.einsum("bjik,bjk->bji", g[..., :3, :3], joints)
    rel = g.at[..., :3, 3].add(-rest_correction)
    return posed_joints, rel


def lbs(
    model: SMPLModel,
    betas: Array,       # (B, n_betas)
    pose_aa: Array,     # (B, J_full, 3) axis-angle incl. root orient
    trans: Array,       # (B, 3)
    want_verts: bool = True,
):
    """Linear blend skinning. Returns (joints (B, J_full, 3),
    verts (B, V, 3) or None)."""
    # shape blendshapes
    v_shaped = model.v_template + jnp.einsum("vdk,bk->bvd", model.shapedirs, betas)
    j_rest = jnp.einsum("jv,bvd->bjd", model.j_regressor, v_shaped)  # (B, J, 3)

    rot_mats = rot.axis_angle_to_matrix(pose_aa)  # (B, J, 3, 3)
    parents = np.asarray(model.parents)
    posed_joints, rel = _fk_transforms(parents, rot_mats, j_rest)

    verts = None
    if want_verts:
        # pose blendshapes over non-root joints
        ident = jnp.eye(3, dtype=rot_mats.dtype)
        pose_feature = (rot_mats[:, 1:] - ident).reshape(betas.shape[0], -1)
        v_posed = v_shaped + jnp.einsum("vdp,bp->bvd", model.posedirs, pose_feature)

        # skinning: per-vertex blended transform
        t_blend = jnp.einsum("vj,bjik->bvik", model.weights, rel)  # (B, V, 4, 4)
        v_h = jnp.concatenate([v_posed, jnp.ones(v_posed.shape[:-1] + (1,), v_posed.dtype)], -1)
        verts = jnp.einsum("bvik,bvk->bvi", t_blend, v_h)[..., :3] + trans[:, None, :]

    joints = posed_joints + trans[:, None, :]
    return joints, verts


def rest_joints(model: SMPLModel, betas: Array | None = None) -> Array:
    """Rest-pose joint positions (J_full, 3) at given betas (default zeros)."""
    if betas is None:
        betas = jnp.zeros((1, model.shapedirs.shape[-1]), jnp.float32)
    v_shaped = model.v_template + jnp.einsum("vdk,bk->bvd", model.shapedirs, betas)
    return jnp.einsum("jv,bvd->bjd", model.j_regressor, v_shaped)[0]


def rest_offsets_22(model: SMPLModel) -> Array:
    """The 22-joint rest bone offsets used by fk_smpl, computed exactly like
    the reference's get_rest_pose_joints (amass_diffusion_dataset.py:248-263):
    zero-beta rest joints, root offset set to 0."""
    j = rest_joints(model)[: fk_mod.NUM_JOINTS]
    parents = fk_mod.SMPL_PARENTS.copy()
    parents[0] = 0
    return j - j[parents]


class GenderedSMPL(NamedTuple):
    """Stacked male/female model for branchless gender-mixed batches."""

    male: SMPLModel
    female: SMPLModel

    def run(self, betas: Array, pose_aa: Array, trans: Array, is_female: Array,
            want_verts: bool = True):
        """is_female: (B,) bool.  Selects per-element between genders.

        Replaces run_smpl_model's gender regrouping
        (amass_diffusion_dataset.py:39-74) with two LBS passes + select;
        on TPU this is cheaper than host-side regrouping and keeps shapes
        static.  Most callers have single-gender batches — pass the matching
        single model to `lbs` directly in that case.
        """
        jm, vm = lbs(self.male, betas, pose_aa, trans, want_verts)
        jf, vf = lbs(self.female, betas, pose_aa, trans, want_verts)
        sel = is_female[:, None, None]
        joints = jnp.where(sel, jf, jm)
        verts = jnp.where(sel, vf, vm) if want_verts else None
        return joints, verts


def load_gendered_smpl(smplh_dir: str, num_betas: int = 16) -> GenderedSMPL:
    """Load {smplh_dir}/male/model.npz and female/model.npz (the reference's
    SMPLH_PATH layout, amass_diffusion_dataset.py:13,161-162)."""
    return GenderedSMPL(
        male=load_smpl_npz(os.path.join(smplh_dir, "male", "model.npz"), num_betas),
        female=load_smpl_npz(os.path.join(smplh_dir, "female", "model.npz"), num_betas),
    )
