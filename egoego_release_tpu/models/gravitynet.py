"""GravityNet: SLAM trajectory -> floor normal (stage 1).

Re-implements `HeadNormalFormer`
(egoego/model/head_normal_estimation_transformer.py) as a flax module plus
pure eval functions.  The evo-based xy-plane alignment becomes an on-device
Umeyama solve (ops/alignment.py); the per-step cumulative-sum python loops
(:244-248) become cumsums.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from egoego_release_tpu.models.mlp import MLP
from egoego_release_tpu.models.transformer import Decoder, make_pos_idx
from egoego_release_tpu.ops import alignment
from egoego_release_tpu.ops import rotations as rot

Array = jax.Array


def slam_traj_features(slam_rot_mat: Array, slam_trans: Array) -> Array:
    """(B, T+1, 3, 3) + (B, T+1, 3) -> (B, T, 18) decoder input
    (head_normal_estimation_transformer.py:128-137): rot6d, trans, frame-diff
    rot6d, frame-diff trans."""
    rot6d = rot.matrix_to_rot6d(slam_rot_mat)
    rot_diff = jnp.matmul(slam_rot_mat[:, 1:], jnp.swapaxes(slam_rot_mat[:, :-1], -1, -2))
    rot_diff_6d = rot.matrix_to_rot6d(rot_diff)
    trans_diff = slam_trans[:, 1:] - slam_trans[:, :-1]
    return jnp.concatenate(
        [rot6d[:, :-1], slam_trans[:, :-1], rot_diff_6d, trans_diff], axis=-1
    )


class HeadNormalFormer(nn.Module):
    """Transformer over SLAM-trajectory features; floor normal read from the
    first token (head_normal_estimation_transformer.py:63-167)."""

    # defaults = the released run config (eval_egoego.py:662-663): d_k=d_v=256
    d_model: int = 256
    n_layers: int = 2
    n_head: int = 4
    d_k: int = 256
    d_v: int = 256
    window: int = 120
    mlp_hsize: tuple[int, ...] = (512, 256)

    @nn.compact
    def __call__(self, feats: Array, padding_mask: Array, deterministic: bool = True):
        """feats: (B, T<=window, 18); padding_mask: (B, T) 1=real.
        Returns pred_normal (B, 3)."""
        bs, t, _ = feats.shape
        pos_idx = make_pos_idx(bs, t)
        out, _ = Decoder(
            d_feats=6 + 3 + 6 + 3,
            d_model=self.d_model,
            n_layers=self.n_layers,
            n_head=self.n_head,
            d_k=self.d_k,
            d_v=self.d_v,
            max_timesteps=self.window,
            use_full_attention=True,
            name="action_transformer",
        )(feats, padding_mask, pos_idx, deterministic=deterministic)

        normal = MLP(self.mlp_hsize, "relu", name="action_normal_mlp")(out[:, 0, :])
        return nn.Dense(3, name="action_normal_fc")(normal)


def prep_gravitynet_input(slam_rot_mat: Array, slam_trans: Array, window: int):
    """Crop/pad a single SLAM trajectory to the model window, mirroring
    head_normal_estimation_transformer.py:118-148.

    slam_rot_mat: (B, T+1, 3, 3); slam_trans: (B, T+1, 3).
    Returns (feats (B, window, 18), padding_mask (B, window))."""
    t_plus_1 = slam_trans.shape[1]
    if t_plus_1 > window + 1:
        slam_rot_mat = slam_rot_mat[:, : window + 1]
        slam_trans = slam_trans[:, : window + 1]
        t_plus_1 = window + 1
    feats = slam_traj_features(slam_rot_mat, slam_trans)  # (B, T, 18)
    t = feats.shape[1]
    if t < window:
        feats = jnp.pad(feats, ((0, 0), (0, window - t), (0, 0)))
    mask = (jnp.arange(window)[None, :] < t).astype(jnp.float32)
    mask = jnp.broadcast_to(mask, (feats.shape[0], window))
    return feats, mask


def gravitynet_eval_transform(
    pred_normal: Array,     # (3,)
    slam_rot_mat: Array,    # (T, 3, 3) original SLAM rotations
    slam_trans: Array,      # (T, 3) original SLAM translations
    scale: Array,           # scalar (predicted or GT)
    gt_head_pose: Array,    # (T, 7) GT head pose for xy-plane alignment
):
    """Gravity-align + rescale a SLAM trajectory, then remove the heading
    ambiguity via xy-plane Umeyama alignment against GT
    (head_normal_estimation_transformer.py:214-294).

    Returns dict with head_pose (T, 7), head_trans, head_rot_mat and the
    GT pass-throughs.
    """
    aligned_rot = alignment.rotation_from_floor_normal(pred_normal)  # (3, 3)

    trans_diff = slam_trans[1:] - slam_trans[:-1]
    diff_rs = jnp.einsum("ij,tj->ti", aligned_rot, trans_diff) * scale
    trans_rs = slam_trans[0] + jnp.concatenate(
        [jnp.zeros((1, 3), slam_trans.dtype), jnp.cumsum(diff_rs, axis=0)]
    )

    slam_rot_aligned = jnp.einsum("ij,tjk->tik", aligned_rot, slam_rot_mat)
    slam_quat_aligned = rot.matrix_to_quat(slam_rot_aligned)

    t_ref = gt_head_pose.shape[0]
    traj_est = jnp.concatenate([trans_rs, slam_quat_aligned], axis=-1)[:t_ref]
    r_xy, _, _ = alignment.align_xy_plane_traj(traj_est, gt_head_pose)

    de_rot = jnp.einsum("ij,tjk->tik", r_xy, slam_rot_aligned)
    de_trans = trans_rs - trans_rs[0:1]
    de_trans = jnp.einsum("ij,tj->ti", r_xy, de_trans) + gt_head_pose[0:1, :3]

    de_quat = rot.matrix_to_quat(de_rot)
    return {
        "head_trans": de_trans,
        "head_rot_mat": de_rot,
        "head_pose": jnp.concatenate([de_trans, de_quat], axis=-1),
        "gt_head_trans": gt_head_pose[:, :3],
        "gt_head_rot_mat": rot.quat_to_matrix(gt_head_pose[:, 3:]),
        "gt_head_pose": gt_head_pose,
    }


def gravitynet_eval_upper_bound(
    gt_aligned_rot_mat: Array,  # (3, 3) GT gravity-align rotation
    slam_rot_mat: Array,        # (T, 3, 3)
    slam_trans: Array,          # (T, 3)
    gt_scale: Array,            # scalar GT inverse scale
    gt_head_trans0: Array,      # (3,) GT first-frame head translation
):
    """Oracle upper bound: GT rotation + GT scale applied to the SLAM
    trajectory (forward_for_eval_upper_bound,
    head_normal_estimation_transformer.py:296-332) — isolates how much error
    comes from GravityNet's predictions vs. SLAM itself."""
    trans_diff = slam_trans[1:] - slam_trans[:-1]
    diff_rs = jnp.einsum("ij,tj->ti", gt_aligned_rot_mat, trans_diff) * gt_scale
    trans_rs = gt_head_trans0 + jnp.concatenate(
        [jnp.zeros((1, 3), slam_trans.dtype), jnp.cumsum(diff_rs, axis=0)]
    )
    rot_aligned = jnp.einsum("ij,tjk->tik", gt_aligned_rot_mat, slam_rot_mat)
    quat_aligned = rot.matrix_to_quat(rot_aligned)
    return {
        "head_trans": trans_rs,
        "head_rot_mat": rot_aligned,
        "head_pose": jnp.concatenate([trans_rs, quat_aligned], axis=-1),
    }


def gravitynet_loss(pred_normal: Array, gt_normal: Array) -> Array:
    """L1 normal loss: position_loss = |gt - pred|.sum(dim=1) then mean
    (head_normal_estimation_transformer.py:33-35, used by compute_loss
    :334-342)."""
    return jnp.sum(jnp.abs(gt_normal - pred_normal), axis=-1).mean()
