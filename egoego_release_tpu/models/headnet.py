"""HeadNet: optical-flow features -> head rotation + SLAM scale (stage 1).

Re-implements `HeadFormer` (egoego/model/head_estimation_transformer.py) as a
flax module plus pure eval functions.  TPU-first deviations with identical
numerics:

  * the reference's blockwise eval (:234-282) runs blocks sequentially and
    chains the integrated quaternion across blocks; integrating angular
    velocity is associative over concatenation, so we run ALL blocks through
    the transformer as one batch and do a single `lax.scan` integration over
    the full sequence — same result, one kernel launch.
  * `cal_scale_for_slam_w_pred_scale` (:180-212) is a python loop over T with
    a cumulative sum; here it is a cumsum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from egoego_release_tpu.models.mlp import MLP
from egoego_release_tpu.models.transformer import Decoder, make_pos_idx
from egoego_release_tpu.ops import rotations as rot

Array = jax.Array


class HeadFormer(nn.Module):
    """Transformer over per-frame OF features with two MLP heads
    (head_estimation_transformer.py:50-95)."""

    # defaults = the released run config (trainer_head_estimation.py:259-260,
    # eval_egoego.py:644-645): d_k=d_v=256, so a default-config model loads
    # the released checkpoints without shape surgery
    d_model: int = 256
    n_layers: int = 2
    n_head: int = 4
    d_k: int = 256
    d_v: int = 256
    window: int = 60
    cnn_fdim: int = 512
    mlp_hsize: tuple[int, ...] = (1024, 512, 256)

    @nn.compact
    def __call__(self, of_feats: Array, padding_mask: Array, deterministic: bool = True):
        """of_feats: (B, T, 512); padding_mask: (B, T) 1=real.
        Returns (head_va (B,T,3), dist_scalar (B,T,1))."""
        bs, t, _ = of_feats.shape
        pos_idx = make_pos_idx(bs, t)
        out, _ = Decoder(
            d_feats=self.cnn_fdim,
            d_model=self.d_model,
            n_layers=self.n_layers,
            n_head=self.n_head,
            d_k=self.d_k,
            d_v=self.d_v,
            max_timesteps=self.window,
            use_full_attention=True,
            name="action_transformer",
        )(of_feats, padding_mask, pos_idx, deterministic=deterministic)

        va = MLP(self.mlp_hsize, "relu", name="action_va_mlp")(out)
        va = nn.Dense(3, name="action_va_fc")(va)
        dist = MLP(self.mlp_hsize, "relu", name="action_dist_mlp")(out)
        dist = nn.Dense(1, name="action_dist_fc")(dist)
        return va, dist


class HeadFormerWithCNN(nn.Module):
    """Raw-flow variant: ResNet-18 encodes per-frame flow images inline
    (the reference's `input_of_feats=False` path,
    head_estimation_transformer.py:66-72,132-144).  Flow frames (B, T, 224,
    224, 2) are zero-padded to 3 channels and encoded to 512-d features, then
    fed to the standard HeadFormer.  `freeze_cnn` mirrors opt.freeze_of_cnn
    (gradients stopped through the encoder)."""

    headformer: HeadFormer
    freeze_cnn: bool = True
    # the reference constructs its ResNet with running_stats=False, i.e.
    # torch track_running_stats=False: BatchNorm ALWAYS normalizes with the
    # current batch statistics (egoego/model/resnet.py:20-24).  Callers must
    # apply with mutable=["batch_stats"] when bn_batch_stats=True.
    bn_batch_stats: bool = True

    @nn.compact
    def __call__(self, flow: Array, padding_mask: Array, deterministic: bool = True):
        from egoego_release_tpu.models.resnet import ResNet18, flow_to_input

        b, t = flow.shape[:2]
        x = flow_to_input(flow.reshape((b * t,) + flow.shape[2:]))
        feats = ResNet18(out_dim=self.headformer.cnn_fdim, name="cnn")(
            x, train=self.bn_batch_stats
        )
        feats = feats.reshape(b, t, -1)
        if self.freeze_cnn:
            feats = jax.lax.stop_gradient(feats)
        return self.headformer(feats, padding_mask, deterministic=deterministic)


def va2rot(init_quat: Array, head_vels: Array, dt: float = 1.0 / 30.0) -> Array:
    """Integrate angular velocity to a rotation sequence
    (head_estimation_transformer.py:97-119).

    init_quat: (B, 4); head_vels: (B, T, 3).  Returns (B, T+1, 4).
    """

    def step(curr_rot, vel):
        angv = rot.quat_apply(curr_rot, vel)
        # pytorch3d's quaternion_multiply standardizes to w >= 0; the sign
        # feeds back through the integration, so match it exactly.
        new_rot = rot.standardize_quat(
            rot.quat_multiply(rot.axis_angle_to_quat(angv * dt), curr_rot)
        )
        new_rot = new_rot / jnp.linalg.norm(new_rot, axis=-1, keepdims=True)
        return new_rot, new_rot

    _, seq = jax.lax.scan(step, init_quat, jnp.swapaxes(head_vels, 0, 1))
    seq = jnp.swapaxes(seq, 0, 1)  # (B, T, 4)
    return jnp.concatenate([init_quat[:, None], seq], axis=1)


def rescale_slam_trans(slam_trans: Array, dist_scalar: Array):
    """Rescale a SLAM trajectory to metric scale using the predicted
    per-frame displacement lengths (head_estimation_transformer.py:180-212).

    slam_trans: (T, 3); dist_scalar: (T',) — extra entries beyond T-1 are
    ignored (the reference truncates to the shorter of the two).
    Returns (rescaled_trans (T, 3), scale).
    """
    diffs = slam_trans[1:] - slam_trans[:-1]  # (T-1, 3)
    slam_abs_len = jnp.linalg.norm(diffs, axis=-1)
    n = min(slam_abs_len.shape[0], dist_scalar.shape[0])
    scale = jnp.mean(dist_scalar[:n]) / jnp.mean(slam_abs_len[:n])
    rescaled = slam_trans[0] + jnp.concatenate(
        [jnp.zeros((1, 3), slam_trans.dtype), jnp.cumsum(scale * diffs, axis=0)]
    )
    return rescaled, scale


def padding_mask_from_len(seq_len: Array, window: int) -> Array:
    """(B,) actual lengths -> (B, window) 1=real (prep_padding_mask :121-129)."""
    return (jnp.arange(window)[None, :] < seq_len[:, None]).astype(jnp.float32)


def headformer_forward_for_eval(
    model: HeadFormer,
    params,
    of_feats: Array,          # (1, T, 512) full-sequence features
    init_head_quat: Array,    # (1, 4) first-frame GT head orientation
    aligned_slam_trans: Array,  # (T, 3)
    dist_scale: float = 10.0,
):
    """Whole-sequence eval (head_estimation_transformer.py:214-308), with all
    blocks batched through the transformer at once.

    Returns dict with head_pose (1, T, 7) and pred_scale.
    """
    t_total = of_feats.shape[1]
    w = model.window
    num_blocks = -(-t_total // w)
    pad = num_blocks * w - t_total

    blocks = jnp.pad(of_feats[0], ((0, pad), (0, 0))).reshape(num_blocks, w, -1)
    lens = jnp.minimum(t_total - jnp.arange(num_blocks) * w, w)
    mask = padding_mask_from_len(lens, w)

    va, dist = model.apply(params, blocks, mask)  # (nb, w, 3), (nb, w, 1)
    va = va.reshape(-1, 3)[:t_total][None]        # (1, T, 3)
    dist = dist.reshape(-1)[:t_total]             # (T,)

    head_quat = va2rot(init_head_quat, va)        # (1, T+1, 4)
    dist = dist / dist_scale
    rescaled_trans, scale = rescale_slam_trans(aligned_slam_trans, dist)

    t_out = rescaled_trans.shape[0]
    head_quat = head_quat[:, :t_out]
    head_pose = jnp.concatenate([rescaled_trans[None], head_quat], axis=-1)
    return {"head_pose": head_pose, "pred_scale": scale}


def headformer_loss(
    va_pred: Array,        # (B, T, 3)
    dist_pred: Array,      # (B, T, 1)
    init_quat: Array,      # (B, 4)
    gt_head_vels: Array,   # (B, T, 3) angular part
    gt_head_quat: Array,   # (B, T+1, 4) orientations incl. frame 0
    gt_head_trans: Array,  # (B, T+1, 3)
    w_rotation: float = 1.0,
    w_va: float = 1.0,
    w_dist: float = 1.0,
    dist_scale: float = 10.0,
):
    """Training loss (head_estimation_transformer.py:310-345)."""
    pred_quat = va2rot(init_quat, va_pred)[:, 1:]  # (B, T, 4)

    va_loss = jnp.sum((gt_head_vels - va_pred) ** 2, axis=-1).mean()

    diff = rot.quat_multiply(gt_head_quat[:, 1:], rot.quat_invert(pred_quat))
    iden = jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype=diff.dtype)
    orient_loss = jnp.sum((jnp.abs(diff) - iden) ** 2, axis=-1).mean()

    gt_dist = jnp.linalg.norm(
        gt_head_trans[:, 1:] - gt_head_trans[:, :-1], axis=-1
    ) * dist_scale  # (B, T)
    dist_loss = ((dist_pred[..., 0] - gt_dist) ** 2).mean()

    loss = w_rotation * orient_loss + w_va * va_loss + w_dist * dist_loss
    return loss, (orient_loss, va_loss, dist_loss)
