"""TrajARNet — the kin-poly autoregressive kinematic-policy baseline.

JAX re-implementation of kinpoly/relive/models/traj_ar_smpl_net.py
(TrajARNet, model_v=1): a context GRU over per-step head features feeds an
autoregressive step loop where a step GRU + MLP predict an 80-d action
(root z + root quat(4) + 69 joint eulers + root linear/angular velocity)
that integrates the current qpos forward.

Differences from the reference (documented; functional parity — NOT
checkpoint parity):
  * the MuJoCo-XML Humanoid FK (relive/utils/torch_humanoid.py) is replaced
    by the SMPL-tree FK + qpos codec from ops/ (same skeleton, no simulator)
  * the python per-step loop (forward/step :302-440) is nn.scan — the whole
    rollout is one jitted program
  * single-object features (the only path the reference exercises)

Used as a baseline for head-conditioned full-body estimation, mirroring the
reference's kinpoly exp_* scripts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from egoego_release_tpu.models.mlp import MLP
from egoego_release_tpu.ops import fk as fk_mod
from egoego_release_tpu.ops import geometry
from egoego_release_tpu.ops import heading as heading_mod
from egoego_release_tpu.ops import rotations as rot

QPOS_DIM = 76
QVEL_DIM = 75
ACTION_DIM = 80   # z(1) + quat(4) + eulers(69) + root linv(3) + root angv(3)
POSE_START = 7
QPOS_LM = 74


def step_qpos(qpos: jnp.ndarray, action: jnp.ndarray, dt: float = 1.0 / 30.0):
    """Integrate one action (step, traj_ar_smpl_net.py:302-345), has_z
    variant: action = [z + quat-ish(5)..., eulers(69), root qvel(6)]."""
    curr_pos, curr_rot = qpos[:, :3], qpos[:, 3:7]
    curr_heading = heading_mod.get_heading_quat(curr_rot)
    body_pose = action[:, POSE_START - 2 : QPOS_LM]  # 69

    root_qvel = action[:, QPOS_LM:]
    next_qpos = jnp.concatenate(
        [curr_pos[:, :2], action[:, : POSE_START - 2], body_pose], axis=-1
    )
    linv = rot.quat_apply(curr_heading, root_qvel[:, :3])
    next_qpos = next_qpos.at[:, :2].add(linv[:, :2] * dt)

    angv = rot.quat_apply(curr_rot, root_qvel[:, 3:6])
    new_rot = rot.quat_multiply(rot.axis_angle_to_quat(angv * dt), curr_rot)
    new_rot = new_rot / jnp.linalg.norm(new_rot, axis=-1, keepdims=True)
    next_qpos = next_qpos.at[:, 3:7].set(new_rot)

    # qvel by finite difference (torch_utils.py:284-302), vectorized
    v = (next_qpos[:, :3] - qpos[:, :3]) / dt
    qrel = rot.quat_multiply(next_qpos[:, 3:7], rot.quat_invert(qpos[:, 3:7]))
    rv = rot.quat_to_axis_angle(rot.standardize_quat(qrel)) / dt
    rv = geometry.transform_vec(rv, qpos[:, 3:7], "root")
    joint_vel = (next_qpos[:, 7:] - qpos[:, 7:]) / dt
    next_qvel = jnp.concatenate([v, rv, joint_vel], axis=-1)
    return next_qpos, next_qvel


def inverse_step_qpos(qpos: jnp.ndarray, next_qpos: jnp.ndarray,
                      dt: float = 1.0 / 30.0) -> jnp.ndarray:
    """The action (B, 80) for which `step_qpos(qpos, action, dt)` reproduces
    `next_qpos` exactly — the supervised-pretraining target the reference's
    AgentAR relies on (its RL stage FINE-TUNES an ARNet policy already
    trained to output expert transitions, agent_ar.py; PPO from scratch has
    no signal because the 80-dim action is an absolute next-pose
    representation).  Round-trip-tested in tests/test_trajar.py."""
    curr_rot = qpos[:, 3:7]
    curr_heading = heading_mod.get_heading_quat(curr_rot)
    # z + (ignored) quat slots + absolute body eulers
    z = next_qpos[:, 2:3]
    quat_slot = next_qpos[:, 3:7]
    eulers = next_qpos[:, 7:]
    # root linear velocity in the heading frame (step_qpos applies only xy)
    v = (next_qpos[:, :3] - qpos[:, :3]) / dt
    linv = rot.quat_apply(rot.quat_invert(curr_heading), v)
    # root angular velocity in the body frame
    qrel = rot.standardize_quat(
        rot.quat_multiply(next_qpos[:, 3:7], rot.quat_invert(curr_rot))
    )
    angv_world = rot.quat_to_axis_angle(qrel) / dt
    angv = rot.quat_apply(rot.quat_invert(curr_rot), angv_world)
    return jnp.concatenate([z, quat_slot, eulers, linv, angv], axis=-1)


def build_obs(qpos, qvel, context_feat, data_t, rest_offsets, use_vel=True,
              skeleton=None, head_idx=None):
    """State features at one step (get_obs, traj_ar_smpl_net.py:208-302).

    FK backend: by default the head pose comes from the SMPL FK over
    rest_offsets (TPU-idiomatic; the skeletons differ by millimetres).  Pass
    `skeleton` (ops/mujoco_xml.load_mujoco_skeleton) + `head_idx` to use the
    reference's MuJoCo-XML FK instead — that path reproduces the reference's
    own get_obs bit-for-bit (tests/test_trajar.py::test_build_obs_xml_*)."""
    if skeleton is not None:
        from egoego_release_tpu.ops.mujoco_xml import qpos_fk as _xml_fk

        gq, gp = _xml_fk(skeleton, qpos)
        pred_hrot = gq[:, head_idx]
        pred_hpos = gp[:, head_idx]
    else:
        trans, aa24 = geometry.qpos_to_smpl(qpos)
        gq, gp = fk_mod.fk_smpl(trans, aa24[:, :22], rest_offsets)
        pred_hrot = gq[:, fk_mod.HEAD_IDX]
        pred_hpos = gp[:, fk_mod.HEAD_IDX]

    qpos_local = qpos.at[:, 3:7].set(heading_mod.de_heading(qpos[:, 3:7]))

    t_hrot = data_t["head_pose"][:, 3:]
    t_hpos = data_t["head_pose"][:, :3]
    diff_hpos = geometry.transform_vec(t_hpos - pred_hpos, pred_hrot, "heading")
    diff_hrot = rot.quat_multiply(rot.quat_invert(t_hrot), pred_hrot)

    q_heading = heading_mod.get_heading_quat(pred_hrot)
    obj_rot = data_t["obj_pose"][:, 3:7]
    obj_pos = data_t["obj_pose"][:, :3]
    diff_obj = geometry.transform_vec(obj_pos - pred_hpos, pred_hrot, "heading")
    obj_rot_local = rot.quat_multiply(rot.quat_invert(q_heading), obj_rot)
    pred_obj_rel = jnp.concatenate([diff_obj, obj_rot_local], axis=-1)

    obs = [context_feat, qpos_local[:, 2:]]
    if use_vel:
        obs.append(qvel)
    obs += [
        diff_hpos, diff_hrot, pred_obj_rel,
        data_t["head_vels"][:, 3:], data_t["head_vels"][:, :3],
        data_t["obj_head_relative_poses"],
    ]
    return jnp.concatenate(obs, axis=-1)


class _ARCell(nn.Module):
    """One autoregressive step: obs -> GRU -> MLP -> action -> qpos update."""

    rnn_hdim: int
    mlp_hsize: tuple[int, ...]
    use_vel: bool
    dt: float
    rest_offsets: tuple  # hashable static

    @nn.compact
    def __call__(self, carry, data_t):
        qpos, qvel, rnn_state = carry
        rest = jnp.asarray(self.rest_offsets)
        # step t's context feature (reference: data['context_feat_rnn'][:, t])
        obs = build_obs(qpos, qvel, data_t["context_feat"], data_t, rest, self.use_vel)
        rnn_state, rnn_out = nn.GRUCell(self.rnn_hdim, name="action_gru")(rnn_state, obs)
        x = MLP(self.mlp_hsize, "relu", name="action_mlp")(
            jnp.concatenate([obs, rnn_out], axis=-1)
        )
        action = nn.Dense(ACTION_DIM, name="action_fc")(x)
        qpos, qvel = step_qpos(qpos, action, self.dt)
        return (qpos, qvel, rnn_state), (qpos, qvel)


class _CtxCell(nn.Module):
    rnn_hdim: int

    @nn.compact
    def __call__(self, carry, x):
        return nn.GRUCell(self.rnn_hdim, name="context_gru")(carry, x)


class TrajARNet(nn.Module):
    rnn_hdim: int = 512
    mlp_hsize: tuple[int, ...] = (1024, 512)
    use_vel: bool = True
    dt: float = 1.0 / 30.0
    rest_offsets: tuple = ()  # tuple-of-tuples (22, 3); static

    @nn.compact
    def __call__(self, data, init_qpos=None):
        """data: head_pose (B,T,7), head_vels (B,T,6), obj_pose (B,T,7),
        obj_head_relative_poses (B,T,7).  Returns qpos (B,T,76), qvel (B,T,75)."""
        b, t = data["head_pose"].shape[:2]

        ctx_in = jnp.concatenate(
            [data["head_vels"], data["obj_head_relative_poses"]], axis=-1
        )
        ctx_scan = nn.scan(
            _CtxCell, variable_broadcast="params", split_rngs={"params": False},
            in_axes=1, out_axes=1,
        )(self.rnn_hdim, name="context")
        _, ctx_feats = ctx_scan(jnp.zeros((b, self.rnn_hdim)), ctx_in)  # (B,T,H)

        # init head predicts the initial qpos refinement (init_pred_qpos path)
        init_feat = nn.Dense(ACTION_DIM + QVEL_DIM, name="context_fc")(
            MLP(self.mlp_hsize, "relu", name="context_mlp")(ctx_feats[:, 0])
        )
        if init_qpos is None:
            init_qpos = jnp.zeros((b, QPOS_DIM)).at[:, 3].set(1.0)
            init_qpos = init_qpos.at[:, 2].set(init_feat[:, 0])
        init_qvel = jnp.zeros((b, QVEL_DIM))

        steps = {
            "head_pose": data["head_pose"],
            "head_vels": data["head_vels"],
            "obj_pose": data["obj_pose"],
            "obj_head_relative_poses": data["obj_head_relative_poses"],
            "context_feat": ctx_feats,
        }
        ar_scan = nn.scan(
            _ARCell, variable_broadcast="params", split_rngs={"params": False},
            in_axes=1, out_axes=1,
        )(self.rnn_hdim, self.mlp_hsize, self.use_vel, self.dt,
          self.rest_offsets, name="ar")
        carry0 = (init_qpos, init_qvel, jnp.zeros((b, self.rnn_hdim)))
        _, (qpos_seq, qvel_seq) = ar_scan(carry0, steps)
        return {"qpos": qpos_seq, "qvel": qvel_seq}


def trajar_loss(pred: dict, gt_qpos: jnp.ndarray, rest_offsets) -> jnp.ndarray:
    """FK-space position loss + qpos loss (the spirit of compute_loss,
    traj_ar_smpl_net.py:441)."""
    trans_p, aa_p = geometry.qpos_to_smpl(pred["qpos"].reshape(-1, QPOS_DIM))
    trans_g, aa_g = geometry.qpos_to_smpl(gt_qpos.reshape(-1, QPOS_DIM))
    _, gp_p = fk_mod.fk_smpl(trans_p, aa_p[:, :22], rest_offsets)
    _, gp_g = fk_mod.fk_smpl(trans_g, aa_g[:, :22], rest_offsets)
    pos_loss = jnp.mean(jnp.sum((gp_p - gp_g) ** 2, axis=-1))
    qpos_loss = jnp.mean((pred["qpos"] - gt_qpos) ** 2)
    return pos_loss + qpos_loss


def _quat_identity_loss(gt_quat, pred_quat):
    """orientation_loss (relive/utils/compute_loss.py:38-44, 55-61):
    ||abs(gt * pred^-1) - identity||^2 per row."""
    diff = rot.quat_multiply(gt_quat, rot.quat_invert(pred_quat))
    iden = jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype=diff.dtype)
    return jnp.sum((jnp.abs(diff) - iden) ** 2, axis=-1)


def trajar_reference_loss(pred: dict, data: dict, specs: dict | None = None):
    """The reference TrajARNet.compute_loss (traj_ar_smpl_net.py:441-477),
    term for term: root pos/orientation, joint-euler pose, root linear +
    angular velocity (GT qvel one step ahead, :451-452), whole-body position
    ("end effector") loss, and object-to-head position/orientation terms.

    pred: dict(qpos (B,T,76), qvel (B,T,75), wbpos (B,T,J*3),
    obj_2_head (B,T,7)); data: same keys (gt) + obj_head_relative_poses.
    Returns (loss, components[8]).  Golden-tested against the reference's
    own method (tests/test_trajar.py).  The module's default training loss
    (trajar_loss) stays the documented FK-space deviation.
    """
    s = specs or {}
    w_rp, w_rr = s.get("w_rp", 50), s.get("w_rr", 50)
    w_p, w_v, w_ee = s.get("w_p", 1), s.get("w_v", 1), s.get("w_ee", 1)
    w_op, w_or = s.get("w_op", 1), s.get("w_or", 1)

    pq = pred["qpos"].reshape(-1, pred["qpos"].shape[-1])
    gq = data["qpos"].reshape(-1, data["qpos"].shape[-1])
    r_pos_loss = jnp.sum((gq[:, :3] - pq[:, :3]) ** 2, axis=-1).mean()
    r_rot_loss = _quat_identity_loss(gq[:, 3:7], pq[:, 3:7]).mean()
    p_rot_loss = jnp.sum((gq[:, 7:] - pq[:, 7:]) ** 2, axis=-1).mean()

    pv = pred["qvel"][:, :-1].reshape(-1, pred["qvel"].shape[-1])
    gv = data["qvel"][:, 1:].reshape(-1, data["qvel"].shape[-1])
    vl_loss = jnp.sum((gv[:, :3] - pv[:, :3]) ** 2, axis=-1).mean()
    va_loss = jnp.sum((gv[:, 3:6] - pv[:, 3:6]) ** 2, axis=-1).mean()

    pw = pred["wbpos"].reshape(pq.shape[0], -1)
    gw = data["wbpos"].reshape(pq.shape[0], -1)
    ee_loss = jnp.sum((gw - pw) ** 2, axis=-1).mean()

    po = pred["obj_2_head"].reshape(-1, 7)
    go = data["obj_head_relative_poses"].reshape(-1, 7)
    o_pos_loss = jnp.sum((go[:, :3] - po[:, :3]) ** 2, axis=-1).mean()
    o_rot_loss = _quat_identity_loss(go[:, 3:], po[:, 3:]).mean()

    loss = (w_rp * r_pos_loss + w_rr * r_rot_loss + w_p * p_rot_loss
            + w_v * vl_loss + w_v * va_loss + w_ee * ee_loss
            + w_op * o_pos_loss + w_or * o_rot_loss)
    return loss, (r_pos_loss, r_rot_loss, p_rot_loss, vl_loss, va_loss,
                  ee_loss, o_pos_loss, o_rot_loss)
