"""The kinpoly dynamic-supervision reward suite, batched JAX.

Port of kinpoly/relive/core/reward_function.py — the reward family actually
used by the statear experiment matrix (every one of the 37 statear YAMLs with
a reward_id sets `dynamic_supervision_v3`; v1/v4/v5/v6 are its ablations).
The reference's quat helpers come from relive/utils/math_utils.py /
transformation.py; tested against the reference's own functions in
tests/test_rl_rewards.py.

The reference's env exposes three pose sources per step:
  * the SIMULATED character (env.get_head/get_body_quat/get_wbody_pos)
  * the KINEMATIC TARGET from the AR policy step (env.target)
  * the raw AR context (env.ar_context: ARNet predictions / GT)
In this framework's kinematic env (rl/env.py) the simulated state IS the
kinematic pose, so callers populate `RewardContext` with expert motion as the
target/AR/GT sources for imitation training.

Not ported (documented): dynamic_supervision_v2 is fully commented out in the
reference (returns undefined locals — dead code, reward_function.py:999-1079).
The simulator-state families (quat_v2/v3, deep_mimic*, multiplicable,
local_world*, world_quat*, fine_tune*) live in rl/sim_rewards.py — host-side
numpy over MuJoCo state, golden-tested in tests/test_sim_rewards.py — so the
full reference registry is covered between the two modules.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


# ---------------------------------------------------------------------------
# quat helpers (relive/utils/math_utils.py:93-118) — the reference's inverse
# is the plain conjugate (unit-quat assumption), so reuse ops/rotations
# ---------------------------------------------------------------------------

from egoego_release_tpu.ops.rotations import (  # noqa: E402
    quat_conjugate as quat_inverse,
    quat_multiply,
)


def multi_quat_diff(nq1: Array, nq0: Array) -> Array:
    """Relative quaternions q1 * q0^-1 per joint; (..., J, 4) x (..., J, 4)."""
    return quat_multiply(nq1, quat_inverse(nq0))


def multi_quat_norm_v2(nq: Array) -> Array:
    """Per-joint rotation magnitude ||(|w|-1, x, y, z)||
    (math_utils.py:111-118); (..., J, 4) -> (..., J)."""
    d = jnp.concatenate([jnp.abs(nq[..., :1]) - 1.0, nq[..., 1:]], axis=-1)
    return jnp.linalg.norm(d, axis=-1)


def rotation_vec_from_quat(q: Array, eps: float = 1e-6) -> Array:
    """Gohlke rotation_from_quaternion (transformation.py:364-374): angle =
    2*acos(w) in [0, 2pi) — NOT the shortest-arc atan2 convention — with a
    zero vector near identity/anti-identity; (..., 4) -> (..., 3)."""
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    small = (jnp.abs(1.0 - w) < eps) | (jnp.abs(1.0 + w) < eps)
    angle = 2.0 * jnp.arccos(w)
    s = jnp.sin(angle / 2.0)
    axis = q[..., 1:] / jnp.where(small, 1.0, s)[..., None]
    axis = axis / jnp.maximum(
        jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-12
    )
    return jnp.where(small[..., None], 0.0, angle[..., None] * axis)


def get_angvel_fd(prev_bquat: Array, cur_bquat: Array, dt: float) -> Array:
    """Finite-difference per-joint angular velocity (math_utils.py:47-53);
    (..., J, 4) pairs -> (..., J*3)."""
    dq = multi_quat_diff(cur_bquat, prev_bquat)
    av = rotation_vec_from_quat(dq) / dt
    return av.reshape(av.shape[:-2] + (-1,))


def _lp_norm(x: Array, ord: float) -> Array:
    """np.linalg.norm(flat_vector, ord=v_ord) over the last axis."""
    return jnp.sum(jnp.abs(x) ** ord, axis=-1) ** (1.0 / ord)


# ---------------------------------------------------------------------------
# context + weights
# ---------------------------------------------------------------------------

class RewardContext(NamedTuple):
    """Batched quantities for one reward evaluation (leading dim B).

    Naming follows the reference (reward_function.py:931-1314):
      cur_*  — the character being scored (simulated / kinematic state)
      tgt_*  — env.target: the kinematic-policy target pose this step
      hpose_target — ar_context['head_pose'][t]: the head the policy must track
      ar_*   — ar_context['ar_qpos'/'ar_bquat']: raw ARNet predictions
      gt_*   — ar_context['bquat']: ground-truth body quats (v1 only)
    """

    cur_hpose: Array            # (B, 7)
    tgt_hpose: Array            # (B, 7)
    cur_bquat: Array            # (B, J, 4)
    prev_bquat: Array           # (B, J, 4)
    cur_wbpos: Array            # (B, J, 3)
    tgt_bquat: Array            # (B, J, 4)
    tgt_wbpos: Array            # (B, J, 3)
    tgt_qpos: Array | None = None       # (B, >=7) kinematic-target qpos
    ar_qpos: Array | None = None        # (B, >=7) ARNet qpos at t
    ar_bquat: Array | None = None       # (B, J, 4) ARNet body quats at t
    ar_prev_bquat: Array | None = None  # (B, J, 4) ARNet body quats at t-1
    gt_bquat: Array | None = None       # (B, J, 4)
    gt_prev_bquat: Array | None = None  # (B, J, 4)
    dt: float = 1.0 / 30.0


DEFAULT_WEIGHTS = {
    # reward_function.py:936-940 defaults
    "w_hp": 1.0, "w_hq": 1.0, "w_hv": 0.05, "w_p": 1.0, "w_jp": 1.0,
    "w_rp": 1.0, "w_rq": 1.0, "w_act_p": 1.0, "w_act_v": 1.0,
    "k_hp": 1.0, "k_hq": 1.0, "k_hv": 1.0, "k_p": 1.0, "k_jp": 0.1,
    "k_rp": 0.1, "k_rq": 0.1, "k_act_p": 0.1, "k_act_v": 0.1,
    "v_ord": 2,
}


def _w(ws: dict | None):
    out = dict(DEFAULT_WEIGHTS)
    if ws:
        out.update(ws)
    return out


def _head_terms(ctx: RewardContext, k_hp: float, k_hq: float):
    hp_dist = jnp.linalg.norm(ctx.cur_hpose[:, :3] - ctx.tgt_hpose[:, :3], axis=-1)
    hp_reward = jnp.exp(-k_hp * hp_dist**2)
    hq_dist = multi_quat_norm_v2(
        multi_quat_diff(ctx.cur_hpose[:, None, 3:], ctx.tgt_hpose[:, None, 3:])
    ).mean(axis=-1)
    hq_reward = jnp.exp(-k_hq * hq_dist**2)
    return hp_reward, hq_reward


def _pose_terms(ctx: RewardContext, k_p: float, k_jp: float):
    pose_quat_diff = multi_quat_norm_v2(
        multi_quat_diff(ctx.cur_bquat, ctx.tgt_bquat)
    ).mean(axis=-1)
    pose_pos_diff = jnp.linalg.norm(ctx.cur_wbpos - ctx.tgt_wbpos, axis=-1).mean(axis=-1)
    p_reward = jnp.exp(-k_p * pose_quat_diff**2)
    jp_reward = jnp.exp(-k_jp * pose_pos_diff**2)
    return p_reward, jp_reward


# ---------------------------------------------------------------------------
# the dynamic-supervision family
# ---------------------------------------------------------------------------

def dynamic_supervision_v1(ctx: RewardContext, ws: dict | None = None):
    """GT-supervised additive variant (reward_function.py:931-995)."""
    w = _w(ws)
    hp, hq = _head_terms(ctx, w["k_hp"], w["k_hq"])
    p, jp = _pose_terms(ctx, w["k_p"], w["k_jp"])

    pose_gt_diff = multi_quat_norm_v2(
        multi_quat_diff(ctx.gt_bquat, ctx.cur_bquat)
    ).mean(axis=-1)
    gt_p = jnp.exp(-w["k_act_p"] * pose_gt_diff)  # NOTE: not squared (:985)

    cur_av = get_angvel_fd(ctx.prev_bquat, ctx.cur_bquat, ctx.dt)
    tgt_av = get_angvel_fd(ctx.gt_prev_bquat, ctx.gt_bquat, ctx.dt)
    vel_dist = _lp_norm(cur_av - tgt_av, w["v_ord"])
    act_v = jnp.exp(-w["k_act_v"] * vel_dist**2)

    reward = (
        w["w_hp"] * hp + w["w_hq"] * hq + w["w_p"] * p + w["w_jp"] * jp
        + w["w_act_p"] * gt_p + w["w_act_v"] * act_v
    )
    return reward, jnp.stack([hp, hq, p, jp, gt_p, act_v], axis=-1)


def dynamic_supervision_v3(ctx: RewardContext, ws: dict | None = None):
    """The statear production reward: multiplicative head/pose/AR-regularized
    terms (reward_function.py:1081-1149; reward_id of all 37 statear YAMLs)."""
    w = _w(ws)
    hp, hq = _head_terms(ctx, w["k_hp"], w["k_hq"])
    p, jp = _pose_terms(ctx, w["k_p"], w["k_jp"])

    rp_dist = jnp.linalg.norm(ctx.ar_qpos[:, :3] - ctx.tgt_qpos[:, :3], axis=-1)
    rq_dist = multi_quat_norm_v2(
        multi_quat_diff(ctx.ar_qpos[:, None, 3:7], ctx.tgt_qpos[:, None, 3:7])
    ).mean(axis=-1)
    pose_action_diff = multi_quat_norm_v2(
        multi_quat_diff(ctx.ar_bquat, ctx.tgt_bquat)
    ).mean(axis=-1)

    cur_av = get_angvel_fd(ctx.prev_bquat, ctx.cur_bquat, ctx.dt)
    tgt_av = get_angvel_fd(ctx.ar_prev_bquat, ctx.ar_bquat, ctx.dt)
    vel_dist = _lp_norm(cur_av - tgt_av, w["v_ord"])
    act_v = jnp.exp(-w["k_act_v"] * vel_dist**2)

    rq = jnp.exp(-w["k_rq"] * rq_dist**2)
    rp = jnp.exp(-w["k_rp"] * rp_dist**2)
    act_p = jnp.exp(-w["k_act_p"] * pose_action_diff)  # not squared (:1139)

    # act_v is reported but excluded from the product (:1144)
    reward = hp * hq * p * jp * rp * rq * act_p
    return reward, jnp.stack([hp, hq, p, jp, rp, rq, act_p, act_v], axis=-1)


def dynamic_supervision_v4(ctx: RewardContext, ws: dict | None = None):
    """Additive head+pose tracking, no action terms (:1152-1203)."""
    w = _w(ws)
    hp, hq = _head_terms(ctx, w["k_hp"], w["k_hq"])
    p, jp = _pose_terms(ctx, w["k_p"], w["k_jp"])
    hv = jnp.zeros_like(hp)  # hv_reward = 0 in the reference (:1184)
    reward = (
        w["w_hp"] * hp + w["w_hq"] * hq + w["w_hv"] * hv
        + w["w_p"] * p + w["w_jp"] * jp
    )
    return reward, jnp.stack([hp, hq, hv, p, jp], axis=-1)


def dynamic_supervision_v5(ctx: RewardContext, ws: dict | None = None):
    """v4 multiplicative (:1205-1256)."""
    w = _w(ws)
    hp, hq = _head_terms(ctx, w["k_hp"], w["k_hq"])
    p, jp = _pose_terms(ctx, w["k_p"], w["k_jp"])
    hv = jnp.zeros_like(hp)
    reward = hp * hq * p * jp
    return reward, jnp.stack([hp, hq, hv, p, jp], axis=-1)


def dynamic_supervision_v6(ctx: RewardContext, ws: dict | None = None):
    """v4 + AR angular-velocity term (:1259-1314)."""
    w = _w(ws)
    hp, hq = _head_terms(ctx, w["k_hp"], w["k_hq"])
    p, jp = _pose_terms(ctx, w["k_p"], w["k_jp"])

    cur_av = get_angvel_fd(ctx.prev_bquat, ctx.cur_bquat, ctx.dt)
    tgt_av = get_angvel_fd(ctx.ar_prev_bquat, ctx.ar_bquat, ctx.dt)
    vel_dist = _lp_norm(cur_av - tgt_av, w["v_ord"])
    act_v = jnp.exp(-w["k_act_v"] * vel_dist**2)

    reward = (
        w["w_hp"] * hp + w["w_hq"] * hq + w["w_p"] * p + w["w_jp"] * jp
        + w["w_act_v"] * act_v
    )
    return reward, jnp.stack([hp, hq, p, jp, act_v], axis=-1)


def constant_reward(ctx: RewardContext, ws: dict | None = None):
    """(:1316-1320) — returns 1.0 unconditionally (the reference computes an
    end bonus then returns the constant anyway; kept faithful)."""
    b = ctx.cur_hpose.shape[0]
    return jnp.ones((b,)), jnp.zeros((b, 1))


REWARD_FUNCS = {
    "dynamic_supervision_v1": dynamic_supervision_v1,
    "dynamic_supervision_v3": dynamic_supervision_v3,
    "dynamic_supervision_v4": dynamic_supervision_v4,
    "dynamic_supervision_v5": dynamic_supervision_v5,
    "dynamic_supervision_v6": dynamic_supervision_v6,
    "constant": constant_reward,
}
