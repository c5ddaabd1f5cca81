"""Vectorized kinematic humanoid environment.

TPU-native subset of the kinpoly RL layer (SURVEY §2.3 L7): the reference's
`HumanoidAREnv` (kinpoly/relive/envs/humanoid_ar_v1.py) wraps MuJoCo with PD
torque + residual-force control; its *kinematic* core — qpos state advanced
by policy actions, imitation rewards against expert motion, head-tracking
termination (fail_safe, copycat/envs/humanoid_im.py:267) — is what the
EgoEgo-adjacent baselines actually learn on.  This env reproduces that core
as pure JAX: state is (qpos, qvel), `step` integrates actions with the same
dynamics as TrajARNet (models/trajar.py::step_qpos), rewards follow the
dynamic-supervision shape of kinpoly's reward_function.py
(w·exp(-k·err) terms over pose / velocity / head tracking).

Physics simulation (contacts, PD torque, RFC) needs a simulator and is out
of scope for v1 — the env interface leaves room for an MJX backend.

Everything is batched: there is no python env-pool (the reference uses CPU
multiprocessing rollout workers — khrylib/rl/agents/agent.py:107-131);
rollouts vmap over environments and lax.scan over time.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from egoego_release_tpu.models.trajar import ACTION_DIM, QVEL_DIM, step_qpos
from egoego_release_tpu.ops import fk as fk_mod
from egoego_release_tpu.ops import geometry
from egoego_release_tpu.ops import heading as heading_mod
from egoego_release_tpu.ops import rotations as rot


class EnvState(NamedTuple):
    qpos: jnp.ndarray   # (B, 76)
    qvel: jnp.ndarray   # (B, 75)
    t: jnp.ndarray      # (B,) int32 step index
    done: jnp.ndarray   # (B,) bool


class KinematicHumanoidEnv:
    """Expert-imitation env.  expert: dict with qpos (T,76), head_pose (T,7)."""

    def __init__(self, rest_offsets, w_pose=0.5, w_vel=0.1, w_head=0.4,
                 k_pose=2.0, k_vel=0.005, k_head=5.0,
                 head_fail_dist=0.5, dt=1.0 / 30.0,
                 reward_id: str | None = None,
                 reward_weights: dict | None = None):
        """reward_id selects a kinpoly reward from rl/rewards.py (e.g.
        'dynamic_supervision_v3', the statear production reward); None keeps
        the legacy 3-term w*exp(-k*err) reward.  The expert trajectory stands
        in for the reference's kinematic-target/AR-context/GT pose sources
        (see rewards.RewardContext)."""
        self.rest_offsets = jnp.asarray(rest_offsets)
        self.w = (w_pose, w_vel, w_head)
        self.k = (k_pose, k_vel, k_head)
        self.head_fail_dist = head_fail_dist
        self.dt = dt
        self.reward_id = reward_id
        self.reward_weights = reward_weights
        self.obs_dim = 74 + QVEL_DIM + 3 + 4 + 6  # local qpos + qvel + head diffs + target vels
        self.action_dim = ACTION_DIM

    def reset(self, expert_qpos0: jnp.ndarray) -> EnvState:
        """Start from the expert's first frame (B, 76)."""
        b = expert_qpos0.shape[0]
        return EnvState(
            qpos=expert_qpos0,
            qvel=jnp.zeros((b, QVEL_DIM)),
            t=jnp.zeros((b,), jnp.int32),
            done=jnp.zeros((b,), bool),
        )

    def _head_pose(self, qpos):
        trans, aa24 = geometry.qpos_to_smpl(qpos)
        gq, gp = fk_mod.fk_smpl(trans, aa24[:, :22], self.rest_offsets)
        return gp[:, fk_mod.HEAD_IDX], gq[:, fk_mod.HEAD_IDX]

    def _body_pose(self, qpos):
        """Full-body FK: (global quats (B,22,4), world body pos (B,22,3))."""
        trans, aa24 = geometry.qpos_to_smpl(qpos)
        return fk_mod.fk_smpl(trans, aa24[:, :22], self.rest_offsets)

    def prepare_expert(self, expert: dict) -> dict:
        """Precompute full-body expert FK ONCE per trajectory — step() would
        otherwise re-run two fk_smpl calls on the fixed expert every env step
        of every rollout.  Adds bquat (T,B,22,4) / wbpos (T,B,22,3)."""
        if "bquat" in expert:
            return expert
        q = jnp.asarray(expert["qpos"])          # (T, B, 76)
        t, b = q.shape[:2]
        gq, gp = self._body_pose(q.reshape(t * b, q.shape[-1]))
        return dict(
            expert,
            bquat=gq.reshape(t, b, 22, 4),
            wbpos=gp.reshape(t, b, 22, 3),
        )

    def obs(self, state: EnvState, expert: dict) -> jnp.ndarray:
        """Observation at the current step (HumanoidAREnv get_obs spirit:
        heading-local qpos + qvel + head tracking differences + target head
        velocity)."""
        b = state.qpos.shape[0]
        envs = jnp.arange(b)
        hpos, hrot = self._head_pose(state.qpos)
        target_head = expert["head_pose"][state.t, envs]   # (B, 7)
        target_hvel = expert["head_vels"][state.t, envs]   # (B, 6)

        qpos_local = state.qpos.at[:, 3:7].set(heading_mod.de_heading(state.qpos[:, 3:7]))
        diff_hpos = geometry.transform_vec(target_head[:, :3] - hpos, hrot, "heading")
        diff_hrot = rot.quat_multiply(rot.quat_invert(target_head[:, 3:]), hrot)
        return jnp.concatenate(
            [qpos_local[:, 2:], state.qvel, diff_hpos, diff_hrot, target_hvel], axis=-1
        )

    def step(self, state: EnvState, action: jnp.ndarray, expert: dict):
        """(state, action (B,80)) -> (state', reward (B,), done (B,))."""
        next_qpos, next_qvel = step_qpos(state.qpos, action, self.dt)
        t_next = jnp.minimum(state.t + 1, expert["qpos"].shape[0] - 1)
        envs = jnp.arange(state.qpos.shape[0])

        e_qpos = expert["qpos"][t_next, envs]
        hpos, hrot = self._head_pose(next_qpos)
        e_head = expert["head_pose"][t_next, envs]
        head_err = jnp.sum((hpos - e_head[:, :3]) ** 2, axis=-1)

        if self.reward_id is not None:
            from egoego_release_tpu.rl.rewards import REWARD_FUNCS, RewardContext

            cur_bquat, cur_wbpos = self._body_pose(next_qpos)
            prev_bquat, _ = self._body_pose(state.qpos)
            if "bquat" in expert:   # precomputed by prepare_expert
                e_bquat = expert["bquat"][t_next, envs]
                e_wbpos = expert["wbpos"][t_next, envs]
                e_prev_bquat = expert["bquat"][state.t, envs]
            else:
                e_bquat, e_wbpos = self._body_pose(e_qpos)
                e_prev_bquat, _ = self._body_pose(expert["qpos"][state.t, envs])
            # Role mapping without a simulator: the POLICY plays the ARNet
            # (ar_* = its integrated pose), the expert is both the kinematic
            # target and GT — so v3's rp/rq/act_p regularize the policy
            # against the expert instead of degenerating to exp(0)=1.
            ctx = RewardContext(
                cur_hpose=jnp.concatenate([hpos, hrot], axis=-1),
                tgt_hpose=e_head,
                cur_bquat=cur_bquat,
                prev_bquat=prev_bquat,
                cur_wbpos=cur_wbpos,
                tgt_bquat=e_bquat,
                tgt_wbpos=e_wbpos,
                tgt_qpos=e_qpos,
                ar_qpos=next_qpos,
                ar_bquat=cur_bquat,
                ar_prev_bquat=prev_bquat,
                gt_bquat=e_bquat,
                gt_prev_bquat=e_prev_bquat,
                dt=self.dt,
            )
            reward, _ = REWARD_FUNCS[self.reward_id](ctx, self.reward_weights)
        else:
            # legacy 3-term rewards: exp(-k * err) (reward_function.py shape)
            pose_err = jnp.mean((next_qpos[:, 7:] - e_qpos[:, 7:]) ** 2, axis=-1)
            vel_err = jnp.mean(next_qvel ** 2, axis=-1)
            w_p, w_v, w_h = self.w
            k_p, k_v, k_h = self.k
            reward = (
                w_p * jnp.exp(-k_p * pose_err)
                + w_v * jnp.exp(-k_v * vel_err)
                + w_h * jnp.exp(-k_h * head_err)
            )

        head_dist = jnp.sqrt(head_err)
        fail = head_dist > self.head_fail_dist       # fail_safe termination
        end = t_next >= expert["qpos"].shape[0] - 1
        done = state.done | fail | end
        reward = jnp.where(state.done, 0.0, reward)

        new_state = EnvState(
            qpos=jnp.where(state.done[:, None], state.qpos, next_qpos),
            qvel=jnp.where(state.done[:, None], state.qvel, next_qvel),
            t=jnp.where(state.done, state.t, t_next),
            done=done,
        )
        return new_state, reward, done
