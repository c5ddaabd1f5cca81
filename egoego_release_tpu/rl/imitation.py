"""Physics-grounded imitation stepping (the reference's HumanoidAREnv.step).

One control step of the reference loop (humanoid_ar_v1.py:554-650):

  kinematic action --step_ar--> target qpos --FK--> target pose
  control action --stable-PD + RFC + mj_step--> simulated pose
  reward = dynamic-supervision(sim, target, AR context)
  terminate when the simulated body diverges from the target (env_term_body)

`step_ar` itself is models/trajar.step_qpos (same integration, already
oracle-tested); the target FK is ops/mujoco_xml.qpos_fk (validated against
real MuJoCo); dynamics are rl/mujoco_env.MujocoHumanoidEnv.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from egoego_release_tpu.ops.mujoco_xml import load_mujoco_skeleton, qpos_fk
from egoego_release_tpu.rl import rewards as rewards_mod
from egoego_release_tpu.rl import sim_rewards as sim_rewards_mod
from egoego_release_tpu.rl import uhc_rewards as uhc_rewards_mod
from egoego_release_tpu.rl.mujoco_env import MujocoHumanoidEnv


class PhysicsImitation:
    """Couples the physics env with kinematic targets + the reward suite."""

    def __init__(
        self,
        xml_path: str,
        reward_id: str = "dynamic_supervision_v4",
        reward_weights: dict | None = None,
        term_body_diff: float = 10.0,   # cc_cfg.env_term_body 'body' threshold
        **env_kwargs,
    ):
        self._ctor_args = dict(xml_path=xml_path, reward_id=reward_id,
                               reward_weights=reward_weights,
                               term_body_diff=term_body_diff, **env_kwargs)
        self.env = MujocoHumanoidEnv(xml_path, **env_kwargs)
        self.skeleton = load_mujoco_skeleton(xml_path)
        # relive dynamic-supervision rewards score against the KINEMATIC
        # TARGET; UHC world rewards (rl/uhc_rewards.py) score against a
        # precomputed EXPERT trajectory (set_expert + expert_ind per step),
        # matching copycat's reward_id: world_rfc_implicit
        self.uhc_reward = uhc_rewards_mod.UHC_REWARD_FUNCS.get(reward_id)
        # relive simulator-state families (quat/deep-mimic/local-world/
        # world-quat) score against the same set_expert attrs
        self.sim_reward = (
            None if self.uhc_reward
            else sim_rewards_mod.SIM_REWARD_FUNCS.get(reward_id)
        )
        self.reward_fn = (
            None if (self.uhc_reward or self.sim_reward)
            else rewards_mod.REWARD_FUNCS[reward_id]
        )
        self.reward_weights = reward_weights
        self.term_body_diff = term_body_diff
        self._expert = None
        self._qaddr = None

    def clone(self) -> "PhysicsImitation":
        """Fresh env instance with the same configuration — one per rollout
        worker (MjData is not shareable across threads)."""
        return PhysicsImitation(**self._ctor_args)

    def reset(self, qpos0: np.ndarray, qvel0: np.ndarray | None = None):
        self.env.reset(qpos0, qvel0)
        return self.env.get_qpos()

    def set_expert(self, expert_qpos: np.ndarray):
        """Precompute the expert attrs the UHC world rewards read
        (copycat/utils/tools.get_expert subset)."""
        self._expert = uhc_rewards_mod.expert_physics_attrs(self.env, expert_qpos)
        self._qaddr = uhc_rewards_mod.body_qposaddr(self.env.model)
        return self._expert

    def _uhc_cur_state(self, prev_qpos: np.ndarray):
        qpos = self.env.get_qpos()
        return {
            "bquat": uhc_rewards_mod.body_quat_local(
                qpos, self._qaddr, self.env.body_names),
            "prev_bquat": uhc_rewards_mod.body_quat_local(
                prev_qpos, self._qaddr, self.env.body_names),
            "ee_wpos": uhc_rewards_mod.env_ee_wpos(self.env),
            "com": uhc_rewards_mod.env_com(self.env),
            # the explicit/local/v2/v3 variants additionally read:
            "qpos": qpos,
            "prev_qpos": prev_qpos,
            "ee_pos": uhc_rewards_mod.env_ee_local(self.env),
            "wbquat": uhc_rewards_mod.env_wbquat(self.env),
            "wbpos": uhc_rewards_mod.env_wbpos(self.env),
            "body_com": uhc_rewards_mod.env_body_com(self.env),
        }

    def _target_pose(self, target_qpos: np.ndarray):
        # the FK skeleton covers the HUMANOID joints only; object-bearing
        # *_all qpos carries object dofs past 7 + ndof (reference qpos_lim)
        hq = np.asarray(target_qpos)[: 7 + self.env.ndof]
        quat, pos = qpos_fk(self.skeleton, jnp.asarray(hq[None], jnp.float32))
        return np.asarray(quat[0]), np.asarray(pos[0])

    def step(
        self,
        cc_action: np.ndarray,        # (ndof [+6],) control-policy output
        target_qpos: np.ndarray,      # (76,) kinematic target (step_ar output)
        ar_qpos: np.ndarray | None = None,   # raw ARNet qpos (v3 reward terms)
        prev_target_qpos: np.ndarray | None = None,
        expert_ind: int | None = None,       # expert frame (UHC/sim rewards)
        old_action: np.ndarray | None = None,   # fine_tune_* action proximity
        kin_bquat: np.ndarray | None = None,    # fine_tune_* kinematic quats
    ):
        """-> (reward, done, info).  The PD tracks target_qpos[7:] through
        frame_skip substeps; reward scores the simulated pose against the
        target (and optionally the AR context) with the configured
        dynamic-supervision variant, or against the set_expert trajectory
        at expert_ind with the configured UHC world reward."""
        prev_bquat = self.env.get_body_quat()
        prev_qpos = self.env.get_qpos()
        prev_head = self.env.get_head_pose()
        # PD tracks the ACTUATED joints only — on the object-bearing *_all
        # models target_qpos may carry object dofs past the humanoid's
        pd_target = np.asarray(target_qpos[7:7 + self.env.ndof], np.float64)
        self.env.do_simulation(cc_action, pd_target)

        if self.sim_reward is not None:
            assert self._expert is not None, "call set_expert() first"
            ind = expert_ind if expert_ind is not None else 0
            cur = self._uhc_cur_state(prev_qpos)
            cur["head_pose"] = self.env.get_head_pose()
            cur["prev_head_pose"] = prev_head
            kwargs = dict(ws=self.reward_weights, dt=self.env.dt)
            name = self._ctor_args["reward_id"]
            if name.startswith("fine_tune"):
                if name != "fine_tune_action_reward":  # the others score a
                    # kinematic-pose proximity term
                    kwargs["kin_bquat"] = (
                        kin_bquat if kin_bquat is not None
                        else self._expert["bquat"][ind][4:])
                if name != "fine_tune_reward":
                    kwargs["old_action"] = (
                        old_action if old_action is not None
                        else np.zeros_like(np.asarray(cc_action)))
            if name == "deep_mimic_reward_v2_vf":
                kwargs["vf_dim"] = self.env.vf_dim
            args = [cur, self._expert, ind, np.asarray(cc_action)]
            if "old_action" in kwargs:
                args.append(kwargs.pop("old_action"))
            reward, components = self.sim_reward(*args, **kwargs)
            tgt_wbpos = self._target_pose(target_qpos)[1]
            body_diff = float(
                np.linalg.norm(
                self.env.get_wbody_pos()[: len(tgt_wbpos)] - tgt_wbpos,
                axis=1).sum()
            )
            done = body_diff > self.term_body_diff
            return float(reward), done, {
                "body_diff": body_diff, "components": components,
            }

        if self.uhc_reward is not None:
            assert self._expert is not None, "call set_expert() first"
            ind = expert_ind if expert_ind is not None else 0
            reward, components = self.uhc_reward(
                self._uhc_cur_state(prev_qpos), self._expert, ind,
                np.asarray(cc_action), ws=self.reward_weights,
                vf_dim=self.env.vf_dim, dt=self.env.dt,
            )
            tgt_wbpos = self._target_pose(target_qpos)[1]
            body_diff = float(
                np.linalg.norm(
                self.env.get_wbody_pos()[: len(tgt_wbpos)] - tgt_wbpos,
                axis=1).sum()
            )
            done = body_diff > self.term_body_diff
            return float(reward), done, {
                "body_diff": body_diff, "components": components,
            }

        tgt_bquat, tgt_wbpos = self._target_pose(target_qpos)
        head_body = self.env.body_names.index("Head")
        tgt_hpose = np.concatenate([tgt_wbpos[head_body], tgt_bquat[head_body]])

        ctx_kwargs = dict(
            cur_hpose=jnp.asarray(self.env.get_head_pose()[None], jnp.float32),
            tgt_hpose=jnp.asarray(tgt_hpose[None], jnp.float32),
            cur_bquat=jnp.asarray(self.env.get_body_quat()[None], jnp.float32),
            prev_bquat=jnp.asarray(prev_bquat[None], jnp.float32),
            cur_wbpos=jnp.asarray(self.env.get_wbody_pos()[None], jnp.float32),
            tgt_bquat=jnp.asarray(tgt_bquat[None], jnp.float32),
            tgt_wbpos=jnp.asarray(tgt_wbpos[None], jnp.float32),
            tgt_qpos=jnp.asarray(target_qpos[None], jnp.float32),
            dt=self.env.dt,
        )
        if ar_qpos is not None:
            ar_bquat, _ = self._target_pose(ar_qpos)
            prev_ar = (
                self._target_pose(prev_target_qpos)[0]
                if prev_target_qpos is not None else ar_bquat
            )
            ctx_kwargs.update(
                ar_qpos=jnp.asarray(ar_qpos[None], jnp.float32),
                ar_bquat=jnp.asarray(ar_bquat[None], jnp.float32),
                ar_prev_bquat=jnp.asarray(prev_ar[None], jnp.float32),
                gt_bquat=jnp.asarray(ar_bquat[None], jnp.float32),
                gt_prev_bquat=jnp.asarray(prev_ar[None], jnp.float32),
            )
        reward, components = self.reward_fn(
            rewards_mod.RewardContext(**ctx_kwargs), self.reward_weights
        )

        # env_term_body='body': simulated body diverged from the target
        body_diff = float(
            np.linalg.norm(
                self.env.get_wbody_pos()[: len(tgt_wbpos)] - tgt_wbpos,
                axis=1).sum()
        )
        done = body_diff > self.term_body_diff
        info = {"body_diff": body_diff, "components": np.asarray(components[0])}
        return float(reward[0]), done, info
