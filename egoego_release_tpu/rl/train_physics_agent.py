"""PPO training over the PHYSICS imitation env (host rollouts).

The reference trains its control policies by farming MuJoCo rollouts to CPU
multiprocessing workers and updating with PPO
(copycat/khrylib/rl/agents/{agent,agent_ppo}.py, relive/core/agent_ar.py).
MuJoCo has no TPU backend, so this trainer mirrors that split: rollouts run
host-side against rl/imitation.PhysicsImitation, while the policy/value
updates reuse the same jitted JAX math as the kinematic-path PPO
(rl/ppo.GaussianPolicy / ValueNet / gae_advantages / clipped objective).

  python -m egoego_release_tpu.rl.train_physics_agent \
      --xml kinpoly/assets/mujoco_models/humanoid_smpl_neutral_mesh.xml \
      --expert_path mocap_annotations.p [--iters 100]
"""

from __future__ import annotations

import argparse

import numpy as np
import jax
import jax.numpy as jnp
import optax

from egoego_release_tpu.rl.imitation import PhysicsImitation
from egoego_release_tpu.rl.ppo import (
    GaussianPolicy,
    ValueNet,
    gae_advantages,
    gaussian_logprob,
    make_policy,
)
from egoego_release_tpu.rl.trpo import ZFilter


class PhysicsPPO:
    """Host-rollout PPO over PhysicsImitation.

    Observation: by default the env's proprioceptive state + target
    differences (heading-free qpos, qvel, target joint offsets); pass
    obs_v=0/1/2 to use the exact UHC observation contract
    (humanoid_im.py get_full_obs/get_full_obs_v1/get_full_obs_v2, ported and
    golden-tested in rl/uhc_obs.py — obs_v 2 is the bundled copycat.yml
    config), which makes the policy input layout checkpoint-compatible.
    """

    def __init__(self, sess: PhysicsImitation, hsize=(256, 128),
                 gamma=0.95, lam=0.95, clip_eps=0.2,
                 policy_lr=5e-5, value_lr=3e-4, epochs=5,
                 actor_type="gauss", num_primitive=8,
                 obs_v=None, obs_specs=None):
        self.sess = sess
        ndof = sess.env.ndof
        # obs_v 0/1/2 selects the UHC observation contract (rl/uhc_obs.py,
        # golden-tested vs humanoid_im.get_full_obs*); None keeps the
        # simpler proprioceptive default below
        self.obs_v = obs_v
        self.obs_specs = obs_specs
        if obs_v is None:
            self.obs_dim = (sess.env.model.nq - 2) + sess.env.nv + ndof
        else:
            from egoego_release_tpu.rl.uhc_obs import DEFAULT_OBS_SPECS

            s = dict(DEFAULT_OBS_SPECS, **(obs_specs or {}))
            nq, nv = sess.env.model.nq, sess.env.nv
            nb = min(sess.env.model.nbody, 25) - 1
            vel = 6 if s["obs_vel"] == "root" else nv
            if obs_v == 0:
                self.obs_dim = (int(s["obs_heading"]) + (nq - 2) + vel
                                + (nq - 7) + int(s["obs_phase"]))
            else:
                self.obs_dim = (4 + 3 * (nq - 2) + vel + 1 + 2
                                + 2 * (3 * nb) + 2 * (4 * nb)
                                + (2 * (3 * nb) if obs_v == 1 else 0))
        self.action_dim = sess.env.action_dim
        self.gamma, self.lam, self.clip_eps, self.epochs = gamma, lam, clip_eps, epochs
        # actor_type "mcp" = the UHC configs' mixture-of-primitives actor
        # (copycat.yml actor_type: mcp, num_primitive: 8)
        self.policy = make_policy(self.action_dim, hsize, actor_type,
                                  num_primitive=num_primitive)
        self.value = ValueNet(hsize)
        self.p_opt = optax.adam(policy_lr)
        self.v_opt = optax.adam(value_lr)
        self.zfilter = ZFilter.init(self.obs_dim)
        self._update = jax.jit(self._update_impl)
        self._flat_update = jax.jit(self._flat_update_impl)

        # one fused dispatch per env step (policy sample + logp + value)
        def act_fn(state, o, ka):
            mean, log_std = self.policy.apply(state["policy"], o[None])
            a = mean + jnp.exp(log_std) * jax.random.normal(ka, mean.shape)
            logp = gaussian_logprob(mean, log_std, a)[0]
            val = self.value.apply(state["value"], o[None])[0]
            return a[0], logp, val

        self._act = jax.jit(act_fn)

    def obs(self, target_qpos: np.ndarray, sess=None, cur_t: int = 0) -> np.ndarray:
        sess = sess or self.sess
        if self.obs_v is not None:
            from egoego_release_tpu.rl import uhc_rewards as U
            from egoego_release_tpu.rl.uhc_obs import uhc_observation

            assert sess._expert is not None, "obs_v needs set_expert()"
            cur = {
                "qpos": sess.env.get_qpos(),
                "qvel": sess.env.get_qvel(),
                "wbpos": U.env_wbpos(sess.env),
                "body_com": U.env_body_com(sess.env),
                "wbquat": U.env_wbquat(sess.env),
            }
            return uhc_observation(cur, sess._expert, cur_t,
                                   obs_v=self.obs_v,
                                   specs=self.obs_specs).astype(np.float32)
        qpos = sess.env.get_qpos()
        qvel = sess.env.get_qvel()
        return np.concatenate(
            [qpos[2:], qvel, target_qpos[7:] - qpos[7:]]
        ).astype(np.float32)

    def init_state(self, key):
        obs0 = jnp.zeros((1, self.obs_dim))
        kp, kv = jax.random.split(key)
        p = self.policy.init(kp, obs0)
        v = self.value.init(kv, obs0)
        return {"policy": p, "value": v,
                "p_opt": self.p_opt.init(p), "v_opt": self.v_opt.init(v)}

    def collect(self, state, key, qpos0: np.ndarray, targets: np.ndarray,
                horizon: int, sess=None, qvel0: np.ndarray | None = None,
                on_fail: str = "break",
                fail_qvels: np.ndarray | None = None):
        """One host rollout tracking a (T, 76) kinematic target sequence.

        The observation filter is applied as a per-iteration SNAPSHOT (the
        caller batch-updates it with the raw observations afterwards), so
        concurrent rollouts see consistent normalization.  qvel0 seeds the
        initial joint velocities (the reference's expert-state resets —
        humanoid_im.py reset_model uses expert qvel); default zeros.

        on_fail: what a mid-rollout termination (body_diff past the
        threshold) does during TRAINING collection:
          "break"    — end the rollout (pre-round-5 behavior; the
                       reference's done -> new episode)
          "failsafe" — reset the sim to the expert state at the NEXT frame
                       and keep collecting the same window — the
                       reference's fail_safe playback
                       (copycat/envs/humanoid_im.py:267 resets qpos/qvel to
                       the expert's current frame; relive ar_fail_safe,
                       humanoid_ar_v1.py:642) applied at TRAINING time, so
                       late-take states stay in the training distribution
                       instead of being unreachable after an early fall.
                       The failure step keeps done=True in the batch, so
                       GAE does not bootstrap across the reset.
        fail_qvels: (T, qvel_dim) expert finite-difference velocities used
        to seed fail-safe resets (humanoid_im.fail_safe restores expert
        qvel too); zeros when absent.
        """
        sess = sess or self.sess
        zf = self.zfilter
        sess.reset(qpos0, qvel0)
        if (sess.uhc_reward is not None or sess.sim_reward is not None
                or self.obs_v is not None):
            # UHC/relive sim rewards and the UHC obs contract score against
            # the expert trajectory at the step's time index (copycat
            # get_expert_index) — the kinematic targets ARE the expert here
            sess.set_expert(np.asarray(targets))
            sess.reset(qpos0, qvel0)  # set_expert restores state; re-seed
        raw_l, obs_l, act_l, logp_l, val_l, rew_l, done_l = [], [], [], [], [], [], []
        for t in range(horizon):
            ind = min(t, len(targets) - 1)
            target = targets[ind]
            raw = self.obs(target, sess, cur_t=ind)
            o = ZFilter.apply(zf, raw)
            key, ka = jax.random.split(key)
            a, logp, val = self._act(state, jnp.asarray(o), ka)
            a, logp, val = np.asarray(a), float(logp), float(val)
            r, done, _ = sess.step(a, target, expert_ind=ind)
            raw_l.append(raw); obs_l.append(np.asarray(o)); act_l.append(a)
            logp_l.append(logp); val_l.append(val)
            rew_l.append(r); done_l.append(done)
            if done:
                if on_fail == "failsafe" and t < horizon - 1:
                    nxt = min(ind + 1, len(targets) - 1)
                    qv = (fail_qvels[min(nxt, len(fail_qvels) - 1)]
                          if fail_qvels is not None else None)
                    sess.reset(np.asarray(targets[nxt], np.float64), qv)
                    continue
                break
        last_o = ZFilter.apply(
            zf, self.obs(targets[-1], sess, cur_t=len(targets) - 1))
        last_val = float(self.value.apply(state["value"], jnp.asarray(last_o)[None])[0])
        return key, {
            "raw_obs": np.stack(raw_l),
            "obs": np.stack(obs_l), "actions": np.stack(act_l),
            "logps": np.asarray(logp_l, np.float32),
            "values": np.asarray(val_l, np.float32),
            "rewards": np.asarray(rew_l, np.float32),
            "dones": np.asarray(done_l),
            "last_value": last_val,
        }

    def _update_impl(self, state, batch):
        advs, returns = gae_advantages(
            batch["rewards"][:, None], batch["values"][:, None],
            batch["last_value"][None], batch["dones"][:, None],
            self.gamma, self.lam,
        )
        advs = (advs - advs.mean()) / (advs.std() + 1e-8)
        return self._flat_update_impl(
            state, batch["obs"], batch["actions"], batch["logps"],
            advs[:, 0], returns[:, 0],
        )

    def _flat_update_impl(self, state, obs, act, logp_old, adv_f, ret_f):
        def policy_loss(p):
            mean, log_std = self.policy.apply(p, obs)
            ratio = jnp.exp(gaussian_logprob(mean, log_std, act) - logp_old)
            clipped = jnp.clip(ratio, 1 - self.clip_eps, 1 + self.clip_eps)
            return -jnp.mean(jnp.minimum(ratio * adv_f, clipped * adv_f))

        def value_loss(p):
            return jnp.mean((self.value.apply(p, obs) - ret_f) ** 2)

        def epoch(carry, _):
            pp, vp, po, vo = carry
            pl, pg = jax.value_and_grad(policy_loss)(pp)
            pu, po = self.p_opt.update(pg, po, pp)
            pp = optax.apply_updates(pp, pu)
            vl, vg = jax.value_and_grad(value_loss)(vp)
            vu, vo = self.v_opt.update(vg, vo, vp)
            vp = optax.apply_updates(vp, vu)
            return (pp, vp, po, vo), (pl, vl)

        (pp, vp, po, vo), losses = jax.lax.scan(
            epoch, (state["policy"], state["value"], state["p_opt"], state["v_opt"]),
            None, length=self.epochs,
        )
        return (
            {"policy": pp, "value": vp, "p_opt": po, "v_opt": vo},
            {"policy_loss": losses[0][-1], "value_loss": losses[1][-1]},
        )

    def iterate(self, state, key, qpos0, targets, horizon: int):
        key, batch = self.collect(state, key, qpos0, targets, horizon)
        self.zfilter = ZFilter.update(self.zfilter, batch["raw_obs"])
        jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "raw_obs"}
        new_state, losses = self._update(state, jb)
        metrics = {
            "reward_mean": float(batch["rewards"].mean()),
            "episode_len": len(batch["rewards"]),
            **{k: float(v) for k, v in losses.items()},
        }
        return new_state, key, metrics

    def iterate_parallel(self, state, key, tasks, horizon: int,
                         num_threads: int = 4, on_fail: str = "break"):
        """One PPO iteration over several rollouts collected concurrently —
        the reference's multiprocess `agent.sample`
        (copycat/khrylib/rl/agents/agent.py:107-131) as threads: MuJoCo
        stepping releases the GIL, each worker gets its own env clone, and
        the policy/value/ZFilter are read-only snapshots during collection.

        tasks: list of (qpos0, targets), (qpos0, targets, qvel0), or
        (qpos0, targets, qvel0, fail_qvels) tuples; on_fail/fail_qvels as
        in collect (training-time fail-safe resets).
        """
        import concurrent.futures as cf

        sessions = [self.sess] + [self.sess.clone() for _ in range(len(tasks) - 1)]
        keys = jax.random.split(key, len(tasks) + 1)
        key = keys[0]

        def roll(i):
            qpos0, targets, *rest = tasks[i]
            _, batch = self.collect(state, keys[i + 1], qpos0, targets,
                                    horizon, sess=sessions[i],
                                    qvel0=rest[0] if rest else None,
                                    on_fail=on_fail,
                                    fail_qvels=rest[1] if len(rest) > 1
                                    else None)
            return batch

        with cf.ThreadPoolExecutor(max_workers=num_threads) as ex:
            batches = list(ex.map(roll, range(len(tasks))))

        # batch-update the obs filter once, from all raw observations
        self.zfilter = ZFilter.update(
            self.zfilter, np.concatenate([b["raw_obs"] for b in batches])
        )
        # per-rollout GAE, then one flat clipped update over everything
        obs_l, act_l, logp_l, adv_l, ret_l = [], [], [], [], []
        for b in batches:
            advs, returns = gae_advantages(
                jnp.asarray(b["rewards"][:, None]), jnp.asarray(b["values"][:, None]),
                jnp.asarray(b["last_value"])[None], jnp.asarray(b["dones"][:, None]),
                self.gamma, self.lam,
            )
            obs_l.append(b["obs"]); act_l.append(b["actions"])
            logp_l.append(b["logps"])
            adv_l.append(np.asarray(advs[:, 0])); ret_l.append(np.asarray(returns[:, 0]))
        adv = np.concatenate(adv_l)
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)
        new_state, losses = self._flat_update(
            state, jnp.asarray(np.concatenate(obs_l)),
            jnp.asarray(np.concatenate(act_l)),
            jnp.asarray(np.concatenate(logp_l)),
            jnp.asarray(adv), jnp.asarray(np.concatenate(ret_l)),
        )
        rewards = np.concatenate([b["rewards"] for b in batches])
        metrics = {
            "reward_mean": float(rewards.mean()),
            "num_rollouts": len(batches),
            "total_steps": int(rewards.shape[0]),
            **{k: float(v) for k, v in losses.items()},
        }
        return new_state, key, metrics


def main(argv=None):
    # Host-physics training makes thousands of TINY jitted calls per second;
    # under the axon TPU tunnel each one pays a network round trip, so this
    # CLI pins jax to CPU (the policy/value MLPs are far below TPU scale —
    # the reference's equivalents also ran on CPU workers).
    jax.config.update("jax_platforms", "cpu")
    p = argparse.ArgumentParser()
    p.add_argument("--xml", required=True)
    p.add_argument("--expert_path", required=True)
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--horizon", type=int, default=90)
    p.add_argument("--reward_id", default="dynamic_supervision_v4")
    p.add_argument("--obs_v", type=int, default=None, choices=(0, 1, 2),
                   help="UHC observation contract (humanoid_im get_full_obs*)"
                        "; default keeps the proprioceptive obs")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from egoego_release_tpu.data.kinpoly import StateARDataset

    sess = PhysicsImitation(args.xml, reward_id=args.reward_id)
    agent = PhysicsPPO(sess, obs_v=args.obs_v)
    ds = StateARDataset(args.expert_path, fr_num=args.horizon, train=True,
                        seed=args.seed)
    key = jax.random.PRNGKey(args.seed)
    key, k0 = jax.random.split(key)
    state = agent.init_state(k0)
    for it in range(args.iters):
        rec = ds.sample_seq()
        state, key, m = agent.iterate(
            state, key, rec["qpos"][0], rec["qpos"], args.horizon
        )
        print(f"iter {it}: reward {m['reward_mean']:.4f} len {m['episode_len']} "
              f"ploss {m['policy_loss']:.4f}")


if __name__ == "__main__":
    main()


class ARAgentPPO(PhysicsPPO):
    """PPO fine-tuning of the AR (kinematic) policy THROUGH the physics loop
    — the reference's AgentAR physics training mode (relive/core/agent_ar.py
    driving HumanoidAREnv.step): the cc controller inside ARPhysicsSession is
    frozen; the learned policy outputs 80-dim AR actions (step_ar layout)
    and observes get_ar_obs_v1.  Reuses the PhysicsPPO GAE/clipped-update
    machinery with AR-loop rollouts."""

    def __init__(self, ar_sess, obs_dim: int, hsize=(256, 128), **kw):
        from egoego_release_tpu.models.trajar import ACTION_DIM

        super().__init__(ar_sess.im, hsize=hsize, **kw)
        self.ar_sess = ar_sess
        self.obs_dim = obs_dim
        self.action_dim = ACTION_DIM
        self.policy = make_policy(ACTION_DIM, hsize, "gauss")
        self.value = ValueNet(hsize)
        self.zfilter = ZFilter.init(obs_dim)
        self._update = jax.jit(self._update_impl)
        self._flat_update = jax.jit(self._flat_update_impl)

        def act_fn(state, o, ka):
            mean, log_std = self.policy.apply(state["policy"], o[None])
            a = mean + jnp.exp(log_std) * jax.random.normal(ka, mean.shape)
            logp = gaussian_logprob(mean, log_std, a)[0]
            val = self.value.apply(state["value"], o[None])[0]
            return a[0], logp, val

        self._act = jax.jit(act_fn)

    def collect(self, state, key, ar_context: dict, horizon: int, sess=None):
        sess = sess or self.ar_sess
        zf = self.zfilter
        sess.set_context(ar_context)
        sess.reset(np.asarray(ar_context["qpos"][0]))
        raw = sess.ar_obs()
        raw_l, obs_l, act_l, logp_l, val_l, rew_l, done_l = [], [], [], [], [], [], []
        for _ in range(horizon):
            o = ZFilter.apply(zf, raw)
            key, ka = jax.random.split(key)
            a, logp, val = self._act(state, jnp.asarray(o), ka)
            a = np.asarray(a)
            next_raw, r, done, _ = sess.step(a)
            raw_l.append(raw); obs_l.append(np.asarray(o)); act_l.append(a)
            logp_l.append(float(logp)); val_l.append(float(val))
            rew_l.append(r); done_l.append(done)
            raw = next_raw
            if done:
                break
        last_o = ZFilter.apply(zf, raw)
        last_val = float(self.value.apply(state["value"],
                                          jnp.asarray(last_o)[None])[0])
        return key, {
            "raw_obs": np.stack(raw_l),
            "obs": np.stack(obs_l), "actions": np.stack(act_l),
            "logps": np.asarray(logp_l, np.float32),
            "values": np.asarray(val_l, np.float32),
            "rewards": np.asarray(rew_l, np.float32),
            "dones": np.asarray(done_l),
            "last_value": last_val,
        }

    def iterate(self, state, key, ar_context: dict, horizon: int):
        key, batch = self.collect(state, key, ar_context, horizon)
        self.zfilter = ZFilter.update(self.zfilter, batch["raw_obs"])
        jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "raw_obs"}
        new_state, losses = self._update(state, jb)
        return new_state, key, {
            "reward_mean": float(batch["rewards"].mean()),
            "episode_len": len(batch["rewards"]),
            **{k: float(v) for k, v in losses.items()},
        }
