"""Kinematic-policy RL training CLI (the kinpoly agent loop).

Mirror of the reference's policy-training path — `AgentAR`
(kinpoly/relive/core/agent_ar.py) driven by a statear YAML's policy_specs
(reward_id, reward_weights, gamma/tau, lr, clip_epsilon, hsizes — e.g.
kinpoly/config/statear/*.yml) over expert windows — rebuilt TPU-native:
vectorized envs (vmap over batch inside the jitted PPO iteration) instead of
CPU multiprocessing rollout workers, the dynamic-supervision reward suite
from rl/rewards.py, and orbax checkpoints.

  python -m egoego_release_tpu.rl.train_agent \
      --cfg config/statear/exp.yml --expert_path mocap_annotations.p \
      --rest_offsets rest.npy [--iters 200] [--num_envs 16]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp

from egoego_release_tpu.data.kinpoly import StateARDataset
from egoego_release_tpu.rl.env import KinematicHumanoidEnv
from egoego_release_tpu.rl.ppo import PPOAgent, PPOConfig
from egoego_release_tpu.utils.config import KinpolyConfig


def make_expert_batch(ds: StateARDataset, num_envs: int, rng) -> dict:
    """Sample num_envs expert windows -> time-major batched expert arrays
    ((T, B, ...)) for the vectorized env."""
    items = [ds.sample_seq(int(rng.randint(len(ds)))) for _ in range(num_envs)]
    batch = {}
    for key in ("qpos", "head_pose", "head_vels"):
        batch[key] = jnp.asarray(
            np.stack([it[key] for it in items], axis=1)  # (T, B, D)
        )
    return batch


def build_from_config(cfg: KinpolyConfig, rest_offsets, num_envs: int = 16):
    """(env, agent) from a statear YAML's policy_specs
    (statear_smpl_config.py model/policy groups)."""
    ps = cfg.policy_specs
    env = KinematicHumanoidEnv(
        rest_offsets,
        reward_id=ps.get("reward_id", "dynamic_supervision_v3"),
        reward_weights=ps.get("reward_weights"),
    )
    ppo_cfg = PPOConfig(
        gamma=float(ps.get("gamma", 0.95)),
        gae_lambda=float(ps.get("tau", 0.95)),
        clip_eps=float(ps.get("clip_epsilon", 0.2)),
        policy_lr=float(ps.get("policy_lr", 5e-5)),
        value_lr=float(ps.get("value_lr", 3e-4)),
        epochs=int(ps.get("num_optim_epoch", 5)),
    )
    hsize = tuple(ps.get("policy_hsize", [512, 256]))
    agent = PPOAgent(env, ppo_cfg, hsize=hsize,
                     log_std_init=float(ps.get("log_std", -2.3)))
    return env, agent


def train(cfg_path: str, expert_path: str, rest_offsets, iters: int = 100,
          num_envs: int = 16, seed: int = 0, save_dir: str | None = None,
          save_interval: int = 50, log_every: int = 10,
          init_policy_params=None, takes: list[str] | None = None) -> dict:
    """init_policy_params: warm-start the actor (the reference's AgentAR
    fine-tunes a supervised-pretrained ARNet policy, agent_ar.py — PPO from
    a random 80-dim absolute-pose actor has no reward signal).

    takes: optional take-name whitelist for the expert dataset — the
    statear TRAINING protocol samples windows across a cfg-resolved take
    LIST (statear_smpl_dataset.py:31), not a single sequence."""
    cfg = KinpolyConfig(cfg_path)
    env, agent = build_from_config(cfg, rest_offsets, num_envs)
    fr_num = int(cfg.get("fr_num", 90))
    ds = StateARDataset(expert_path, fr_num=fr_num, train=True, seed=seed,
                        takes=takes)
    assert len(ds) > 0, f"no expert windows of length {fr_num} in {expert_path}"

    rng = np.random.RandomState(seed)
    key = jax.random.PRNGKey(seed)
    key, k_init = jax.random.split(key)
    state = agent.init_state(k_init)
    if init_policy_params is not None:
        state["policy"] = init_policy_params
        state["p_opt"] = agent.p_opt.init(init_policy_params)

    history = []
    for it in range(iters):
        expert = make_expert_batch(ds, num_envs, rng)
        env_state = env.reset(expert["qpos"][0])
        key, k_it = jax.random.split(key)
        state, _, metrics = agent.iterate(state, k_it, env_state, expert)
        metrics = {k: float(v) for k, v in metrics.items()}
        history.append(metrics)
        if (it + 1) % log_every == 0 or it == 0:
            print(
                f"iter {it}: reward {metrics['reward_mean']:.4f} "
                f"alive {metrics['episode_alive']:.2f} "
                f"ploss {metrics['policy_loss']:.4f}"
            )
        if save_dir and ((it + 1) % save_interval == 0 or it + 1 == iters):
            import orbax.checkpoint as ocp

            path = os.path.join(os.path.abspath(save_dir), f"iter-{it + 1}")
            ocp.PyTreeCheckpointer().save(
                path,
                {"policy": jax.tree.map(np.asarray, state["policy"]),
                 "value": jax.tree.map(np.asarray, state["value"])},
                force=True,
            )
    return {"state": state, "history": history}


def parse_opt(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", required=True, help="statear experiment YAML")
    p.add_argument("--expert_path", required=True)
    p.add_argument("--smplh_path", default=None)
    p.add_argument("--rest_offsets", default=None)
    p.add_argument("--iters", type=int, default=0,
                   help="override policy_specs.max_iter_num")
    p.add_argument("--num_envs", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save_dir", default="./results/agent")
    return p.parse_args(argv)


def main(argv=None):
    opt = parse_opt(argv)
    from egoego_release_tpu.eval.build import load_rest_offsets

    rest = load_rest_offsets(opt.smplh_path, opt.rest_offsets)
    cfg = KinpolyConfig(opt.cfg)
    iters = opt.iters or int(cfg.policy_specs.get("max_iter_num", 100))
    save_interval = int(cfg.policy_specs.get("save_model_interval", 50))
    train(opt.cfg, opt.expert_path, rest, iters=iters, num_envs=opt.num_envs,
          seed=opt.seed, save_dir=opt.save_dir, save_interval=save_interval)


if __name__ == "__main__":
    main()
