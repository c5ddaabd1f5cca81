"""RL subset: env semantics, GAE vs numpy oracle, PPO improves reward."""

import numpy as np
import jax
import jax.numpy as jnp

from egoego_release_tpu.rl.env import KinematicHumanoidEnv
from egoego_release_tpu.rl.ppo import PPOAgent, PPOConfig, gae_advantages


def make_expert(t=40, b=4, seed=0):
    rng = np.random.RandomState(seed)
    qpos = np.zeros((t, b, 76), np.float32)
    qpos[:, :, 3] = 1.0
    qpos[:, :, 2] = 0.9
    head_pose = np.zeros((t, b, 7), np.float32)
    head_pose[:, :, 2] = 1.6
    head_pose[:, :, 3] = 1.0
    head_vels = np.zeros((t, b, 6), np.float32)
    return {
        "qpos": jnp.asarray(qpos),
        "head_pose": jnp.asarray(head_pose),
        "head_vels": jnp.asarray(head_vels),
    }


def make_env(seed=1):
    rng = np.random.RandomState(seed)
    rest = rng.randn(22, 3).astype(np.float32) * 0.05
    rest[0] = 0
    return KinematicHumanoidEnv(rest)


def test_env_step_shapes_and_termination():
    env = make_env()
    expert = make_expert()
    state = env.reset(expert["qpos"][0])
    obs = env.obs(state, expert)
    assert obs.shape == (4, env.obs_dim)

    action = jnp.zeros((4, env.action_dim))
    state2, reward, done = env.step(state, action, expert)
    assert reward.shape == (4,) and done.shape == (4,)
    assert np.all(np.asarray(reward) > 0)

    # huge root velocity flies away from the expert head -> fail_safe
    bad = action.at[:, 74:77].set(1000.0)
    s = state
    for _ in range(3):
        s, r, d = env.step(s, bad, expert)
    assert np.asarray(d).all()
    # after done, state freezes and reward is zero
    s2, r2, _ = env.step(s, bad, expert)
    np.testing.assert_array_equal(np.asarray(s2.qpos), np.asarray(s.qpos))
    assert np.all(np.asarray(r2) == 0)


def test_gae_matches_numpy_oracle():
    rng = np.random.RandomState(2)
    t, b = 7, 3
    rewards = rng.randn(t, b).astype(np.float32)
    values = rng.randn(t, b).astype(np.float32)
    last_value = rng.randn(b).astype(np.float32)
    dones = (rng.rand(t, b) < 0.2)
    gamma, lam = 0.95, 0.9

    advs, rets = gae_advantages(
        jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(last_value),
        jnp.asarray(dones), gamma, lam,
    )

    # numpy oracle: backward recursion
    advs_o = np.zeros((t, b))
    next_adv = np.zeros(b)
    next_val = last_value
    for i in reversed(range(t)):
        nonterm = 1.0 - dones[i].astype(np.float32)
        delta = rewards[i] + gamma * next_val * nonterm - values[i]
        next_adv = delta + gamma * lam * nonterm * next_adv
        advs_o[i] = next_adv
        next_val = values[i]
    np.testing.assert_allclose(np.asarray(advs), advs_o, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rets), advs_o + values, atol=1e-5)


def test_ppo_improves_reward():
    rng = np.random.RandomState(1)
    rest = rng.randn(22, 3).astype(np.float32) * 0.05
    rest[0] = 0
    # no fail termination + gentle reward scales -> dense learning signal
    env = KinematicHumanoidEnv(rest, head_fail_dist=1000.0, k_head=1.0, k_pose=1.0)
    expert = make_expert(t=20)
    # make the expert head pose consistent with the env's own FK so the
    # optimal behavior (track the expert) is actually achievable
    hpos, hrot = env._head_pose(expert["qpos"].reshape(-1, 76))
    head = jnp.concatenate([hpos, hrot], -1).reshape(20, 4, 7)
    expert = dict(expert, head_pose=head)
    agent = PPOAgent(env, PPOConfig(horizon=16, policy_lr=3e-4, value_lr=1e-3,
                                    epochs=3), hsize=(64,))
    state = agent.init_state(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)

    rewards = []
    for i in range(15):
        key, sk = jax.random.split(key)
        env_state = env.reset(expert["qpos"][0])
        state, _, metrics = agent.iterate(state, sk, env_state, expert)
        rewards.append(float(metrics["reward_mean"]))
    assert np.isfinite(rewards).all()
    # learning signal: later iterations beat the first ones on average
    assert np.mean(rewards[-3:]) > np.mean(rewards[:3])


def test_trpo_update_respects_kl_and_improves():
    from egoego_release_tpu.rl.trpo import TRPOAgent, TRPOConfig

    rng = np.random.RandomState(1)
    rest = rng.randn(22, 3).astype(np.float32) * 0.05
    rest[0] = 0
    env = KinematicHumanoidEnv(rest, head_fail_dist=1000.0, k_head=1.0, k_pose=1.0)
    expert = make_expert(t=20)
    hpos, hrot = env._head_pose(expert["qpos"].reshape(-1, 76))
    expert = dict(expert, head_pose=jnp.concatenate([hpos, hrot], -1).reshape(20, 4, 7))

    agent = TRPOAgent(env, TRPOConfig(horizon=12, cg_iters=5, value_epochs=2,
                                      max_kl=1e-2), hsize=(32,))
    state = agent.init_state(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    rewards, kls = [], []
    for _ in range(8):
        key, sk = jax.random.split(key)
        env_state = env.reset(expert["qpos"][0])
        state, _, m = agent.iterate(state, sk, env_state, expert)
        rewards.append(float(m["reward_mean"]))
        kls.append(float(m["kl"]))
    assert np.isfinite(rewards).all()
    # trust region: accepted steps keep KL below the bound
    assert max(kls) <= 1e-2 + 1e-4
    assert np.mean(rewards[-2:]) >= np.mean(rewards[:2]) - 1e-3


def test_zfilter_matches_batch_stats():
    from egoego_release_tpu.rl.trpo import ZFilter

    rng = np.random.RandomState(3)
    state = ZFilter.init(5)
    chunks = [rng.randn(20, 5).astype(np.float32) * 3 + 1 for _ in range(4)]
    for c in chunks:
        state = ZFilter.update(state, jnp.asarray(c))
    allx = np.concatenate(chunks)
    np.testing.assert_allclose(np.asarray(state["mean"]), allx.mean(0), atol=1e-4)
    std = np.sqrt(np.asarray(state["m2"]) / allx.shape[0])
    np.testing.assert_allclose(std, allx.std(0), atol=1e-2)
    normed = np.asarray(ZFilter.apply(state, jnp.asarray(allx)))
    assert abs(normed.mean()) < 0.05 and abs(normed.std() - 1.0) < 0.1
