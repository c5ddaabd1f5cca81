"""PPO over the vectorized kinematic humanoid env.

TPU-native subset of khrylib's RL core
(kinpoly/copycat/khrylib/rl/agents/{agent,agent_ppo}.py, policy_gaussian.py,
critic.py, core/common.py GAE): a diagonal-Gaussian MLP policy + value MLP,
GAE(λ) advantages, and the clipped PPO objective — with rollouts as
lax.scan over time and vmap over envs (the reference farms rollouts to CPU
multiprocessing workers; here the whole iteration — rollout, advantage
computation, minibatch updates — is jitted).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import flax.linen as nn
import optax

from egoego_release_tpu.models.mlp import MLP
from egoego_release_tpu.rl.env import EnvState, KinematicHumanoidEnv


class GaussianPolicy(nn.Module):
    """MLP -> mean; state-independent log_std (policy_gaussian.py)."""

    action_dim: int
    hsize: tuple[int, ...] = (512, 256)
    log_std_init: float = -2.3

    @nn.compact
    def __call__(self, obs):
        mean = nn.Dense(self.action_dim, name="fc")(MLP(self.hsize, "relu")(obs))
        log_std = self.param(
            "log_std", lambda _: jnp.full((self.action_dim,), self.log_std_init)
        )
        return mean, log_std


def _scaled_lecun(scale: float):
    base = nn.initializers.lecun_uniform()
    return lambda key, shape, dtype=jnp.float32: base(key, shape, dtype) * scale


class MCPPolicy(nn.Module):
    """Mixture-of-primitives actor (copycat/core/policy_mcp.py:9-38, the
    UHC configs' actor_type "mcp" with num_primitive 8): K primitive MLPs
    each emitting an action mean (output layer down-scaled 0.1x like the
    reference's weight.mul_(0.1)), blended by a softmax composer MLP;
    state-independent log_std.  Same (mean, log_std) interface as
    GaussianPolicy, so it drops into both PPO trainers."""

    action_dim: int
    num_primitive: int = 8
    hsize: tuple[int, ...] = (512, 256)      # copycat.yml policy_hsize
    composer_hsize: tuple[int, ...] = (300, 200)
    log_std_init: float = -2.3

    @nn.compact
    def __call__(self, obs):
        means = jnp.stack(
            [
                nn.Dense(self.action_dim, kernel_init=_scaled_lecun(0.1),
                         bias_init=nn.initializers.zeros,
                         name=f"primitive_{i}_out")(
                    MLP(self.hsize, "relu", name=f"primitive_{i}")(obs)
                )
                for i in range(self.num_primitive)
            ],
            axis=-2,
        )                                               # (..., K, A)
        logits = nn.Dense(self.num_primitive, name="composer_out")(
            MLP(self.composer_hsize, "relu", name="composer")(obs)
        )
        weight = jax.nn.softmax(logits, axis=-1)        # (..., K)
        mean = jnp.sum(weight[..., None] * means, axis=-2)
        log_std = self.param(
            "log_std", lambda _: jnp.full((self.action_dim,), self.log_std_init)
        )
        return mean, log_std


def make_policy(action_dim: int, hsize=(512, 256), actor_type: str = "gauss",
                num_primitive: int = 8, log_std_init: float = -2.3):
    """actor_type 'gauss' (relive PolicyGaussian) or 'mcp' (UHC PolicyMCP)."""
    if actor_type == "mcp":
        return MCPPolicy(action_dim, num_primitive=num_primitive,
                         hsize=tuple(hsize), log_std_init=log_std_init)
    return GaussianPolicy(action_dim, tuple(hsize), log_std_init)


class ValueNet(nn.Module):
    hsize: tuple[int, ...] = (512, 256)

    @nn.compact
    def __call__(self, obs):
        return nn.Dense(1, name="fc")(MLP(self.hsize, "relu")(obs))[..., 0]


@dataclass(frozen=True)
class PPOConfig:
    horizon: int = 32
    gamma: float = 0.95
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    policy_lr: float = 5e-5
    value_lr: float = 3e-4
    epochs: int = 5


def gaussian_logprob(mean, log_std, action):
    var = jnp.exp(2 * log_std)
    return jnp.sum(
        -0.5 * ((action - mean) ** 2 / var + 2 * log_std + jnp.log(2 * jnp.pi)),
        axis=-1,
    )


def gae_advantages(rewards, values, last_value, dones, gamma, lam):
    """GAE(λ) over (T, B) arrays (core/common.py estimate_advantages)."""

    def scan_fn(carry, x):
        adv_next, v_next = carry
        r, v, d = x
        nonterminal = 1.0 - d.astype(jnp.float32)
        delta = r + gamma * v_next * nonterminal - v
        adv = delta + gamma * lam * nonterminal * adv_next
        return (adv, v), adv

    (_, _), advs = jax.lax.scan(
        scan_fn,
        (jnp.zeros_like(last_value), last_value),
        (rewards, values, dones),
        reverse=True,
    )
    return advs, advs + values  # advantages, returns


class PPOAgent:
    def __init__(self, env: KinematicHumanoidEnv, cfg: PPOConfig = PPOConfig(),
                 hsize=(512, 256), log_std_init: float = -2.3):
        self.env = env
        self.cfg = cfg
        self.policy = GaussianPolicy(env.action_dim, hsize, log_std_init)
        self.value = ValueNet(hsize)
        self.p_opt = optax.adam(cfg.policy_lr)
        self.v_opt = optax.adam(cfg.value_lr)
        self._iterate = jax.jit(self._iterate_impl)

    def init_state(self, key):
        obs0 = jnp.zeros((1, self.env.obs_dim))
        kp, kv = jax.random.split(key)
        p_params = self.policy.init(kp, obs0)
        v_params = self.value.init(kv, obs0)
        return {
            "policy": p_params,
            "value": v_params,
            "p_opt": self.p_opt.init(p_params),
            "v_opt": self.v_opt.init(v_params),
        }

    def _rollout(self, params, key, env_state: EnvState, expert):
        def step_fn(carry, _):
            env_state, k = carry
            k, ka = jax.random.split(k)
            obs = self.env.obs(env_state, expert)
            mean, log_std = self.policy.apply(params["policy"], obs)
            action = mean + jnp.exp(log_std) * jax.random.normal(ka, mean.shape)
            logp = gaussian_logprob(mean, log_std, action)
            value = self.value.apply(params["value"], obs)
            new_state, reward, done = self.env.step(env_state, action, expert)
            return (new_state, k), (obs, action, logp, value, reward, done)

        (final_state, _), traj = jax.lax.scan(
            step_fn, (env_state, key), None, length=self.cfg.horizon
        )
        return final_state, traj

    def _iterate_impl(self, state, key, env_state: EnvState, expert):
        cfg = self.cfg
        k_roll, k_up = jax.random.split(key)
        final_env, (obs, actions, logps, values, rewards, dones) = self._rollout(
            state, k_roll, env_state, expert
        )
        last_value = self.value.apply(state["value"], self.env.obs(final_env, expert))
        advs, returns = gae_advantages(
            rewards, values, last_value, dones, cfg.gamma, cfg.gae_lambda
        )
        advs_n = (advs - advs.mean()) / (advs.std() + 1e-8)

        flat = lambda x: x.reshape((-1,) + x.shape[2:])
        obs_f, act_f, logp_f = flat(obs), flat(actions), flat(logps)
        adv_f, ret_f = flat(advs_n), flat(returns)

        def policy_loss(p):
            mean, log_std = self.policy.apply(p, obs_f)
            logp_new = gaussian_logprob(mean, log_std, act_f)
            ratio = jnp.exp(logp_new - logp_f)
            clipped = jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps)
            return -jnp.mean(jnp.minimum(ratio * adv_f, clipped * adv_f))

        def value_loss(p):
            return jnp.mean((self.value.apply(p, obs_f) - ret_f) ** 2)

        def epoch(carry, _):
            p_params, v_params, p_opt, v_opt = carry
            pl, pg = jax.value_and_grad(policy_loss)(p_params)
            pu, p_opt = self.p_opt.update(pg, p_opt, p_params)
            p_params = optax.apply_updates(p_params, pu)
            vl, vg = jax.value_and_grad(value_loss)(v_params)
            vu, v_opt = self.v_opt.update(vg, v_opt, v_params)
            v_params = optax.apply_updates(v_params, vu)
            return (p_params, v_params, p_opt, v_opt), (pl, vl)

        (p_params, v_params, p_opt, v_opt), losses = jax.lax.scan(
            epoch, (state["policy"], state["value"], state["p_opt"], state["v_opt"]),
            None, length=cfg.epochs,
        )
        new_state = {"policy": p_params, "value": v_params,
                     "p_opt": p_opt, "v_opt": v_opt}
        metrics = {
            "reward_mean": rewards.mean(),
            "episode_alive": 1.0 - dones[-1].mean(),
            "policy_loss": losses[0][-1],
            "value_loss": losses[1][-1],
        }
        return new_state, final_env, metrics

    def iterate(self, state, key, env_state, expert):
        """One PPO iteration (rollout horizon + epochs of updates), jitted."""
        expert = self.env.prepare_expert(expert)   # FK once, not per step
        return self._iterate(state, key, env_state, expert)
