"""TRPO over the vectorized kinematic humanoid env.

Covers khrylib's TRPO agent (kinpoly/copycat/khrylib/rl/agents/agent_trpo.py):
natural-gradient policy update via conjugate-gradient on the Fisher
(KL-Hessian) vector product, with a backtracking line search enforcing the
KL trust region — all as pure-JAX pytree math (the reference flattens to a
single torch vector; here jax.flatten_util does the same).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree

from egoego_release_tpu.rl.env import KinematicHumanoidEnv
from egoego_release_tpu.rl.ppo import (
    GaussianPolicy,
    ValueNet,
    gae_advantages,
    gaussian_logprob,
)


@dataclass(frozen=True)
class TRPOConfig:
    horizon: int = 32
    gamma: float = 0.95
    gae_lambda: float = 0.95
    max_kl: float = 1e-2
    cg_iters: int = 10
    cg_damping: float = 1e-2
    backtrack_coeff: float = 0.8
    backtrack_iters: int = 10
    value_lr: float = 3e-4
    value_epochs: int = 5


def gaussian_kl(mean0, log_std0, mean1, log_std1):
    """KL(pi0 || pi1) for diagonal gaussians, mean over batch."""
    var0, var1 = jnp.exp(2 * log_std0), jnp.exp(2 * log_std1)
    kl = log_std1 - log_std0 + (var0 + (mean0 - mean1) ** 2) / (2 * var1) - 0.5
    return jnp.sum(kl, axis=-1).mean()


def conjugate_gradient(fvp, b, iters: int):
    """Solve F x = b with CG; fvp is the Fisher-vector product."""

    def body(carry, _):
        x, r, p, rdotr = carry
        fp = fvp(p)
        alpha = rdotr / (jnp.dot(p, fp) + 1e-8)
        x = x + alpha * p
        r = r - alpha * fp
        new_rdotr = jnp.dot(r, r)
        p = r + (new_rdotr / (rdotr + 1e-8)) * p
        return (x, r, p, new_rdotr), None

    x0 = jnp.zeros_like(b)
    (x, _, _, _), _ = jax.lax.scan(body, (x0, b, b, jnp.dot(b, b)), None, length=iters)
    return x


class TRPOAgent:
    def __init__(self, env: KinematicHumanoidEnv, cfg: TRPOConfig = TRPOConfig(),
                 hsize=(512, 256)):
        self.env = env
        self.cfg = cfg
        self.policy = GaussianPolicy(env.action_dim, hsize)
        self.value = ValueNet(hsize)
        self.v_opt = optax.adam(cfg.value_lr)
        self._update = jax.jit(self._update_impl)

    def init_state(self, key):
        obs0 = jnp.zeros((1, self.env.obs_dim))
        kp, kv = jax.random.split(key)
        v_params = self.value.init(kv, obs0)
        return {
            "policy": self.policy.init(kp, obs0),
            "value": v_params,
            "v_opt": self.v_opt.init(v_params),
        }

    def _rollout(self, state, key, env_state, expert):
        def step_fn(carry, _):
            env_state, k = carry
            k, ka = jax.random.split(k)
            obs = self.env.obs(env_state, expert)
            mean, log_std = self.policy.apply(state["policy"], obs)
            action = mean + jnp.exp(log_std) * jax.random.normal(ka, mean.shape)
            logp = gaussian_logprob(mean, log_std, action)
            value = self.value.apply(state["value"], obs)
            new_state, reward, done = self.env.step(env_state, action, expert)
            return (new_state, k), (obs, action, logp, value, reward, done)

        (final, _), traj = jax.lax.scan(
            step_fn, (env_state, key), None, length=self.cfg.horizon
        )
        return final, traj

    def _update_impl(self, state, key, env_state, expert):
        cfg = self.cfg
        final_env, (obs, actions, logps, values, rewards, dones) = self._rollout(
            state, key, env_state, expert
        )
        last_value = self.value.apply(state["value"], self.env.obs(final_env, expert))
        advs, returns = gae_advantages(
            rewards, values, last_value, dones, cfg.gamma, cfg.gae_lambda
        )
        advs = (advs - advs.mean()) / (advs.std() + 1e-8)
        flat = lambda x: x.reshape((-1,) + x.shape[2:])
        obs_f, act_f, logp_f, adv_f, ret_f = map(
            flat, (obs, actions, logps, advs, returns)
        )

        p0, unravel = ravel_pytree(state["policy"])
        mean0, log_std0 = self.policy.apply(state["policy"], obs_f)
        mean0 = jax.lax.stop_gradient(mean0)
        log_std0 = jax.lax.stop_gradient(log_std0)

        def surrogate(p_flat):
            p = unravel(p_flat)
            mean, log_std = self.policy.apply(p, obs_f)
            ratio = jnp.exp(gaussian_logprob(mean, log_std, act_f) - logp_f)
            return jnp.mean(ratio * adv_f)

        def kl_fn(p_flat):
            p = unravel(p_flat)
            mean, log_std = self.policy.apply(p, obs_f)
            return gaussian_kl(mean0, log_std0, mean, log_std)

        g = jax.grad(surrogate)(p0)

        def fvp(v):
            return jax.jvp(jax.grad(kl_fn), (p0,), (v,))[1] + cfg.cg_damping * v

        step_dir = conjugate_gradient(fvp, g, cfg.cg_iters)
        shs = 0.5 * jnp.dot(step_dir, fvp(step_dir))
        step_scale = jnp.sqrt(cfg.max_kl / jnp.maximum(shs, 1e-8))
        full_step = step_scale * step_dir
        surr_before = surrogate(p0)

        # backtracking line search under the KL constraint
        def ls_body(carry, i):
            best_p, accepted = carry
            frac = cfg.backtrack_coeff ** i
            cand = p0 + frac * full_step
            improve = surrogate(cand) - surr_before
            kl = kl_fn(cand)
            ok = (improve > 0) & (kl < cfg.max_kl) & (~accepted)
            best_p = jnp.where(ok, cand, best_p)
            return (best_p, accepted | ok), None

        (p_new, accepted), _ = jax.lax.scan(
            ls_body, (p0, jnp.asarray(False)), jnp.arange(cfg.backtrack_iters)
        )

        # value fit
        def value_loss(p):
            return jnp.mean((self.value.apply(p, obs_f) - ret_f) ** 2)

        def v_epoch(carry, _):
            vp, vo = carry
            vl, vg = jax.value_and_grad(value_loss)(vp)
            vu, vo = self.v_opt.update(vg, vo, vp)
            return (optax.apply_updates(vp, vu), vo), vl

        (v_params, v_opt), vls = jax.lax.scan(
            v_epoch, (state["value"], state["v_opt"]), None, length=cfg.value_epochs
        )

        new_state = {"policy": unravel(p_new), "value": v_params, "v_opt": v_opt}
        metrics = {
            "reward_mean": rewards.mean(),
            "kl": kl_fn(p_new),
            "accepted": accepted.astype(jnp.float32),
            "value_loss": vls[-1],
        }
        return new_state, final_env, metrics

    def iterate(self, state, key, env_state, expert):
        expert = self.env.prepare_expert(expert)   # FK once, not per step
        return self._update(state, key, env_state, expert)


class ZFilter:
    """Running mean/std observation normalization (khrylib zfilter) as a
    pure pytree: state = (count, mean, m2), Welford updates."""

    @staticmethod
    def init(dim: int):
        return {
            "count": jnp.zeros(()),
            "mean": jnp.zeros((dim,)),
            "m2": jnp.ones((dim,)),
        }

    @staticmethod
    def update(state, batch):
        """batch: (N, dim)."""
        n = batch.shape[0]
        new_count = state["count"] + n
        delta = batch.mean(0) - state["mean"]
        new_mean = state["mean"] + delta * n / new_count
        new_m2 = state["m2"] + ((batch - state["mean"]) * (batch - new_mean)).sum(0)
        return {"count": new_count, "mean": new_mean, "m2": new_m2}

    @staticmethod
    def apply(state, x, clip: float = 5.0):
        std = jnp.sqrt(state["m2"] / jnp.maximum(state["count"], 1.0))
        return jnp.clip((x - state["mean"]) / (std + 1e-8), -clip, clip)
