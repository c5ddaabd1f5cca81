"""kinpoly dynamic-supervision reward suite: parity against the reference's
OWN reward_function.py (imported via tests/refstubs) + expert-replay ranking
through the kinematic env."""

import os
from types import SimpleNamespace

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as ScipyRot

import reforacle

from egoego_release_tpu.rl import rewards as R

J = 24  # kinpoly body count for bquat vectors


def _ref_reward_module():
    reforacle.add_reference_paths()
    import sys

    if "/root/reference/kinpoly" not in sys.path:
        sys.path.insert(0, "/root/reference/kinpoly")
    import importlib

    return importlib.import_module("relive.core.reward_function")


def _rand_quats(rng, n):
    return ScipyRot.random(n, random_state=rng).as_quat()[:, [3, 0, 1, 2]]


def _fake_env_and_ctx(seed=0, ws=None):
    """One random timestep, exposed both as the reference's duck-typed env
    and as a batched RewardContext (B=1)."""
    rng = np.random.RandomState(seed)
    t = 1

    cur_hpose = np.concatenate([rng.randn(3) * 0.1, _rand_quats(rng, 1)[0]])
    prev_hpos = np.concatenate([rng.randn(3) * 0.1, _rand_quats(rng, 1)[0]])
    tgt_hpose = cur_hpose + np.concatenate([rng.randn(3) * 0.05, rng.randn(4) * 0.02])
    tgt_hpose[3:] /= np.linalg.norm(tgt_hpose[3:])

    def noisy_quats(base, scale):
        q = base + rng.randn(*base.shape) * scale
        return q / np.linalg.norm(q, axis=-1, keepdims=True)

    cur_bquat = _rand_quats(rng, J)
    prev_bquat = noisy_quats(cur_bquat, 0.05)
    tgt_bquat = noisy_quats(cur_bquat, 0.05)
    gt_bquat = noisy_quats(cur_bquat, 0.08)
    gt_prev_bquat = noisy_quats(gt_bquat, 0.05)
    ar_bquat = noisy_quats(cur_bquat, 0.06)
    ar_prev_bquat = noisy_quats(ar_bquat, 0.05)
    cur_wbpos = rng.randn(J, 3) * 0.3
    tgt_wbpos = cur_wbpos + rng.randn(J, 3) * 0.05
    tgt_qpos = np.concatenate([rng.randn(3) * 0.1, _rand_quats(rng, 1)[0], rng.randn(69)])
    ar_qpos = tgt_qpos + np.concatenate([rng.randn(3) * 0.05, rng.randn(4) * 0.02, rng.randn(69)])
    ar_qpos[3:7] /= np.linalg.norm(ar_qpos[3:7])

    ws = ws or {"k_hp": 0.7, "k_hq": 1.3, "k_p": 0.9, "k_jp": 0.2,
                "k_rp": 0.15, "k_rq": 0.2, "k_act_p": 0.3, "k_act_v": 0.05,
                "w_hp": 0.8, "w_hq": 1.2, "w_p": 0.9, "w_jp": 1.1,
                "w_act_p": 0.7, "w_act_v": 0.6, "v_ord": 2}

    env = SimpleNamespace(
        cfg=SimpleNamespace(policy_specs={"reward_weights": ws}),
        cur_t=t,
        dt=1.0 / 30.0,
        prev_hpos=prev_hpos,
        prev_bquat=prev_bquat.flatten(),
        get_head=lambda: cur_hpose,
        get_body_quat=lambda: cur_bquat.flatten(),
        get_wbody_pos=lambda: cur_wbpos.flatten(),
        target={"bquat": tgt_bquat, "wbpos": tgt_wbpos, "qpos": tgt_qpos},
        ar_context={
            "head_pose": np.stack([prev_hpos, tgt_hpose]),
            "head_vels": rng.randn(2, 6),  # read but unused by v3 (:1095)
            "bquat": np.stack([gt_prev_bquat, gt_bquat]),
            "ar_qpos": np.stack([ar_qpos, ar_qpos]),
            "ar_bquat": np.stack([ar_prev_bquat, ar_bquat]),
        },
    )

    ctx = R.RewardContext(
        cur_hpose=jnp.asarray(cur_hpose, jnp.float32)[None],
        tgt_hpose=jnp.asarray(tgt_hpose)[None],
        cur_bquat=jnp.asarray(cur_bquat)[None],
        prev_bquat=jnp.asarray(prev_bquat)[None],
        cur_wbpos=jnp.asarray(cur_wbpos)[None],
        tgt_bquat=jnp.asarray(tgt_bquat)[None],
        tgt_wbpos=jnp.asarray(tgt_wbpos)[None],
        tgt_qpos=jnp.asarray(tgt_qpos)[None],
        ar_qpos=jnp.asarray(ar_qpos)[None],
        ar_bquat=jnp.asarray(ar_bquat)[None],
        ar_prev_bquat=jnp.asarray(ar_prev_bquat)[None],
        gt_bquat=jnp.asarray(gt_bquat)[None],
        gt_prev_bquat=jnp.asarray(gt_prev_bquat)[None],
        dt=1.0 / 30.0,
    )
    return env, ctx, ws


def test_dynamic_supervision_parity_vs_reference():
    ref = _ref_reward_module()
    for seed in (0, 1):
        env, ctx, ws = _fake_env_and_ctx(seed=seed)
        for name in ("dynamic_supervision_v1", "dynamic_supervision_v3",
                     "dynamic_supervision_v4", "dynamic_supervision_v5",
                     "dynamic_supervision_v6"):
            ref_r, ref_comp = ref.reward_func[name](env, None, None, None)
            ours_r, ours_comp = R.REWARD_FUNCS[name](ctx, ws)
            np.testing.assert_allclose(
                float(ours_r[0]), float(ref_r), rtol=1e-5,
                err_msg=f"{name} seed {seed} total",
            )
            np.testing.assert_allclose(
                np.asarray(ours_comp[0]), np.asarray(ref_comp), rtol=1e-5,
                atol=1e-7, err_msg=f"{name} seed {seed} components",
            )


def test_reward_helpers_vs_reference_math():
    ref = _ref_reward_module()
    import relive.utils.math_utils as mu

    rng = np.random.RandomState(3)
    q1 = _rand_quats(rng, 6)
    q0 = _rand_quats(rng, 6)
    ref_diff = mu.multi_quat_diff(q1.flatten(), q0.flatten()).reshape(6, 4)
    np.testing.assert_allclose(
        np.asarray(R.multi_quat_diff(jnp.asarray(q1), jnp.asarray(q0))),
        ref_diff, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(R.multi_quat_norm_v2(jnp.asarray(ref_diff))),
        mu.multi_quat_norm_v2(ref_diff.flatten()), atol=1e-7,
    )
    ref_av = mu.get_angvel_fd(q0.flatten(), q1.flatten(), 1.0 / 30.0)
    np.testing.assert_allclose(
        np.asarray(R.get_angvel_fd(jnp.asarray(q0), jnp.asarray(q1), 1.0 / 30.0)),
        ref_av, atol=2e-4,  # f32 arccos at large angles; values are O(100)
    )


def test_expert_replay_scores_maximal_v3():
    """With the character exactly on the kinematic target and AR context,
    the multiplicative v3 reward is 1; any perturbation strictly lowers it,
    monotonically in the noise scale."""
    rng = np.random.RandomState(4)
    bquat = jnp.asarray(_rand_quats(rng, J))[None]
    wbpos = jnp.asarray(rng.randn(J, 3))[None]
    hpose = jnp.asarray(
        np.concatenate([rng.randn(3), _rand_quats(rng, 1)[0]])
    )[None]
    qpos = jnp.asarray(
        np.concatenate([rng.randn(3), _rand_quats(rng, 1)[0], rng.randn(69)])
    )[None]

    def ctx_with_noise(scale):
        noise_q = np.asarray(bquat[0]) + rng.randn(J, 4) * scale
        noise_q = noise_q / np.linalg.norm(noise_q, axis=-1, keepdims=True)
        return R.RewardContext(
            cur_hpose=hpose + scale, tgt_hpose=hpose,
            cur_bquat=jnp.asarray(noise_q)[None], prev_bquat=bquat,
            cur_wbpos=wbpos + scale, tgt_bquat=bquat, tgt_wbpos=wbpos,
            tgt_qpos=qpos, ar_qpos=qpos, ar_bquat=bquat,
            ar_prev_bquat=bquat, gt_bquat=bquat, gt_prev_bquat=bquat,
        )

    r_expert, comp = R.dynamic_supervision_v3(ctx_with_noise(0.0))
    np.testing.assert_allclose(float(r_expert[0]), 1.0, atol=1e-5)
    r_small = float(R.dynamic_supervision_v3(ctx_with_noise(0.02))[0][0])
    r_big = float(R.dynamic_supervision_v3(ctx_with_noise(0.2))[0][0])
    assert 1.0 > r_small > r_big


def test_env_reward_ranks_expert_above_perturbed():
    """Expert-replay through the kinematic env with the statear production
    reward: actions that reproduce the expert trajectory collect strictly
    more reward than noise-perturbed ones."""
    from egoego_release_tpu.models.trajar import QPOS_DIM
    from egoego_release_tpu.ops import heading as heading_mod
    from egoego_release_tpu.ops import rotations as rot
    from egoego_release_tpu.rl.env import KinematicHumanoidEnv

    rng = np.random.RandomState(5)
    t_total, dt = 6, 1.0 / 30.0
    rest_offsets = rng.uniform(-0.2, 0.2, (22, 3)).astype(np.float32)
    rest_offsets[0] = 0.0

    # smooth expert qpos trajectory
    qpos = np.zeros((t_total, QPOS_DIM), np.float32)
    qpos[:, :3] = np.cumsum(rng.uniform(-0.02, 0.02, (t_total, 3)), axis=0)
    q = ScipyRot.random(random_state=rng)
    eul = rng.uniform(-0.4, 0.4, 69).astype(np.float32)
    for i in range(t_total):
        q = ScipyRot.from_rotvec(rng.uniform(-0.03, 0.03, 3)) * q
        qpos[i, 3:7] = q.as_quat()[[3, 0, 1, 2]]
        eul = eul + rng.uniform(-0.02, 0.02, 69)
        qpos[i, 7:] = eul

    env = KinematicHumanoidEnv(rest_offsets, dt=dt,
                               reward_id="dynamic_supervision_v3",
                               head_fail_dist=10.0)
    hpos, hrot = env._head_pose(jnp.asarray(qpos))
    expert = {
        "qpos": jnp.asarray(qpos)[:, None],             # (T, B=1, 76)
        "head_pose": jnp.concatenate([hpos, hrot], -1)[:, None],
        "head_vels": jnp.zeros((t_total, 1, 6)),
    }

    def replay_action(curr, nxt):
        """Invert step_qpos: the action that lands exactly on `nxt`."""
        heading = heading_mod.get_heading_quat(curr[3:7])
        v_xy = (nxt[:3] - curr[:3]) / dt
        linv = rot.quat_apply(rot.quat_invert(heading), v_xy)
        qrel = rot.standardize_quat(
            rot.quat_multiply(nxt[3:7], rot.quat_invert(curr[3:7]))
        )
        angv_world = rot.quat_to_axis_angle(qrel) / dt
        angv = rot.quat_apply(rot.quat_invert(curr[3:7]), angv_world)
        return jnp.concatenate(
            [nxt[2:3], nxt[3:7], nxt[7:], linv, angv]
        )

    def rollout(noise_scale, seed):
        nrng = np.random.RandomState(seed)
        state = env.reset(expert["qpos"][0])
        total = 0.0
        for t in range(t_total - 1):
            act = replay_action(jnp.asarray(qpos[t]), jnp.asarray(qpos[t + 1]))
            act = act + nrng.randn(*act.shape).astype(np.float32) * noise_scale
            state, reward, _ = env.step(state, act[None], expert)
            total += float(reward[0])
        return total

    r_expert = rollout(0.0, 0)
    r_noisy = rollout(0.05, 1)
    r_noisier = rollout(0.3, 2)
    assert r_expert > r_noisy > r_noisier
    # exact replay earns ~max reward every step
    assert r_expert > 0.95 * (t_total - 1)


def test_train_agent_from_statear_config(tmp_path):
    """The agent training loop driven by a statear YAML: reward_id and
    policy_specs are honored, PPO iterations produce finite metrics, and a
    checkpoint lands on disk (agent_ar.py loop, policy_specs from
    statear_smpl_config.py)."""
    import joblib
    import yaml

    from egoego_release_tpu.models.trajar import QPOS_DIM
    from egoego_release_tpu.rl.train_agent import build_from_config, train
    from egoego_release_tpu.utils.config import KinpolyConfig

    rng = np.random.RandomState(0)
    t = 12
    qpos = np.zeros((t, QPOS_DIM), np.float32)
    qpos[:, 3] = 1.0
    qpos[:, :3] = np.cumsum(rng.uniform(-0.01, 0.01, (t, 3)), 0)
    qpos[:, 7:] = rng.uniform(-0.2, 0.2, 69)
    rec = {
        "qpos": qpos,
        "qvel": rng.randn(t - 1, 75).astype(np.float32) * 0.01,
        "head_pose": np.concatenate(
            [rng.randn(t, 3) * 0.05, np.tile([1.0, 0, 0, 0], (t, 1))], -1
        ).astype(np.float32),
        "head_vels": rng.randn(t, 6).astype(np.float32) * 0.01,
        "obj_pose": rng.randn(t, 7).astype(np.float32),
        "obj_head_relative_poses": rng.randn(t, 7).astype(np.float32),
        "seq_name": "t1",
    }
    expert_path = str(tmp_path / "experts.p")
    joblib.dump({"t1": rec}, expert_path)

    cfg_d = {
        "fr_num": 8,
        "policy_specs": {
            "reward_id": "dynamic_supervision_v4",
            "reward_weights": {"k_hp": 2.0, "k_p": 1.0},
            "gamma": 0.9, "tau": 0.9, "clip_epsilon": 0.1,
            "policy_lr": 1e-4, "value_lr": 1e-3, "num_optim_epoch": 2,
            "policy_hsize": [32, 16],
        },
    }
    cfg_path = str(tmp_path / "exp.yml")
    yaml.safe_dump(cfg_d, open(cfg_path, "w"))

    rest = rng.uniform(-0.2, 0.2, (22, 3)).astype(np.float32)
    rest[0] = 0.0
    env, agent = build_from_config(KinpolyConfig(cfg_path), rest, num_envs=2)
    assert env.reward_id == "dynamic_supervision_v4"
    assert agent.cfg.clip_eps == 0.1

    out = train(cfg_path, expert_path, rest, iters=2, num_envs=2, seed=0,
                save_dir=str(tmp_path / "agent"), save_interval=2)
    assert len(out["history"]) == 2
    for m in out["history"]:
        assert np.isfinite(m["reward_mean"]) and np.isfinite(m["policy_loss"])
    assert os.path.isdir(tmp_path / "agent" / "iter-2")
