"""The two-level AR -> physics loop (ARPhysicsSession) on real MuJoCo.

Covers rl/ar_session.py against the HumanoidAREnv.step semantics
(humanoid_ar_v1.py:554-650): step_ar target integration, cc-policy
dispatch on the exact cc_obs layout, PD-simulated stepping, the
train-mode GT-divergence guard, episode termination, and ar_fail_safe.
"""

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

from egoego_release_tpu.rl.ar_session import ARPhysicsSession  # noqa: E402

XML = "/root/reference/kinpoly/assets/mujoco_models/humanoid_smpl_neutral_mesh.xml"


def _context(rng, t=8, nq=76):
    qpos = np.zeros((t, nq))
    qpos[:, 2], qpos[:, 3] = 0.91, 1.0
    qpos[:, 7:] = 0.02 * rng.randn(t, nq - 7)
    return {
        "qpos": qpos,
        "head_pose": np.concatenate(
            [rng.randn(t, 3) * 0.05 + [0, 0, 1.6],
             np.tile([1.0, 0, 0, 0], (t, 1))], axis=1),
        "head_vels": rng.randn(t, 6) * 0.01,
        "obj_head_relative_poses": rng.randn(t, 7) * 0.01,
    }


def _hold_action(qpos):
    """AR action that re-targets the current pose with zero root velocity
    (step_ar layout: [z, quat, eulers(69), root qvel(6)])."""
    return np.concatenate([qpos[2:], np.zeros(6)]).astype(np.float32)


@pytest.fixture(scope="module")
def sess():
    rng = np.random.RandomState(0)
    w = 0.01 * rng.randn(715, 75)  # cc_obs v1 -> ndof linear policy

    def cc_policy(obs):
        return obs @ w

    s = ARPhysicsSession(XML, cc_policy, episode_len=6, residual_force=False)
    return s


def test_ar_loop_runs_to_episode_end(sess):
    rng = np.random.RandomState(1)
    ctx = _context(rng)
    sess.set_context(ctx)
    sess.reset(ctx["qpos"][0])
    steps = 0
    done = False
    while not done and steps < 10:
        ar_obs, r, done, info = sess.step(_hold_action(sess.env.get_qpos()))
        assert np.isfinite(r) and np.isfinite(ar_obs).all()
        assert info["cc_obs"].shape == (715,)  # relive v1 layout
        assert "body_gt_diff" in info  # train-mode guard active
        steps += 1
    assert done and steps <= 6
    assert info["end"] or info["fail"]


def test_policy_v2_direct_target(sess):
    rng = np.random.RandomState(2)
    ctx = _context(rng)
    sess.set_context(ctx)
    sess.reset(ctx["qpos"][0])
    _, r, done, info = sess.step(target_qpos=ctx["qpos"][1])
    assert np.isfinite(r)
    assert info["percent"] == pytest.approx(1 / 8)


def test_gt_divergence_guard_fails_far_targets(sess):
    """A context whose GT poses are far away trips body_gt_diff > 12."""
    rng = np.random.RandomState(3)
    ctx = _context(rng)
    ctx["qpos"] = ctx["qpos"].copy()
    ctx["qpos"][:, :2] += 50.0  # GT 50 m away
    sess.set_context(ctx)
    sess.reset(np.concatenate([[0, 0, 0.91, 1.0], np.zeros(72)]))
    _, _, done, info = sess.step(_hold_action(sess.env.get_qpos()))
    assert info["fail"] and done and info["body_gt_diff"] > 12


def test_ar_fail_safe_resets_to_playback(sess):
    rng = np.random.RandomState(4)
    ctx = _context(rng)
    ctx["ar_qpos"] = ctx["qpos"] + 0.0
    sess.set_context(ctx)
    sess.reset(ctx["qpos"][0])
    sess.step(_hold_action(sess.env.get_qpos()))
    sess.ar_fail_safe()
    t = min(sess.cur_t + 1, 7)
    np.testing.assert_allclose(sess.env.get_qpos(), ctx["ar_qpos"][t],
                               atol=1e-12)


def test_target_dict_matches_real_mujoco(sess):
    """_target_dict's wbpos/wbquat/body_com (FK + body_ipos offsets) match a
    real MuJoCo replay of the same qpos (xpos/xquat/xipos)."""
    rng = np.random.RandomState(8)
    nq = sess.env.model.nq
    q = np.zeros(nq)
    q[:3] = [0.3, -0.2, 0.95]
    quat = rng.randn(4)
    q[3:7] = quat / np.linalg.norm(quat)
    q[7:] = 0.2 * rng.randn(nq - 7)

    tgt = sess._target_dict(q)

    sess.env.data.qpos[:] = q
    mujoco.mj_kinematics(sess.env.model, sess.env.data)
    nb = tgt["wbpos"].reshape(-1, 3).shape[0]
    np.testing.assert_allclose(
        tgt["wbpos"].reshape(-1, 3), sess.env.data.xpos[1:nb + 1], atol=2e-5)
    ref_q = sess.env.data.xquat[1:nb + 1]
    ours_q = tgt["wbquat"].reshape(-1, 4)
    # quats match up to sign
    dots = np.abs((ref_q * ours_q).sum(1))
    np.testing.assert_allclose(dots, 1.0, atol=2e-5)
    np.testing.assert_allclose(
        tgt["body_com"].reshape(-1, 3), sess.env.data.xipos[1:nb + 1],
        atol=2e-5)


def test_ar_agent_ppo_iterates():
    """ARAgentPPO: one PPO iteration of the AR policy through the physics
    loop (frozen cc policy) moves the policy parameters."""
    import jax

    from egoego_release_tpu.rl.train_physics_agent import ARAgentPPO

    rng = np.random.RandomState(6)
    w = 0.01 * rng.randn(715, 75)
    # an untrained (random-init) AR policy emits garbage absolute poses, so
    # disable the divergence guards to exercise multi-step credit assignment
    # (the reference warm-starts from the supervised ARNet instead)
    sess = ARPhysicsSession(XML, lambda o: o @ w, episode_len=4,
                            residual_force=False, body_diff_fail=np.inf)
    ctx = _context(rng)
    sess.set_context(ctx)
    sess.reset(ctx["qpos"][0])
    obs_dim = sess.ar_obs().shape[0]

    agent = ARAgentPPO(sess, obs_dim=obs_dim, hsize=(32, 16), epochs=2)
    assert agent.action_dim == 80
    key = jax.random.PRNGKey(0)
    key, k0 = jax.random.split(key)
    state = agent.init_state(k0)
    before = jax.tree.map(np.copy, state["policy"])
    state, key, m = agent.iterate(state, key, ctx, horizon=4)
    assert np.isfinite(m["reward_mean"]) and np.isfinite(m["policy_loss"])
    moved = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        before, state["policy"])
    assert max(jax.tree.leaves(moved)) > 0


def test_v3_reward_through_ar_session():
    """dynamic_supervision_v3 (the statear production reward) gets its AR
    context terms from the step_ar output inside the session."""
    rng = np.random.RandomState(7)
    w = 0.01 * rng.randn(715, 75)
    s = ARPhysicsSession(XML, lambda o: o @ w,
                         reward_id="dynamic_supervision_v3", episode_len=3,
                         residual_force=False)
    ctx = _context(rng)
    s.set_context(ctx)
    s.reset(ctx["qpos"][0])
    _, r1, _, _ = s.step(_hold_action(s.env.get_qpos()))
    _, r2, _, _ = s.step(_hold_action(s.env.get_qpos()))
    assert np.isfinite(r1) and np.isfinite(r2)
    assert 0.0 < r1 <= 1.0


def test_uhc_reward_session():
    """The session also drives the UHC/sim reward families (set_expert on
    reset)."""
    rng = np.random.RandomState(5)
    w = 0.01 * rng.randn(715, 75)
    s = ARPhysicsSession(XML, lambda o: o @ w,
                         reward_id="world_rfc_implicit", episode_len=3,
                         residual_force=False)
    ctx = _context(rng)
    s.set_context(ctx)
    s.reset(ctx["qpos"][0])
    _, r, done, info = s.step(_hold_action(s.env.get_qpos()))
    assert 0.0 < r <= 1.0
    assert info["components"].shape == (5,)
