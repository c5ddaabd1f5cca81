"""Physics env on modern MuJoCo 3: MJCF conversion, FK parity against the
real simulator, and PD/RFC behavior."""

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

import jax.numpy as jnp

XML = "/root/reference/kinpoly/assets/mujoco_models/humanoid_smpl_neutral_mesh.xml"

UPRIGHT_QUAT = np.asarray([0.7071, 0.7071, 0.0, 0.0])  # kinpoly base_rot


def _standing_qpos(z=0.93):
    qpos = np.zeros(76)
    qpos[:3] = [0.0, 0.0, z]
    qpos[3:7] = UPRIGHT_QUAT
    return qpos


def test_global_mjcf_converts_and_loads():
    from egoego_release_tpu.ops.mujoco_compat import load_humanoid_model

    m = load_humanoid_model(XML)
    assert (m.nq, m.nv, m.nu) == (76, 75, 69)
    assert m.nbody == 25  # world + 24 humanoid bodies
    assert 60.0 < m.body_mass.sum() < 100.0  # plausible human mass from meshes


def test_xml_fk_matches_real_mujoco():
    """ops/mujoco_xml.qpos_fk (the no-simulator FK used by eval) against the
    REAL MuJoCo forward kinematics on random qpos."""
    from egoego_release_tpu.ops.mujoco_compat import load_humanoid_model
    from egoego_release_tpu.ops.mujoco_xml import load_mujoco_skeleton, qpos_fk

    model = load_humanoid_model(XML)
    data = mujoco.MjData(model)
    skeleton = load_mujoco_skeleton(XML)

    rng = np.random.RandomState(0)
    for seed in range(3):
        r = np.random.RandomState(seed)
        qpos = np.zeros(76)
        qpos[:3] = r.uniform(-1, 1, 3) + [0, 0, 1]
        q = r.randn(4)
        qpos[3:7] = q / np.linalg.norm(q)
        qpos[7:] = r.uniform(-0.7, 0.7, 69)

        data.qpos[:] = qpos
        mujoco.mj_forward(model, data)
        mj_pos = data.xpos[1:]     # (24, 3) world body positions
        mj_quat = data.xquat[1:]   # (24, 4) wxyz

        our_quat, our_pos = qpos_fk(skeleton, jnp.asarray(qpos[None], jnp.float32))
        np.testing.assert_allclose(np.asarray(our_pos[0]), mj_pos, atol=2e-5)
        # quats up to sign
        ours = np.asarray(our_quat[0])
        sign = np.sign(np.sum(ours * mj_quat, axis=-1, keepdims=True))
        np.testing.assert_allclose(ours, sign * mj_quat, atol=2e-5)


def test_pd_control_resists_gravity():
    """With stable-PD torques holding the initial pose (plus contacts), the
    character stays up over 0.5 s; with zero torque and no RFC it collapses.
    This exercises the full do_simulation chain: real M/C -> compute_torque
    -> clipping -> RFC -> mj_step."""
    from egoego_release_tpu.rl.mujoco_env import MujocoHumanoidEnv

    env = MujocoHumanoidEnv(XML, residual_force=True)
    qpos0 = _standing_qpos()
    target = qpos0[7:].copy()

    env.reset(qpos0)
    for _ in range(15):  # 0.5 s at 30 Hz
        env.do_simulation(np.zeros(env.action_dim), target)
    z_pd = env.get_qpos()[2]

    # free fall: zero gains, no rfc
    env_free = MujocoHumanoidEnv(
        XML, residual_force=False,
        jkp=np.zeros(69), jkd=np.zeros(69), torque_lim=np.zeros(69),
    )
    env_free.reset(qpos0)
    for _ in range(15):
        env_free.do_simulation(np.zeros(env_free.action_dim), target)
    z_free = env_free.get_qpos()[2]

    drop_pd = qpos0[2] - z_pd
    drop_free = qpos0[2] - z_free
    assert np.isfinite(z_pd) and np.isfinite(z_free)
    assert drop_pd < 0.25, f"PD-held character collapsed: dropped {drop_pd:.3f} m"
    assert drop_free > 2 * max(drop_pd, 0.02), (
        f"free fall {drop_free:.3f} m should far exceed PD drop {drop_pd:.3f} m"
    )


def test_physics_state_feeds_reward_suite():
    """Simulated state plugs into the dynamic-supervision rewards: tracking
    the initial pose scores higher than after being shoved by a large RFC."""
    from egoego_release_tpu.rl import rewards as R
    from egoego_release_tpu.rl.mujoco_env import MujocoHumanoidEnv

    env = MujocoHumanoidEnv(XML, residual_force=True)
    qpos0 = _standing_qpos()
    target = qpos0[7:].copy()

    env.reset(qpos0)
    tgt_bquat = env.get_body_quat()[None]
    tgt_wbpos = env.get_wbody_pos()[None]
    tgt_hpose = env.get_head_pose()[None]

    def reward_now(prev_bquat):
        ctx = R.RewardContext(
            cur_hpose=jnp.asarray(env.get_head_pose()[None], jnp.float32),
            tgt_hpose=jnp.asarray(tgt_hpose, jnp.float32),
            cur_bquat=jnp.asarray(env.get_body_quat()[None], jnp.float32),
            prev_bquat=jnp.asarray(prev_bquat, jnp.float32),
            cur_wbpos=jnp.asarray(env.get_wbody_pos()[None], jnp.float32),
            tgt_bquat=jnp.asarray(tgt_bquat, jnp.float32),
            tgt_wbpos=jnp.asarray(tgt_wbpos, jnp.float32),
        )
        return float(R.dynamic_supervision_v4(ctx)[0][0])

    prev = env.get_body_quat()[None]
    env.do_simulation(np.zeros(env.action_dim), target)
    r_hold = reward_now(prev)

    # shove with a max residual force for 10 steps
    shove = np.zeros(env.action_dim)
    shove[env.ndof : env.ndof + 3] = 1e3
    for _ in range(10):
        env.do_simulation(shove, target)
    r_shoved = reward_now(prev)

    assert np.isfinite(r_hold) and np.isfinite(r_shoved)
    assert r_hold > r_shoved


def test_physics_imitation_step_and_termination():
    """PhysicsImitation (the step_ar -> PD -> reward -> fail_safe loop):
    tracking a standing target keeps reward high and done=False; a massive
    shove diverges the body and triggers the env_term_body termination."""
    from egoego_release_tpu.rl.imitation import PhysicsImitation

    sess = PhysicsImitation(XML, reward_id="dynamic_supervision_v4",
                            term_body_diff=6.0)
    qpos0 = _standing_qpos()
    sess.reset(qpos0)

    rewards = []
    for _ in range(10):
        r, done, info = sess.step(np.zeros(sess.env.action_dim), qpos0)
        rewards.append(r)
        assert not done, f"standing tracking terminated early: {info}"
    assert np.isfinite(rewards).all()
    assert np.mean(rewards) > 2.0  # v4 additive: hp+hq+p+jp near their max ~4

    # shove until the body diverges from the target
    shove = np.zeros(sess.env.action_dim)
    shove[sess.env.ndof:sess.env.ndof + 3] = 1e3
    done = False
    for _ in range(40):
        r, done, info = sess.step(shove, qpos0)
        if done:
            break
    assert done, f"expected termination after shoving; body_diff={info['body_diff']}"
    assert info["body_diff"] > 6.0


def test_physics_imitation_v3_with_ar_context():
    from egoego_release_tpu.rl.imitation import PhysicsImitation

    sess = PhysicsImitation(XML, reward_id="dynamic_supervision_v3")
    qpos0 = _standing_qpos()
    sess.reset(qpos0)
    r, done, info = sess.step(
        np.zeros(sess.env.action_dim), qpos0, ar_qpos=qpos0,
        prev_target_qpos=qpos0,
    )
    assert np.isfinite(r) and 0.0 < r <= 1.0  # multiplicative product of exps
    assert info["components"].shape == (8,)


def test_physics_ppo_smoke():
    """PhysicsPPO plumbing: host rollout -> GAE -> clipped updates produce
    finite losses and move the policy (a convergence run is a training job,
    not a unit test)."""
    import jax

    from egoego_release_tpu.rl.imitation import PhysicsImitation
    from egoego_release_tpu.rl.train_physics_agent import PhysicsPPO

    sess = PhysicsImitation(XML, reward_id="dynamic_supervision_v4")
    agent = PhysicsPPO(sess, hsize=(32, 16), epochs=2)
    key = jax.random.PRNGKey(0)
    key, k0 = jax.random.split(key)
    state = agent.init_state(k0)
    before = np.asarray(state["policy"]["params"]["fc"]["kernel"]).copy()

    qpos0 = _standing_qpos()
    targets = np.tile(qpos0, (8, 1))
    for _ in range(2):
        state, key, m = agent.iterate(state, key, qpos0, targets, horizon=8)
        assert np.isfinite(m["reward_mean"]) and np.isfinite(m["policy_loss"])
        assert m["episode_len"] >= 1
    after = np.asarray(state["policy"]["params"]["fc"]["kernel"])
    assert np.abs(before - after).max() > 0


def test_physics_ppo_parallel_rollouts():
    """iterate_parallel (the multiprocess-sampler analog): several rollouts
    collected on cloned envs aggregate into one update with finite losses."""
    import jax

    from egoego_release_tpu.rl.imitation import PhysicsImitation
    from egoego_release_tpu.rl.train_physics_agent import PhysicsPPO

    sess = PhysicsImitation(XML, reward_id="dynamic_supervision_v4")
    agent = PhysicsPPO(sess, hsize=(32, 16), epochs=2)
    key = jax.random.PRNGKey(0)
    key, k0 = jax.random.split(key)
    state = agent.init_state(k0)

    qpos0 = _standing_qpos()
    tasks = [(qpos0, np.tile(qpos0, (6, 1))) for _ in range(3)]
    state, key, m = agent.iterate_parallel(state, key, tasks, horizon=6,
                                           num_threads=2)
    assert m["num_rollouts"] == 3
    assert m["total_steps"] >= 3
    assert np.isfinite(m["reward_mean"]) and np.isfinite(m["policy_loss"])
    # obs filter stats updated from RAW observations (count == total steps)
    assert float(agent.zfilter["count"]) == m["total_steps"]


def test_collect_failsafe_continues_past_termination():
    """VERDICT r4 #5: training-time fail-safe resets — with a
    termination threshold tight enough that every step 'fails',
    on_fail='failsafe' must keep collecting the full horizon (sim reset to
    the expert's next frame each time, humanoid_im.py:267 semantics) while
    on_fail='break' truncates at the first done.  The failure steps stay
    done=True in the batch so GAE cannot bootstrap across the resets."""
    import jax

    from egoego_release_tpu.rl.imitation import PhysicsImitation
    from egoego_release_tpu.rl.train_physics_agent import PhysicsPPO

    # term_body_diff=0 -> any nonzero body diff terminates immediately
    sess = PhysicsImitation(XML, reward_id="dynamic_supervision_v4",
                            term_body_diff=0.0)
    agent = PhysicsPPO(sess, hsize=(32, 16), epochs=2)
    key = jax.random.PRNGKey(0)
    state = agent.init_state(key)

    qpos0 = _standing_qpos()
    horizon = 6
    targets = np.tile(qpos0, (horizon, 1))
    qvels = np.zeros((horizon, sess.env.model.nv))

    _, b_break = agent.collect(state, key, qpos0, targets, horizon,
                               on_fail="break")
    assert len(b_break["rewards"]) == 1 and bool(b_break["dones"][0])

    sess.reset(qpos0)
    _, b_fs = agent.collect(state, key, qpos0, targets, horizon,
                            on_fail="failsafe", fail_qvels=qvels)
    assert len(b_fs["rewards"]) == horizon
    assert b_fs["dones"].all()  # every failure step stays marked
    assert np.isfinite(b_fs["rewards"]).all()

    # and the parallel driver threads it through
    tasks = [(qpos0, targets, None, qvels) for _ in range(2)]
    state, key, m = agent.iterate_parallel(state, key, tasks, horizon,
                                           num_threads=2, on_fail="failsafe")
    assert m["total_steps"] == 2 * horizon
    assert np.isfinite(m["reward_mean"]) and np.isfinite(m["policy_loss"])


def test_physics_controller_tool_smoke():
    """Pin the tools/train_physics_controller.py recipe (VERDICT r4 weak
    #5): one tiny iteration end to end in a subprocess — the open-loop
    baseline row must reproduce the known 71.6mm/30f stable-PD number
    (physics_tracking_check round-3 result; weight-independent), and the
    result JSON must carry the bar fields BASELINE.md records."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    snap_path = "/tmp/_phys_smoke_snapshot.pkl"
    if os.path.exists(snap_path):
        os.remove(snap_path)
    env = dict(os.environ)
    env.update(PHYS_ITERS="1", PHYS_ROLLOUTS="2", PHYS_HORIZON="8",
               PHYS_EVAL_EVERY="1", PHYS_ON_FAIL="failsafe",
               PHYS_SAVE=snap_path)
    res = subprocess.run(
        [sys.executable, os.path.join(repo, "tools",
                                      "train_physics_controller.py")],
        capture_output=True, text=True, env=env, timeout=900,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    # incremental best-snapshot save (PHYS_SAVE): written at the first new
    # best, so even a wall-budget-killed run leaves its policy on disk
    import pickle
    with open(snap_path, "rb") as f:
        snap = pickle.load(f)
    assert set(snap) == {"policy", "value", "zfilter"}
    result = json.loads(res.stdout.strip().splitlines()[-1])
    assert result["on_fail"] == "failsafe"
    ol = result["open_loop"]
    # open-loop stable-PD is deterministic on this expert: 71.6mm/30f
    assert abs(ol["first30_mpjpe_mm"] - 71.6) < 2.0, ol
    assert "max_consecutive_upright" in ol
    cl = result["closed_loop_best"]
    assert np.isfinite(cl["first30_mpjpe_mm"])
    assert set(result["bar"]) == {"first30_mpjpe_beats_open_loop",
                                  "upright_beats_open_loop"}
