"""UHC observation builders vs the reference's OWN HumanoidEnv methods.

humanoid_im.py imports under tests/refstubs (gym/mujoco_py/glfw shims); its
get_full_obs* methods are pure numpy over duck-typed env state, so we bind
them onto a fake env and require our rl/uhc_obs.py port to reproduce the
observation vectors bit-for-bit — including the transposed
transform_vec_batch layout and the rel_pos quat-minus-position quirk.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests")
import reforacle  # noqa: E402

from egoego_release_tpu.rl import uhc_obs as O  # noqa: E402


@pytest.fixture(scope="module")
def ref_env_cls():
    reforacle.add_reference_paths()
    if "/root/reference/kinpoly" not in sys.path:
        sys.path.insert(0, "/root/reference/kinpoly")
    hi = pytest.importorskip("copycat.envs.humanoid_im")
    return hi.HumanoidEnv


def _rand_quats(rng, j):
    q = rng.randn(j, 4)
    return (q / np.linalg.norm(q, axis=1, keepdims=True)).reshape(-1)


def _make_fake(ref_cls, rng, obs_vel="root", obs_heading=True,
               root_deheading=True, obs_phase=True, cyclic=False):
    NB, NQ, NV = 24, 76, 75

    class _Obj:
        pass

    env = _Obj()
    # bind the reference's own methods as the oracle surface
    for name in ["get_full_obs", "get_full_obs_v1", "get_full_obs_v2",
                 "remove_base_rot", "get_expert_index", "get_expert_attr",
                 "get_expert_qpos", "get_expert_kin_pose", "get_phase",
                 "get_expert_joint_pos", "get_expert_com_pos",
                 "get_expert_wbquat"]:
        setattr(env, name, getattr(ref_cls, name).__get__(env))

    env.cfg = _Obj()
    env.cfg.obs_coord = "heading"
    env.cfg.obs_vel = obs_vel
    env.cfg.obs_heading = obs_heading
    env.cfg.root_deheading = root_deheading
    env.cfg.obs_phase = obs_phase
    env.qpos_lim, env.qvel_lim, env.body_lim = NQ, NV, 25
    env.base_rot = list(O.BASE_ROT)
    env.no_root = False
    env.cur_t = 3
    env.start_ind = 1

    def qp():
        return np.concatenate(
            [rng.randn(3), _rand_quats(rng, 1), rng.uniform(-2, 2, NQ - 7)])

    t = 8
    env.expert = {
        "qpos": np.stack([qp() for _ in range(t)]),
        "wbpos": rng.randn(t, NB * 3),
        "body_com": rng.randn(t, NB * 3),
        "wbquat": np.stack([_rand_quats(rng, NB) for _ in range(t)]),
        "len": t,
        "meta": {"cyclic": cyclic},
    }
    env.data = _Obj()
    env.data.qpos = qp()
    env.data.qvel = rng.randn(NV)
    # body_xpos/xipos/body_xquat carry a world row 0 the slices skip
    env.data.body_xpos = rng.randn(26, 3)
    env.data.xipos = rng.randn(26, 3)
    xq = np.concatenate([[1, 0, 0, 0], _rand_quats(rng, 25)]).reshape(26, 4)
    env.data.body_xquat = xq
    return env


def _cur_state(env):
    return {
        "qpos": env.data.qpos.copy(),
        "qvel": env.data.qvel.copy(),
        "wbpos": env.data.body_xpos[1:env.body_lim].copy().ravel(),
        "body_com": env.data.xipos[1:env.body_lim].copy().ravel(),
        "wbquat": env.data.body_xquat[1:env.body_lim].copy().ravel(),
    }


def _specs(env):
    return dict(obs_coord=env.cfg.obs_coord, obs_vel=env.cfg.obs_vel,
                obs_heading=env.cfg.obs_heading,
                root_deheading=env.cfg.root_deheading,
                obs_phase=env.cfg.obs_phase)


@pytest.mark.parametrize("obs_vel", ["root", "full"])
@pytest.mark.parametrize("obs_v", [0, 1, 2])
def test_obs_matches_reference(ref_env_cls, obs_v, obs_vel):
    rng = np.random.RandomState(100 + obs_v)
    env = _make_fake(ref_env_cls, rng, obs_vel=obs_vel)
    ref = [env.get_full_obs, env.get_full_obs_v1, env.get_full_obs_v2][obs_v]()
    ours = O.uhc_observation(_cur_state(env), env.expert, env.cur_t,
                             start_ind=env.start_ind, obs_v=obs_v,
                             specs=_specs(env))
    assert ours.shape == np.asarray(ref).shape
    np.testing.assert_allclose(ours, ref, atol=1e-10)


def test_obs_v0_flag_combinations(ref_env_cls):
    for heading, dehead, phase in [(False, False, False), (True, False, True),
                                   (False, True, False)]:
        rng = np.random.RandomState(7)
        env = _make_fake(ref_env_cls, rng, obs_heading=heading,
                         root_deheading=dehead, obs_phase=phase)
        ref = env.get_full_obs()
        ours = O.get_full_obs(_cur_state(env), env.expert, env.cur_t,
                              start_ind=env.start_ind, specs=_specs(env))
        np.testing.assert_allclose(ours, ref, atol=1e-10)


def test_obs_cyclic_expert_index(ref_env_cls):
    rng = np.random.RandomState(8)
    env = _make_fake(ref_env_cls, rng, cyclic=True)
    env.cur_t = 11  # wraps: (1 + 11) % 8 = 4; +1 target wraps to 5
    ref = env.get_full_obs_v2()
    ours = O.get_full_obs_v2(_cur_state(env), env.expert, env.cur_t,
                             start_ind=env.start_ind, specs=_specs(env))
    np.testing.assert_allclose(ours, ref, atol=1e-10)


def test_degenerate_cur_quat_guard(ref_env_cls):
    rng = np.random.RandomState(9)
    env = _make_fake(ref_env_cls, rng)
    env.data.body_xquat[1, 0] = 0.0  # trips the cur_quat[0,0]==0 substitute
    ref = env.get_full_obs_v2()
    ours = O.get_full_obs_v2(_cur_state(env), env.expert, env.cur_t,
                             start_ind=env.start_ind, specs=_specs(env))
    np.testing.assert_allclose(ours, ref, atol=1e-10)


def test_expert_replay_restores_sim_state():
    """expert_physics_attrs must save/restore the sim state around the
    replay, like the reference get_expert (tools.py:6,:73-74)."""
    mujoco = pytest.importorskip("mujoco")  # noqa: F841
    from egoego_release_tpu.rl import uhc_rewards as U
    from egoego_release_tpu.rl.mujoco_env import MujocoHumanoidEnv

    xml = ("/root/reference/kinpoly/assets/mujoco_models/"
           "humanoid_smpl_neutral_mesh.xml")
    env = MujocoHumanoidEnv(xml, residual_force=False)
    rng = np.random.RandomState(4)
    nq = env.model.nq
    q0 = np.zeros(nq)
    q0[2], q0[3] = 0.91, 1.0
    env.reset(q0)
    before = env.get_qpos()

    qpos = np.tile(q0, (4, 1))
    qpos[:, 7:] += 0.3 * rng.randn(4, nq - 7)  # replay frames differ from q0
    U.expert_physics_attrs(env, qpos)
    np.testing.assert_allclose(env.get_qpos(), before, atol=0)


def test_physics_ppo_with_obs_v2():
    """PhysicsPPO(obs_v=2) runs one iterate with the UHC obs contract and
    the dim formula matches the built observation."""
    mujoco = pytest.importorskip("mujoco")  # noqa: F841
    import jax

    from egoego_release_tpu.rl.imitation import PhysicsImitation
    from egoego_release_tpu.rl.train_physics_agent import PhysicsPPO

    xml = ("/root/reference/kinpoly/assets/mujoco_models/"
           "humanoid_smpl_neutral_mesh.xml")
    sess = PhysicsImitation(xml, reward_id="world_rfc_implicit",
                            reward_weights={"w_vf": 0.05})
    agent = PhysicsPPO(sess, hsize=(32, 16), epochs=2, obs_v=2)
    key = jax.random.PRNGKey(2)
    key, k0 = jax.random.split(key)
    state = agent.init_state(k0)
    qpos0 = np.zeros(sess.env.model.nq)
    qpos0[2], qpos0[3] = 0.91, 1.0
    targets = np.tile(qpos0, (5, 1))
    state, key, m = agent.iterate(state, key, qpos0, targets, horizon=5)
    assert np.isfinite(m["reward_mean"]) and np.isfinite(m["policy_loss"])
    # the analytic obs_dim matches an actually-built observation
    sess.set_expert(targets)
    sess.reset(qpos0)
    assert agent.obs(targets[0], cur_t=0).shape == (agent.obs_dim,)


def test_obs_on_real_simulator_state():
    """End-to-end: observation built from real MuJoCo state + replayed
    expert attrs is finite and has the expected v2 layout size."""
    mujoco = pytest.importorskip("mujoco")  # noqa: F841
    from egoego_release_tpu.rl import uhc_rewards as U
    from egoego_release_tpu.rl.mujoco_env import MujocoHumanoidEnv

    xml = ("/root/reference/kinpoly/assets/mujoco_models/"
           "humanoid_smpl_neutral_mesh.xml")
    env = MujocoHumanoidEnv(xml, residual_force=False)
    rng = np.random.RandomState(10)
    t, nq = 5, env.model.nq
    qpos = np.zeros((t, nq))
    qpos[:, 2], qpos[:, 3] = 0.91, 1.0
    qpos[:, 7:] = 0.05 * rng.randn(t, nq - 7)
    expert = U.expert_physics_attrs(env, qpos)

    env.reset(qpos[0])
    cur = {
        "qpos": env.get_qpos(),
        "qvel": env.get_qvel(),
        "wbpos": U.env_wbpos(env),
        "body_com": U.env_body_com(env),
        "wbquat": U.env_wbquat(env),
    }
    obs = O.uhc_observation(cur, expert, cur_t=0, obs_v=2)
    # v2 layout: 4 + 3*74 + 6 + 1 + 2 + 2*72 + 2*96 = 571
    assert obs.shape == (571,)
    assert np.isfinite(obs).all()
    obs1 = O.uhc_observation(cur, expert, cur_t=0, obs_v=1)
    assert obs1.shape == (571 + 144,)
    assert np.isfinite(obs1).all()
