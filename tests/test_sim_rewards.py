"""relive simulator-state reward families vs the reference's OWN functions.

Drives kinpoly/relive/core/reward_function.py (via refstubs) with a fake env
exposing the HumanoidAREnv attribute surface, and checks our pure-state port
(rl/sim_rewards.py) reproduces totals and components bit-for-bit.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests")
import reforacle  # noqa: F401,E402

from egoego_release_tpu.rl import sim_rewards as S  # noqa: E402


@pytest.fixture(scope="module")
def ref_rf():
    reforacle.add_reference_paths()
    if "/root/reference/kinpoly" not in sys.path:
        sys.path.insert(0, "/root/reference/kinpoly")
    return pytest.importorskip("relive.core.reward_function")


def _rand_quats(rng, j):
    q = rng.randn(j, 4)
    return (q / np.linalg.norm(q, axis=1, keepdims=True)).reshape(-1)


class _FakeAREnv:
    """The HumanoidAREnv surface the relive sim rewards read."""

    J = 8          # bquat joint count
    NQ = 76

    def __init__(self, rng, ws=None, b_diffw=None, obs_coord="heading",
                 action_v=2, vf_dim=6, adap_weight=False, fix_start_ind=1):
        self.cfg = type("C", (), {})()
        self.cfg.reward_weights = ws or {}
        self.cfg.b_diffw = 1.0 if b_diffw is None else b_diffw
        self.cfg.obs_coord = obs_coord
        self.cfg.action_v = action_v
        self.cfg.adap_weight = adap_weight
        self.cfg.env_episode_len = 200
        self.cur_t = 2
        self.dt = 1 / 30
        self.vf_dim = vf_dim
        self.off_obj_qpos = 0
        self.end_reward = 0.25
        self.fix_start_ind = fix_start_ind

        def qpos():
            return np.concatenate(
                [rng.randn(3), _rand_quats(rng, 1),
                 rng.uniform(-np.pi, np.pi, self.NQ - 7)])

        self.prev_qpos = qpos()
        self.data = type("D", (), {})()
        self.data.qpos = qpos()
        self._cur_bquat = _rand_quats(rng, self.J)
        self.prev_bquat = _rand_quats(rng, self.J)
        self._ee_w = rng.randn(15)
        self._ee_local = rng.randn(15)
        self._com = rng.randn(3)
        self._head = np.concatenate([rng.randn(3), _rand_quats(rng, 1)])
        self.prev_hpos = np.concatenate([rng.randn(3), _rand_quats(rng, 1)])
        self._kin_pose = _rand_quats(rng, self.J - 1)  # non-root body quats
        self._kin_vel = rng.randn(3)

        t = 8
        self.expert = {
            "qpos": np.stack([qpos() for _ in range(t)]),
            "bquat": np.stack([_rand_quats(rng, self.J) for _ in range(t)]),
            "bangvel": rng.randn(t, self.J * 3),
            "ee_pos": rng.randn(t, 15),
            "ee_wpos": rng.randn(t, 15),
            "com": rng.randn(t, 3),
            "rlinv": rng.randn(t, 3),
            "rlinv_local": rng.randn(t, 3),
            "rangv": rng.randn(t, 3),
            "rq_rmh": np.stack([_rand_quats(rng, 1) for _ in range(t)]),
            "head_info": np.stack([
                np.concatenate([rng.randn(3), _rand_quats(rng, 1)])
                for _ in range(t)]),
            "hvel": rng.randn(t, 6),
            "hvel_local": rng.randn(t, 3),
            "start_pos": rng.randn(3),
            "rel_heading": _rand_quats(rng, 1),
            "sim_pos": rng.randn(3),
            "len": t,
        }

    def get_expert_index(self, t):
        return t

    def get_expert_attr(self, attr, ind):
        return self.expert[attr][ind]

    def get_ee_pos(self, transform):
        return (self._ee_w if transform is None else self._ee_local).copy()

    def get_body_quat(self):
        return self._cur_bquat.copy()

    def get_com(self):
        return self._com.copy()

    def get_head(self):
        return self._head.copy()

    def convert_body_quat(self, pose):
        return pose  # passthrough: parity is tested at the math level

    def get_kinematic_pose_ind(self, ind):
        return self._kin_pose

    def get_kin_vel(self, ind):
        return self._kin_vel

    def cur_state(self):
        return {
            "qpos": self.data.qpos.copy(),
            "prev_qpos": self.prev_qpos.copy(),
            "bquat": self._cur_bquat.copy(),
            "prev_bquat": self.prev_bquat.copy(),
            "ee_wpos": self._ee_w.copy(),
            "ee_pos": self._ee_local.copy(),
            "com": self._com.copy(),
            "head_pose": self._head.copy(),
            "prev_head_pose": self.prev_hpos.copy(),
        }


_WS = {"w_p": 0.45, "w_v": 0.08, "w_e": 0.2, "w_c": 0.12, "w_r": 0.15,
       "k_p": 1.5, "k_v": 0.01, "k_e": 15.0, "k_c": 800.0, "k_r": 0.8}


@pytest.mark.parametrize("end", [False, True])
@pytest.mark.parametrize("rid", [
    "quat_v2", "quat_v3", "deep_mimic", "deep_mimic_v2",
    "deep_mimic_reward_v2_vf", "deep_mimic_reward_v2_vf_vq",
    "multiplicable_reward", "local_world_v1", "local_world_v2",
    "local_world_v3", "world_quat", "world_quat_v2",
])
def test_sim_reward_matches_reference(ref_rf, rid, end):
    rng = np.random.RandomState(hash(rid) % 2**31)
    b_diffw = np.linspace(0.6, 1.4, _FakeAREnv.J - 1)
    env = _FakeAREnv(rng, ws=dict(_WS), b_diffw=b_diffw)
    action = rng.randn(80)

    ref_total, ref_comp = ref_rf.reward_func[rid](
        env, None, action, {"end": end})

    kwargs = dict(ws=_WS, dt=env.dt)
    if rid in ("quat_v2", "quat_v3", "local_world_v1", "local_world_v2",
               "local_world_v3"):
        kwargs.update(b_diffw=b_diffw, obs_coord=env.cfg.obs_coord,
                      end=end, end_reward=env.end_reward)
    if rid == "quat_v3":
        kwargs.update(cur_t=env.cur_t, env_episode_len=env.cfg.env_episode_len)
    if rid in ("deep_mimic", "multiplicable_reward"):
        kwargs.update(off_obj_qpos=env.off_obj_qpos, end=end,
                      end_reward=env.end_reward)
        if rid == "deep_mimic":
            kwargs.update(b_diffw=b_diffw)
    if rid.startswith("deep_mimic_") and rid != "deep_mimic":
        kwargs.update(off_obj_qpos=env.off_obj_qpos)
    if rid == "deep_mimic_reward_v2_vf":
        kwargs.update(vf_dim=env.vf_dim, action_v=env.cfg.action_v)
    if rid.startswith("world_quat"):
        kwargs.update(b_diffw=b_diffw, end=end, end_reward=env.end_reward)

    total, comp = S.SIM_REWARD_FUNCS[rid](
        env.cur_state(), env.expert, env.cur_t, action, **kwargs)
    np.testing.assert_allclose(total, ref_total, atol=1e-9, err_msg=rid)
    np.testing.assert_allclose(comp, ref_comp, atol=1e-9, err_msg=rid)


@pytest.mark.parametrize("adap", [False, True])
def test_fine_tune_family_matches_reference(ref_rf, adap):
    rng = np.random.RandomState(77)
    env = _FakeAREnv(rng, ws=dict(_WS), adap_weight=adap)
    action, old_action = rng.randn(80), rng.randn(80)

    for rid, extra in [
        ("fine_tune_kin_action_reward",
         dict(kin_bquat=env._kin_pose, adap_weight=adap,
              kin_lvel=env._kin_vel)),
        ("fine_tune_action_reward", {}),
    ]:
        ref_total, ref_comp = ref_rf.reward_func[rid](
            env, None, action, old_action, {"end": True})
        total, comp = S.SIM_REWARD_FUNCS[rid](
            env.cur_state(), env.expert, env.cur_t, action, old_action,
            ws=_WS, dt=env.dt, fix_start_ind=env.fix_start_ind,
            end=True, end_reward=env.end_reward, **extra)
        np.testing.assert_allclose(total, ref_total, atol=1e-9, err_msg=rid)
        np.testing.assert_allclose(comp, ref_comp, atol=1e-9, err_msg=rid)

    # fine_tune_reward takes no old_action; end bonus multiplies
    ref_total, ref_comp = ref_rf.reward_func["fine_tune_reward"](
        env, None, action, {"end": True})
    total, comp = S.fine_tune_reward(
        env.cur_state(), env.expert, env.cur_t, action,
        ws=_WS, dt=env.dt, fix_start_ind=env.fix_start_ind,
        kin_bquat=env._kin_pose, adap_weight=adap, kin_lvel=env._kin_vel,
        end=True, end_reward=env.end_reward)
    np.testing.assert_allclose(total, ref_total, atol=1e-9)
    np.testing.assert_allclose(comp, ref_comp, atol=1e-9)


def test_decay_option_matches_reference(ref_rf):
    rng = np.random.RandomState(5)
    ws = dict(_WS, decay=True)
    env = _FakeAREnv(rng, ws=dict(ws))
    action = rng.randn(80)
    ref_total, _ = ref_rf.reward_func["quat_v3"](env, None, action,
                                                 {"end": False})
    total, _ = S.quat_space_reward_v3(
        env.cur_state(), env.expert, env.cur_t, action, ws=ws, dt=env.dt,
        b_diffw=env.cfg.b_diffw, obs_coord=env.cfg.obs_coord,
        cur_t=env.cur_t, env_episode_len=env.cfg.env_episode_len)
    np.testing.assert_allclose(total, ref_total, atol=1e-9)


def test_helpers_match_relive_math_utils(ref_rf):
    import importlib

    m = importlib.import_module("relive.utils.math_utils")
    rng = np.random.RandomState(3)
    a, b = _rand_quats(rng, 5), _rand_quats(rng, 5)
    np.testing.assert_allclose(
        S.multi_quat_norm(a), m.multi_quat_norm(a), atol=1e-12)
    np.testing.assert_allclose(
        S.multi_quat_norm_v2(a), m.multi_quat_norm_v2(a), atol=1e-12)
    np.testing.assert_allclose(
        S.get_angvel_fd(a, b, 1 / 30), m.get_angvel_fd(a, b, 1 / 30),
        atol=1e-8)
    for _ in range(4):
        q0 = np.concatenate([rng.randn(3), _rand_quats(rng, 1),
                             rng.uniform(-4, 4, 20)])
        q1 = np.concatenate([rng.randn(3), _rand_quats(rng, 1),
                             rng.uniform(-4, 4, 20)])
        np.testing.assert_allclose(
            S.get_qvel_fd(q0, q1, 1 / 30), m.get_qvel_fd(q0, q1, 1 / 30),
            atol=1e-8)
        np.testing.assert_allclose(
            S.get_qvel_fd(q0, q1, 1 / 30, "heading"),
            m.get_qvel_fd(q0, q1, 1 / 30, "heading"), atol=1e-8)
        np.testing.assert_allclose(
            S.get_heading(q0[3:7]), m.get_heading(q0[3:7]), atol=1e-10)


def test_physics_imitation_with_sim_rewards():
    """Every relive sim reward id drives a real MuJoCo step via
    PhysicsImitation (same loop shape as the UHC wiring)."""
    mujoco = pytest.importorskip("mujoco")  # noqa: F841
    from egoego_release_tpu.rl.imitation import PhysicsImitation

    xml = ("/root/reference/kinpoly/assets/mujoco_models/"
           "humanoid_smpl_neutral_mesh.xml")
    rng = np.random.RandomState(12)
    for rid in ["quat_v3", "deep_mimic", "local_world_v2", "world_quat",
                "fine_tune_reward", "fine_tune_action_reward"]:
        sim = PhysicsImitation(xml, reward_id=rid)
        t, nq = 4, sim.env.model.nq
        eq = np.zeros((t, nq))
        eq[:, 2], eq[:, 3] = 0.91, 1.0
        eq[:, 7:] = 0.02 * rng.randn(t, nq - 7)
        sim.set_expert(eq)
        sim.reset(eq[0])
        r, done, info = sim.step(np.zeros(sim.env.action_dim), eq[1],
                                 expert_ind=1)
        assert np.isfinite(r), rid
        assert np.isfinite(info["components"]).all(), rid


def test_full_registry_coverage(ref_rf):
    """Every reference registry entry is ported somewhere (sim_rewards,
    rewards.py, or documented-dead v2)."""
    from egoego_release_tpu.rl.rewards import REWARD_FUNCS

    ported = set(S.SIM_REWARD_FUNCS) | set(REWARD_FUNCS)
    dead = {"dynamic_supervision_v2"}  # body commented out in the reference
    missing = set(ref_rf.reward_func) - ported - dead - {"constant"}
    assert not missing, f"unported relive rewards: {missing}"
