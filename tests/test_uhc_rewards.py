"""UHC world-reward family vs the reference's OWN reward functions.

Imports kinpoly/copycat/core/reward_function.py through the refstubs and
drives it with a fake env exposing the exact interface it reads
(humanoid_im-style accessors); our port must reproduce totals and components
bit-for-bit (same numpy math).  Also validates the helpers against khrylib's
own quaternion utilities and checks the expert-replay ranking property on
the real MuJoCo model.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests")
import reforacle  # noqa: F401,E402  (installs pytorch3d/evo/... stubs)

sys.path.insert(0, "/root/reference/kinpoly")

from egoego_release_tpu.rl.uhc_rewards import (  # noqa: E402
    EE_NAMES,
    UHC_REWARD_FUNCS,
    de_heading,
    euler_sxyz_to_quat,
    expert_physics_attrs,
    get_angvel_fd,
    get_qvel_fd_new,
    local_rfc_explicit_reward,
    local_rfc_implicit_reward,
    multi_quat_diff,
    multi_quat_norm,
    quat_mul_vec,
    transform_vec,
    world_rfc_explicit_reward,
    world_rfc_implicit_reward,
    world_rfc_implicit_v1_mul,
    world_rfc_implicit_v2,
    world_rfc_implicit_v3,
)


@pytest.fixture(scope="module")
def ref_rf():
    return pytest.importorskip("copycat.core.reward_function")


def _rand_quats(rng, j):
    q = rng.randn(j, 4)
    return (q / np.linalg.norm(q, axis=1, keepdims=True)).reshape(-1)


def test_quat_helpers_match_khrylib(ref_rf):
    import importlib

    kmath = importlib.import_module("copycat.khrylib.utils.math")
    from copycat.khrylib.utils.transformation import quaternion_from_euler

    rng = np.random.RandomState(0)
    a, b = _rand_quats(rng, 6), _rand_quats(rng, 6)
    np.testing.assert_allclose(
        multi_quat_diff(a, b), kmath.multi_quat_diff(a, b), atol=1e-10)
    np.testing.assert_allclose(
        multi_quat_norm(a), np.abs(kmath.multi_quat_norm(a)), atol=1e-8)
    np.testing.assert_allclose(
        get_angvel_fd(a, b, 1 / 30), kmath.get_angvel_fd(a, b, 1 / 30), atol=1e-7)

    for e in rng.randn(5, 3):
        np.testing.assert_allclose(
            euler_sxyz_to_quat(e), quaternion_from_euler(*e), atol=1e-10)


class _FakeEnv:
    """The attribute surface world_rfc_implicit_reward reads (:4-54)."""

    def __init__(self, rng, j=8, ws=None, b_diffw=None, vf_dim=6):
        self.cfg = type("C", (), {})()
        self.cfg.reward_weights = ws or {}
        self.cfg.b_diffw = 1.0 if b_diffw is None else b_diffw
        self.cur_t = 3
        self.dt = 1 / 30
        self.vf_dim = vf_dim
        self._cur_bquat = _rand_quats(rng, j)
        self.prev_bquat = _rand_quats(rng, j)
        self._ee = rng.randn(len(EE_NAMES) * 3)
        self._com = rng.randn(3)
        t = 6
        self.expert = {
            "qpos": rng.randn(t, 76),
            "ee_wpos": rng.randn(t, len(EE_NAMES) * 3),
            "com": rng.randn(t, 3),
            "bquat": np.stack([_rand_quats(rng, j) for _ in range(t)]),
            "bangvel": rng.randn(t, j * 3),
        }

    def get_expert_index(self, t):
        return t

    def get_ee_pos(self, transform):
        assert transform is None
        return self._ee.copy()

    def get_body_quat(self):
        return self._cur_bquat.copy()

    def get_com(self):
        return self._com.copy()

    def get_expert_attr(self, attr, ind):
        return self.expert[attr][ind]


@pytest.mark.parametrize("ws", [
    None,
    {"w_p": 0.3, "w_v": 0.1, "w_e": 0.45, "w_c": 0.1, "w_vf": 0.05,
     "k_p": 2.0, "k_v": 0.005, "k_e": 5.0, "k_c": 100.0, "k_vf": 1.0},
])
def test_world_rfc_implicit_matches_reference(ref_rf, ws):
    rng = np.random.RandomState(1)
    env = _FakeEnv(rng, ws=dict(ws) if ws else {})
    action = rng.randn(75 + env.vf_dim)

    ref_total, ref_comp = ref_rf.reward_func["world_rfc_implicit"](
        env, None, action, None)

    cur = {
        "bquat": env.get_body_quat(),
        "prev_bquat": env.prev_bquat,
        "ee_wpos": env.get_ee_pos(None),
        "com": env.get_com(),
    }
    total, comp = world_rfc_implicit_reward(
        cur, env.expert, env.cur_t, action, ws=ws,
        b_diffw=env.cfg.b_diffw, vf_dim=env.vf_dim, dt=env.dt,
    )
    np.testing.assert_allclose(total, ref_total, atol=1e-10)
    np.testing.assert_allclose(comp, ref_comp, atol=1e-10)


def test_world_rfc_implicit_v1_mul_matches_reference(ref_rf):
    rng = np.random.RandomState(2)
    # the full copycat.yml reward_weights INCLUDING w_vf (regression: the
    # merge must not raise 'multiple values for w_vf')
    ws = {"w_p": 0.3, "w_v": 0.1, "w_e": 0.45, "w_c": 0.1, "w_vf": 0.05,
          "k_p": 2.0, "k_v": 0.005, "k_e": 5.0, "k_c": 100.0, "k_vf": 1.0}
    env = _FakeEnv(rng, ws=dict(ws))
    action = rng.randn(75 + env.vf_dim)
    ref_total, ref_comp = ref_rf.reward_func["world_rfc_implicit_v1_mul"](
        env, None, action, None)
    cur = {
        "bquat": env.get_body_quat(),
        "prev_bquat": env.prev_bquat,
        "ee_wpos": env.get_ee_pos(None),
        "com": env.get_com(),
    }
    total, comp = world_rfc_implicit_v1_mul(
        cur, env.expert, env.cur_t, action, ws=ws,
        b_diffw=env.cfg.b_diffw, vf_dim=env.vf_dim, dt=env.dt,
    )
    np.testing.assert_allclose(total, ref_total, atol=1e-10)
    np.testing.assert_allclose(comp, ref_comp, atol=1e-10)

    # without a residual force the vf FACTOR is 1, never a zeroing 0
    total0, comp0 = world_rfc_implicit_v1_mul(
        cur, env.expert, env.cur_t, action[:-6], ws=ws,
        b_diffw=env.cfg.b_diffw, vf_dim=0, dt=env.dt,
    )
    assert comp0[4] == 1.0
    np.testing.assert_allclose(total0, np.prod(comp0[:4]), rtol=1e-12)


class _FakeEnvFull(_FakeEnv):
    """Extends the fake surface with everything the explicit/local/v2/v3
    variants read (humanoid_im.py accessors + cfg/start_ind/prev_qpos)."""

    def __init__(self, rng, j=8, nb=24, ws=None, b_diffw=None, vf_dim=6,
                 cyclic=False, obs_coord="heading"):
        super().__init__(rng, j=j, ws=ws, b_diffw=b_diffw, vf_dim=vf_dim)
        self.cfg.obs_coord = obs_coord
        self.start_ind = 0
        self.body_vf_dim = 6
        self.vf_bodies = ["Pelvis"] * (vf_dim // self.body_vf_dim)
        self._wbquat = _rand_quats(rng, nb)
        self._wbpos = rng.randn(nb * 3)
        self._body_com = rng.randn(nb * 3)
        self._ee_local = rng.randn(len(EE_NAMES) * 3)

        def rq(r):
            q = r.randn(4)
            return q / np.linalg.norm(q)

        self.prev_qpos = np.concatenate(
            [rng.randn(3), rq(rng), rng.uniform(-np.pi, np.pi, 69)])
        cur_qpos = np.concatenate(
            [rng.randn(3), rq(rng), rng.uniform(-np.pi, np.pi, 69)])
        self.data = type("D", (), {})()
        self.data.qpos = cur_qpos
        t = self.expert["qpos"].shape[0]
        for i in range(t):  # reference expert qpos carry unit root quats
            q = self.expert["qpos"][i, 3:7]
            self.expert["qpos"][i, 3:7] = q / np.linalg.norm(q)
        self.expert.update({
            "wbquat": np.stack([_rand_quats(rng, nb) for _ in range(t)]),
            "wbpos": rng.randn(t, nb * 3),
            "body_com": rng.randn(t, nb * 3),
            "ee_pos": rng.randn(t, len(EE_NAMES) * 3),
            "rq_rmh": np.stack(
                [de_heading(self.expert["qpos"][i, 3:7]) for i in range(t)]),
            "rlinv_local": rng.randn(t, 3),
            "rangv": rng.randn(t, 3),
            "len": t,
            "meta": {"cyclic": cyclic},
        })
        if cyclic:
            self.expert["init_pos"] = rng.randn(3)
            self.expert["cycle_relheading"] = _rand_quats(rng, 1)
            self.expert["cycle_pos"] = rng.randn(3)

    def get_ee_pos(self, transform):
        if transform is None:
            return self._ee.copy()
        assert transform == self.cfg.obs_coord
        return self._ee_local.copy()

    def get_wbody_quat(self):
        return self._wbquat.copy()

    def get_wbody_pos(self):
        return self._wbpos.copy()

    def get_body_com(self):
        return self._body_com.copy()

    def cur_state_dict(self):
        return {
            "bquat": self.get_body_quat(),
            "prev_bquat": self.prev_bquat,
            "ee_wpos": self.get_ee_pos(None),
            "com": self.get_com(),
            "qpos": self.data.qpos.copy(),
            "prev_qpos": self.prev_qpos.copy(),
            "ee_pos": self._ee_local.copy(),
            "wbquat": self.get_wbody_quat(),
            "wbpos": self.get_wbody_pos(),
            "body_com": self.get_body_com(),
        }


@pytest.mark.parametrize("cyclic", [False, True])
def test_world_rfc_explicit_matches_reference(ref_rf, cyclic):
    rng = np.random.RandomState(7)
    ws = {"w_p": 0.5, "w_v": 0.1, "w_e": 0.2, "w_c": 0.1, "w_vf": 0.05,
          "w_cp": 0.05, "k_p": 2.0, "k_v": 0.005, "k_e": 20.0, "k_c": 1000.0,
          "k_vf": 1.0, "k_cp": 1.0}
    env = _FakeEnvFull(rng, ws=dict(ws), cyclic=cyclic)
    action = rng.randn(75 + env.vf_dim)
    ref_total, ref_comp = ref_rf.reward_func["world_rfc_explicit"](
        env, None, action, None)
    total, comp = world_rfc_explicit_reward(
        env.cur_state_dict(), env.expert, env.cur_t, action, ws=ws,
        b_diffw=env.cfg.b_diffw, vf_dim=env.vf_dim,
        body_vf_dim=env.body_vf_dim, dt=env.dt,
        cur_t=env.cur_t, start_ind=env.start_ind,
    )
    np.testing.assert_allclose(total, ref_total, atol=1e-10)
    np.testing.assert_allclose(comp, ref_comp, atol=1e-10)


def test_world_rfc_explicit_past_end_zeroes_bangvel(ref_rf):
    rng = np.random.RandomState(8)
    env = _FakeEnvFull(rng)
    env.start_ind = env.expert["len"]  # start_ind + t >= len -> zero e_bangvel
    action = rng.randn(75 + env.vf_dim)
    ref_total, ref_comp = ref_rf.reward_func["world_rfc_explicit"](
        env, None, action, None)
    total, comp = world_rfc_explicit_reward(
        env.cur_state_dict(), env.expert, env.cur_t, action,
        vf_dim=env.vf_dim, body_vf_dim=env.body_vf_dim, dt=env.dt,
        cur_t=env.cur_t, start_ind=env.start_ind,
    )
    np.testing.assert_allclose(total, ref_total, atol=1e-10)
    np.testing.assert_allclose(comp, ref_comp, atol=1e-10)


@pytest.mark.parametrize("rid,ours", [
    ("local_rfc_implicit", local_rfc_implicit_reward),
    ("local_rfc_explicit", local_rfc_explicit_reward),
])
def test_local_rfc_matches_reference(ref_rf, rid, ours):
    rng = np.random.RandomState(9)
    # b_diffw multiplies the 7 non-root joints of the 8-quat fake skeleton
    env = _FakeEnvFull(rng, b_diffw=np.linspace(0.5, 1.5, 7))
    action = rng.randn(75 + env.vf_dim)
    ref_total, ref_comp = ref_rf.reward_func[rid](env, None, action, None)
    kwargs = dict(b_diffw=env.cfg.b_diffw, vf_dim=env.vf_dim, dt=env.dt,
                  obs_coord=env.cfg.obs_coord)
    if rid.endswith("explicit"):
        kwargs["body_vf_dim"] = env.body_vf_dim
    total, comp = ours(
        env.cur_state_dict(), env.expert, env.cur_t, action, **kwargs)
    np.testing.assert_allclose(total, ref_total, atol=1e-9)
    np.testing.assert_allclose(comp, ref_comp, atol=1e-9)


@pytest.mark.parametrize("rid,ours", [
    ("world_rfc_implicit_v2", world_rfc_implicit_v2),
    ("world_rfc_implicit_v3", world_rfc_implicit_v3),
])
def test_world_rfc_v2_v3_match_reference(ref_rf, rid, ours):
    rng = np.random.RandomState(10)
    ws = {"k_p": 0.4, "k_wp": 0.4, "k_v": 0.005, "k_j": 100.0, "k_c": 100.0,
          "k_vf": 1.0, "jpos_diffw": list(rng.uniform(0.5, 2.0, 8))}
    env = _FakeEnvFull(rng, j=8, nb=8, ws=dict(ws))
    action = rng.randn(75 + env.vf_dim)
    ref_total, ref_comp = ref_rf.reward_func[rid](env, None, action, None)
    total, comp = ours(
        env.cur_state_dict(), env.expert, env.cur_t, action, ws=ws,
        vf_dim=env.vf_dim, dt=env.dt,
    )
    np.testing.assert_allclose(total, ref_total, atol=1e-10)
    np.testing.assert_allclose(comp, ref_comp, atol=1e-10)


def test_qvel_helpers_match_khrylib(ref_rf):
    import importlib

    kmath = importlib.import_module("copycat.khrylib.utils.math")
    rng = np.random.RandomState(11)
    for _ in range(5):
        q0 = np.concatenate(
            [rng.randn(3), _rand_quats(rng, 1), rng.uniform(-4, 4, 69)])
        q1 = np.concatenate(
            [rng.randn(3), _rand_quats(rng, 1), rng.uniform(-4, 4, 69)])
        np.testing.assert_allclose(
            get_qvel_fd_new(q0, q1, 1 / 30),
            kmath.get_qvel_fd_new(q0, q1, 1 / 30), atol=1e-8)
        np.testing.assert_allclose(
            get_qvel_fd_new(q0, q1, 1 / 30, "heading"),
            kmath.get_qvel_fd_new(q0, q1, 1 / 30, "heading"), atol=1e-8)
        np.testing.assert_allclose(
            de_heading(q0[3:7]), kmath.de_heading(q0[3:7]), atol=1e-10)
        v = rng.randn(3)
        np.testing.assert_allclose(
            transform_vec(v, q0[3:7], "heading"),
            kmath.transform_vec(v, q0[3:7], "heading"), atol=1e-10)
        np.testing.assert_allclose(
            quat_mul_vec(q0[3:7], v), kmath.quat_mul_vec(q0[3:7], v),
            atol=1e-10)


def test_registry_covers_reference_registry(ref_rf):
    assert set(ref_rf.reward_func) == set(UHC_REWARD_FUNCS)


def test_expert_attrs_single_frame():
    mujoco = pytest.importorskip("mujoco")  # noqa: F841
    from egoego_release_tpu.rl.mujoco_env import MujocoHumanoidEnv

    xml = "/root/reference/kinpoly/assets/mujoco_models/humanoid_smpl_neutral_mesh.xml"
    env = MujocoHumanoidEnv(xml, residual_force=False)
    q = np.zeros((1, env.model.nq))
    q[:, 2], q[:, 3] = 0.91, 1.0
    attrs = expert_physics_attrs(env, q)
    assert attrs["bquat"].shape[0] == 1
    assert attrs["bangvel"].shape == (1, (attrs["bquat"].shape[1] // 4) * 3)
    assert np.allclose(attrs["bangvel"], 0.0)


def test_expert_replay_ranks_highest_on_real_model():
    mujoco = pytest.importorskip("mujoco")  # noqa: F841
    from egoego_release_tpu.rl.mujoco_env import MujocoHumanoidEnv
    from egoego_release_tpu.rl.uhc_rewards import body_qposaddr, body_quat_local

    xml = "/root/reference/kinpoly/assets/mujoco_models/humanoid_smpl_neutral_mesh.xml"
    env = MujocoHumanoidEnv(xml, residual_force=False)
    rng = np.random.RandomState(3)
    t, nq = 6, env.model.nq
    qpos = np.zeros((t, nq))
    qpos[:, 2], qpos[:, 3] = 0.91, 1.0
    qpos[:, 7:] = 0.15 * rng.randn(t, nq - 7).cumsum(0) * 0.2

    expert = expert_physics_attrs(env, qpos)
    assert expert["bquat"].shape[0] == t and expert["bangvel"].shape[0] == t

    qaddr = body_qposaddr(env.model)

    def cur_state(q, q_prev):
        env.data.qpos[:nq] = q
        mujoco.mj_kinematics(env.model, env.data)
        mujoco.mj_comPos(env.model, env.data)
        from egoego_release_tpu.rl.uhc_rewards import env_com, env_ee_wpos

        return {
            "bquat": body_quat_local(q, qaddr, env.body_names),
            "prev_bquat": body_quat_local(q_prev, qaddr, env.body_names),
            "ee_wpos": env_ee_wpos(env),
            "com": env_com(env),
        }

    ind = 4
    action = np.zeros(env.ndof + 6)
    r_expert, _ = world_rfc_implicit_reward(
        cur_state(qpos[ind], qpos[ind - 1]), expert, ind, action, dt=env.dt)
    perturbed = qpos[ind].copy()
    perturbed[7:] += 0.3
    perturbed_prev = qpos[ind - 1].copy()
    perturbed_prev[7:] += 0.3
    r_pert, _ = world_rfc_implicit_reward(
        cur_state(perturbed, perturbed_prev), expert, ind, action, dt=env.dt)
    assert r_expert > r_pert
    assert r_expert > 0.9  # replaying the expert is near-perfect


def test_expert_attrs_match_reference_get_expert():
    """Drive the reference's OWN copycat/utils/tools.get_expert pipeline
    (velocity chains, frame-0 copies, +-10 clipping, attr ordering) through
    an adapter over our MujocoHumanoidEnv, and check expert_physics_attrs
    reproduces every shared attr on the real model."""
    mujoco = pytest.importorskip("mujoco")
    import importlib

    tools = importlib.import_module("copycat.utils.tools")
    from egoego_release_tpu.rl.mujoco_env import MujocoHumanoidEnv
    from egoego_release_tpu.rl import uhc_rewards as U

    xml = "/root/reference/kinpoly/assets/mujoco_models/humanoid_smpl_neutral_mesh.xml"
    env = MujocoHumanoidEnv(xml, residual_force=False)
    qaddr = U.body_qposaddr(env.model)

    class _SimShim:
        def __init__(self, env):
            self._env = env

        def get_state(self):
            return (self._env.data.qpos.copy(), self._env.data.qvel.copy())

        def set_state(self, state):
            self._env.data.qpos[:], self._env.data.qvel[:] = state
            mujoco.mj_forward(self._env.model, self._env.data)

        def forward(self):
            mujoco.mj_forward(self._env.model, self._env.data)

    class _EnvAdapter:
        """mujoco-py-flavored surface get_expert reads, backed by our env +
        the same accessor helpers the rewards use."""

        def __init__(self, env):
            self._env = env
            self.data = env.data
            self.dt = env.dt
            self.sim = _SimShim(env)
            self.cfg = type("C", (), {"obs_coord": "heading"})()

        def get_ee_pos(self, transform):
            if transform is None:
                return U.env_ee_wpos(self._env)
            return U.env_ee_local(self._env, transform)

        def get_wbody_pos(self):
            return U.env_wbpos(self._env)

        def get_wbody_quat(self):
            return U.env_wbquat(self._env)

        def get_body_quat(self):
            return U.body_quat_local(
                self._env.data.qpos.copy(), qaddr, self._env.body_names)

        def get_com(self):
            return U.env_com(self._env)

        def get_body_com(self):
            return U.env_body_com(self._env)

        def get_head(self):
            return self._env.get_head_pose()

    rng = np.random.RandomState(21)
    t, nq = 6, env.model.nq
    qpos = np.zeros((t, nq))
    qpos[:, 2], qpos[:, 3] = 0.91, 1.0
    qpos[:, :3] += 0.1 * rng.randn(t, 3).cumsum(0)
    qpos[:, 3:7] += 0.05 * rng.randn(t, 4)
    qpos[:, 3:7] /= np.linalg.norm(qpos[:, 3:7], axis=1, keepdims=True)
    qpos[:, 7:] = 0.1 * rng.randn(t, nq - 7)

    ref = tools.get_expert(qpos.copy(), {"cyclic": False}, _EnvAdapter(env))
    ours = U.expert_physics_attrs(env, qpos.copy())

    for key in ["qpos", "bquat", "bangvel", "ee_wpos", "ee_pos", "com",
                "body_com", "wbpos", "wbquat", "rq_rmh", "qvel",
                "rlinv_local", "rangv"]:
        np.testing.assert_allclose(
            np.asarray(ours[key]), np.asarray(ref[key]), atol=1e-8,
            err_msg=key)
    np.testing.assert_allclose(ours["rlinv"], np.asarray(ref["rlinv"]),
                               atol=1e-8)
    assert ours["len"] == ref["len"]
    np.testing.assert_allclose(ours["head_info"], np.asarray(ref["head_pose"]),
                               atol=1e-8)


def test_physics_imitation_with_uhc_reward():
    """PhysicsImitation(reward_id='world_rfc_implicit') steps the simulator
    and scores against the set_expert trajectory (copycat loop shape)."""
    mujoco = pytest.importorskip("mujoco")  # noqa: F841
    from egoego_release_tpu.rl.imitation import PhysicsImitation

    xml = "/root/reference/kinpoly/assets/mujoco_models/humanoid_smpl_neutral_mesh.xml"
    sim = PhysicsImitation(xml, reward_id="world_rfc_implicit",
                           reward_weights={"w_vf": 0.05})
    rng = np.random.RandomState(5)
    t, nq = 4, sim.env.model.nq
    expert_qpos = np.zeros((t, nq))
    expert_qpos[:, 2], expert_qpos[:, 3] = 0.91, 1.0
    expert_qpos[:, 7:] = 0.02 * rng.randn(t, nq - 7)
    sim.set_expert(expert_qpos)

    sim.reset(expert_qpos[0])
    action = np.zeros(sim.env.action_dim)
    r, done, info = sim.step(action, expert_qpos[1], expert_ind=1)
    assert 0.0 < r <= 1.0 and np.isfinite(info["body_diff"])
    assert info["components"].shape == (5,)
    assert isinstance(done, bool) or done in (True, False)


def test_uhc_rewards_on_object_model_scope_body_lim():
    """On the *_all MJCF (humanoid + 5 objects) every UHC world reward and
    the wbquat/wbpos/body_com extractors stay scoped to the 24 humanoid
    bodies (BODY_LIM, humanoid_im.py:26) — object bodies must not leak into
    pose terms."""
    mujoco = pytest.importorskip("mujoco")  # noqa: F841
    from egoego_release_tpu.rl.imitation import PhysicsImitation
    from egoego_release_tpu.rl import uhc_rewards as U

    xml = ("/root/reference/kinpoly/assets/mujoco_models/"
           "humanoid_smpl_neutral_mesh_all.xml")
    sim = PhysicsImitation(xml, reward_id="world_rfc_implicit_v2")
    env = sim.env
    assert env.model.nbody > 25  # objects present
    assert U.env_wbquat(env).shape == (24 * 4,)
    assert U.env_wbpos(env).shape == (24 * 3,)
    assert U.env_body_com(env).shape == (24 * 3,)

    rng = np.random.RandomState(13)
    t, nq = 4, env.model.nq
    eq = np.zeros((t, nq))
    eq[:, 2], eq[:, 3] = 0.91, 1.0
    eq[:, 7:76] = 0.02 * rng.randn(t, 69)
    sim.set_expert(eq)
    assert sim._expert["wbquat"].shape == (t, 24 * 4)
    sim.reset(eq[0])
    r, done, info = sim.step(np.zeros(env.action_dim), eq[1], expert_ind=1)
    assert np.isfinite(r) and np.isfinite(info["components"]).all()


def test_mcp_policy_and_physics_ppo():
    """MCPPolicy (copycat PolicyMCP): blended mean has the right shape, the
    composer weights sum to 1 implicitly (mean within primitive hull), and
    the policy drops into PhysicsPPO (actor_type='mcp')."""
    import jax
    import jax.numpy as jnp

    from egoego_release_tpu.rl.ppo import MCPPolicy

    pol = MCPPolicy(action_dim=7, num_primitive=3, hsize=(16, 8),
                    composer_hsize=(8,))
    key = jax.random.PRNGKey(0)
    obs = jax.random.normal(key, (4, 11))
    params = pol.init(key, obs)
    mean, log_std = pol.apply(params, obs)
    assert mean.shape == (4, 7) and log_std.shape == (7,)
    assert np.isfinite(np.asarray(mean)).all()
    # softmax blending: the mean is a convex combination, so it is bounded
    # componentwise by the min/max over primitives.  Check with K=2 params
    # where both primitives are forced identical -> mean equals either one.
    pol2 = MCPPolicy(action_dim=7, num_primitive=2, hsize=(16, 8),
                     composer_hsize=(8,))
    p2 = pol2.init(key, obs)
    import flax

    flat = flax.traverse_util.flatten_dict(p2["params"])
    for k in list(flat):
        if k[0].startswith("primitive_1"):
            flat[k] = flat[("primitive_0" + k[0][len("primitive_1"):],) + k[1:]]
    p2 = {"params": flax.traverse_util.unflatten_dict(flat)}
    m2, _ = pol2.apply(p2, obs)
    # with identical primitives the composer weights cannot matter:
    # perturbing the composer must leave the blended mean unchanged
    flat = flax.traverse_util.flatten_dict(p2["params"])
    for k in list(flat):
        if k[0].startswith("composer"):
            flat[k] = flat[k] + 0.7
    p2_pert = {"params": flax.traverse_util.unflatten_dict(flat)}
    m2_pert, _ = pol2.apply(p2_pert, obs)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m2_pert), atol=1e-5)

    mujoco = pytest.importorskip("mujoco")  # noqa: F841
    from egoego_release_tpu.rl.imitation import PhysicsImitation
    from egoego_release_tpu.rl.train_physics_agent import PhysicsPPO

    xml = "/root/reference/kinpoly/assets/mujoco_models/humanoid_smpl_neutral_mesh.xml"
    sess = PhysicsImitation(xml, reward_id="dynamic_supervision_v4")
    agent = PhysicsPPO(sess, hsize=(32, 16), epochs=2,
                       actor_type="mcp", num_primitive=2)
    key = jax.random.PRNGKey(1)
    key, k0 = jax.random.split(key)
    state = agent.init_state(k0)
    qpos0 = np.zeros(sess.env.model.nq)
    qpos0[2], qpos0[3] = 0.91, 1.0
    targets = np.tile(qpos0, (6, 1))
    before = jax.tree.map(np.copy, state["policy"])
    state, key, m = agent.iterate(state, key, qpos0, targets, horizon=6)
    assert np.isfinite(m["reward_mean"]) and np.isfinite(m["policy_loss"])
    moved = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        before, state["policy"])
    assert max(jax.tree.leaves(moved)) > 0
