"""relive AR-env observations vs the reference's OWN HumanoidAREnv methods.

humanoid_ar_v1.py imports under tests/refstubs (gym/mujoco_py/glfw/
torchgeometry shims); get_ar_obs_v1 / get_full_obs / get_full_obs_v1 are
pure numpy over duck-typed env state, so we bind them onto a fake env and
require rl/ar_obs.py to reproduce the observation vectors bit-for-bit.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests")
import reforacle  # noqa: E402

from egoego_release_tpu.rl import ar_obs as A  # noqa: E402


@pytest.fixture(scope="module")
def ref_cls():
    reforacle.add_reference_paths()
    if "/root/reference/kinpoly" not in sys.path:
        sys.path.insert(0, "/root/reference/kinpoly")
    ha = pytest.importorskip("relive.envs.humanoid_ar_v1")
    return ha.HumanoidAREnv


def _rand_quats(rng, j):
    q = rng.randn(j, 4)
    return (q / np.linalg.norm(q, axis=1, keepdims=True)).reshape(-1)


NB, NQ, NV, NACT = 24, 76, 75, 3


def _make_fake(ref_cls, rng, use_context=False, use_of=False, use_head=True,
               use_vel=True, use_action=True, ar_model_v=1, policy_v=1,
               with_rnn_feat=False, obs_vel="full", active_action=True):
    class _Obj:
        pass

    env = _Obj()
    for name in ["get_ar_obs_v1", "get_full_obs", "get_full_obs_v1",
                 "get_wbody_pos", "get_wbody_quat",
                 "get_head_idx", "get_obj_qpos", "remove_base_rot",
                 "get_target_qpos", "get_target_kin_pose",
                 "get_target_joint_pos", "get_target_com_pos",
                 "get_target_wbquat"]:
        setattr(env, name, getattr(ref_cls, name).__get__(env))

    env.cfg = _Obj()
    env.cfg.use_context, env.cfg.use_of = use_context, use_of
    env.cfg.use_head, env.cfg.use_vel = use_head, use_vel
    env.cfg.use_action = use_action
    env.cc_cfg = _Obj()
    env.cc_cfg.obs_coord = "heading"
    env.cc_cfg.obs_vel = obs_vel
    env.cc_cfg.obs_heading = False
    env.cc_cfg.root_deheading = True
    env.ar_model_v = ar_model_v
    env.policy_v = policy_v
    env.qpos_lim, env.qvel_lim, env.body_lim = NQ, NV, 25
    env.base_rot = list(A.obs_v12_core.__globals__["BASE_ROT"])
    env.cur_t = 2

    t = 6
    one_hot = np.zeros(NACT)
    if active_action:
        one_hot[1] = 1.0
    env.ar_context = {
        "action_one_hot": np.tile(one_hot, (t, 1)),
        "head_pose": np.concatenate(
            [rng.randn(t, 3), np.stack([_rand_quats(rng, 1) for _ in range(t)])],
            axis=1),
        "head_vels": rng.randn(t, 6),
        "obj_head_relative_poses": rng.randn(t, 7),
        "of": rng.randn(t, 16),
        "ar_qpos": rng.randn(t, NQ),
    }
    if with_rnn_feat:
        env.ar_context["context_feat_rnn"] = rng.randn(t, 256)

    # object dofs appended after the humanoid qpos (get_obj_qpos :784-795)
    env.action_index_map = [0, 7, 14]
    env.action_len = [7, 7, 7]
    n_obj_q = 21
    env.data = _Obj()
    full_q = np.concatenate([
        rng.randn(3), _rand_quats(rng, 1), rng.uniform(-2, 2, NQ - 7),
        np.concatenate([np.concatenate([rng.randn(3), _rand_quats(rng, 1)])
                        for _ in range(3)]),
    ])
    assert full_q.shape == (NQ + n_obj_q,)
    env.data.qpos = full_q
    env.data.qvel = rng.randn(NV + 18)
    env.data.body_xpos = rng.randn(26, 3)
    env.data.xipos = rng.randn(26, 3)
    env.data.body_xquat = np.concatenate(
        [[1, 0, 0, 0], _rand_quats(rng, 25)]).reshape(26, 4)

    class _Model:
        _body_name2id = {"Head": 16}

    env.model = _Model()
    env.target = {
        "qpos": np.concatenate([rng.randn(3), _rand_quats(rng, 1),
                                rng.uniform(-2, 2, NQ - 7)]),
        "wbpos": rng.randn(NB * 3),
        "body_com": rng.randn(NB * 3),
        "wbquat": _rand_quats(rng, NB),
    }
    return env


def _cur_state(env):
    return {
        "qpos": env.data.qpos[:env.qpos_lim].copy(),
        "qvel": env.data.qvel[:env.qvel_lim].copy(),
        "wbpos": env.data.body_xpos[1:env.body_lim].copy().ravel(),
        "body_com": env.data.xipos[1:env.body_lim].copy().ravel(),
        "wbquat": env.data.body_xquat[1:env.body_lim].copy().ravel(),
    }


def _ar_specs(env):
    return dict(use_context=env.cfg.use_context, use_of=env.cfg.use_of,
                use_head=env.cfg.use_head, use_vel=env.cfg.use_vel,
                use_action=env.cfg.use_action, ar_model_v=env.ar_model_v,
                policy_v=env.policy_v)


@pytest.mark.parametrize("kw", [
    {},
    {"use_head": False},
    {"use_vel": False},
    {"use_action": False},
    {"use_of": True},
    {"use_context": True, "with_rnn_feat": True},
    {"policy_v": 2},
    {"active_action": False},
])
def test_ar_obs_matches_reference(ref_cls, kw):
    rng = np.random.RandomState(sum(map(ord, str(sorted(kw.items())))) % 997)
    env = _make_fake(ref_cls, rng, **kw)
    ref = env.get_ar_obs_v1()
    one_hot = env.ar_context["action_one_hot"][0]
    obj_qpos = env.get_obj_qpos(action_one_hot=one_hot)
    ours = A.get_ar_obs_v1(
        _cur_state(env), env.ar_context, env.cur_t,
        obj_qpos=obj_qpos, head_idx=env.get_head_idx(),
        specs=_ar_specs(env))
    assert ours.shape == np.asarray(ref).shape
    np.testing.assert_allclose(ours, ref, atol=1e-10)


@pytest.mark.parametrize("obs_v", [0, 1])
@pytest.mark.parametrize("obs_vel", ["root", "full"])
def test_cc_obs_matches_reference(ref_cls, obs_v, obs_vel):
    rng = np.random.RandomState(31 + obs_v)
    env = _make_fake(ref_cls, rng, obs_vel=obs_vel)
    ref = env.get_full_obs() if obs_v == 0 else env.get_full_obs_v1()
    specs = dict(obs_coord="heading", obs_vel=obs_vel, obs_heading=False,
                 root_deheading=True)
    ours = A.get_cc_obs(_cur_state(env), env.target, obs_v=obs_v, specs=specs)
    assert ours.shape == np.asarray(ref).shape
    np.testing.assert_allclose(ours, ref, atol=1e-10)


def test_obj_qpos_identity_when_no_action(ref_cls):
    rng = np.random.RandomState(5)
    env = _make_fake(ref_cls, rng, active_action=False)
    one_hot = env.ar_context["action_one_hot"][0]
    np.testing.assert_allclose(env.get_obj_qpos(action_one_hot=one_hot),
                               A.NO_ACTION_OBJ_QPOS)
