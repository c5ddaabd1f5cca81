"""PD + residual-force control laws vs a scipy/numpy transcription of the
reference math (humanoid_ar_v1.py:409-495)."""

import numpy as np
import jax.numpy as jnp
from scipy.linalg import cho_factor, cho_solve
from scipy.spatial.transform import Rotation as ScipyRot

from egoego_release_tpu.rl import control as C


def _spd(rng, n):
    a = rng.randn(n, n)
    return a @ a.T + n * np.eye(n)


def _ref_compute_torque(ctrl, qpos, qvel, base_pos, M, Cb, jkp, jkd, dt, a_scale):
    """Direct numpy transcription of compute_torque (:439-469) including the
    while-loop angle wrapping and cho_solve stable-PD accel (:409-437)."""
    ndof = ctrl.shape[0]
    ctrl_joint = ctrl * a_scale
    base_pos = base_pos.copy()
    while np.any(base_pos - qpos[7:] > np.pi):
        base_pos[base_pos - qpos[7:] > np.pi] -= 2 * np.pi
    while np.any(base_pos - qpos[7:] < -np.pi):
        base_pos[base_pos - qpos[7:] < -np.pi] += 2 * np.pi
    target_pos = base_pos + ctrl_joint

    nv = 6 + ndof
    k_p = np.zeros(nv)
    k_d = np.zeros(nv)
    k_p[6:] = jkp
    k_d[6:] = jkd
    qpos_err = np.concatenate((np.zeros(6), qpos[7:] + qvel[6:] * dt - target_pos))
    qvel_err = qvel.copy()
    K_p, K_d = np.diag(k_p), np.diag(k_d)
    q_accel = cho_solve(
        cho_factor(M + K_d * dt),
        -Cb[:, None] - K_p.dot(qpos_err[:, None]) - K_d.dot(qvel_err[:, None]),
    ).squeeze()
    qvel_err = qvel_err + q_accel * dt
    return -jkp * qpos_err[6:] - jkd * qvel_err[6:]


def test_compute_torque_matches_reference_math():
    rng = np.random.RandomState(0)
    ndof, nv, dt, a_scale = 12, 18, 1.0 / 450.0, 2.0
    for seed in range(3):
        r = np.random.RandomState(seed)
        ctrl = r.randn(ndof).astype(np.float64)
        qpos = np.concatenate([r.randn(3), ScipyRot.random(random_state=r).as_quat()[[3, 0, 1, 2]],
                               r.uniform(-np.pi, np.pi, ndof)])
        qvel = r.randn(nv) * 0.5
        # targets offset by multiples of 2pi to exercise the wrapping
        base_pos = qpos[7:] + r.uniform(-0.5, 0.5, ndof) + r.choice([-2 * np.pi, 0, 2 * np.pi], ndof)
        M = _spd(r, nv)
        Cb = r.randn(nv)
        jkp = r.uniform(50, 500, ndof)
        jkd = jkp * 0.1

        ref = _ref_compute_torque(ctrl, qpos, qvel, base_pos, M, Cb, jkp, jkd, dt, a_scale)
        ours = C.compute_torque(
            jnp.asarray(ctrl), jnp.asarray(qpos), jnp.asarray(qvel),
            jnp.asarray(base_pos), jnp.asarray(M), jnp.asarray(Cb),
            jnp.asarray(jkp), jnp.asarray(jkd), dt, a_scale,
        )
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_rfc_implicit_matches_reference_math():
    import reforacle  # noqa: F401 — ensures refstub paths for consistency

    rng = np.random.RandomState(1)
    for seed in range(3):
        r = np.random.RandomState(seed)
        vf = r.randn(9)
        quat = ScipyRot.random(random_state=r).as_quat()[[3, 0, 1, 2]]
        scale, lim = 100.0, 50.0

        # reference math (humanoid_ar_v1.py:485-493) in numpy
        def qmul(a, b):
            aw, ax, ay, az = a
            bw, bx, by, bz = b
            return np.array([
                aw * bw - ax * bx - ay * by - az * bz,
                aw * bx + ax * bw + ay * bz - az * by,
                aw * by - ax * bz + ay * bw + az * bx,
                aw * bz + ax * by - ay * bx + az * bw,
            ])

        base = np.array(C.BASE_ROT)
        base_inv = base * np.array([1, -1, -1, -1])
        q_nb = qmul(quat, base_inv)
        hq = q_nb.copy()
        hq[1] = hq[2] = 0.0
        hq /= np.linalg.norm(hq)
        v = vf * scale
        v3 = ScipyRot.from_quat(hq[[1, 2, 3, 0]]).apply(v[:3])
        ref = np.clip(np.concatenate([v3, v[3:]]), -lim, lim)

        ours = C.rfc_implicit_force(jnp.asarray(vf), jnp.asarray(quat), scale, lim)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-5)


def test_stable_pd_tracks_target():
    """Sanity: iterating the stable-PD law on a toy double-integrator drives
    the joint toward the target (the control law is a *controller*, even
    without contacts)."""
    rng = np.random.RandomState(2)
    ndof, nv, dt = 4, 10, 1.0 / 450.0
    M = np.eye(nv) * 2.0
    Cb = np.zeros(nv)
    jkp = np.full(ndof, 400.0)
    jkd = np.full(ndof, 40.0)
    qpos = np.concatenate([np.zeros(3), [1, 0, 0, 0], rng.uniform(-1, 1, ndof)])
    qvel = np.zeros(nv)
    target = rng.uniform(-1, 1, ndof)

    err0 = np.abs(qpos[7:] - target).mean()
    for _ in range(300):
        tau = np.asarray(C.compute_torque(
            jnp.zeros(ndof), jnp.asarray(qpos), jnp.asarray(qvel),
            jnp.asarray(target), jnp.asarray(M), jnp.asarray(Cb),
            jnp.asarray(jkp), jnp.asarray(jkd), dt,
        ))
        # toy dynamics: M qacc = tau (root locked)
        qacc = np.concatenate([np.zeros(6), tau]) / np.diag(M)
        qvel = qvel + qacc * dt
        qpos[7:] = qpos[7:] + qvel[6:] * dt
    err1 = np.abs(qpos[7:] - target).mean()
    assert err1 < 0.05 * err0


def test_pd_and_rfc_match_reference_own_methods():
    """compute_torque + rfc_implicit vs the reference's OWN HumanoidAREnv
    methods, bound onto a duck env backed by real MuJoCo state (the hand-
    written math oracle above cross-checks the equations; this pins the
    actual reference code path incl. compute_desired_accel via mj_fullM)."""
    import sys

    import pytest

    sys.path.insert(0, "/root/repo/tests")
    import reforacle

    reforacle.add_reference_paths()
    if "/root/reference/kinpoly" not in sys.path:
        sys.path.insert(0, "/root/reference/kinpoly")
    mujoco = pytest.importorskip("mujoco")
    import importlib

    ha = importlib.import_module("relive.envs.humanoid_ar_v1")
    from egoego_release_tpu.rl.mujoco_env import MujocoHumanoidEnv

    xml = ("/root/reference/kinpoly/assets/mujoco_models/"
           "humanoid_smpl_neutral_mesh.xml")
    env = MujocoHumanoidEnv(xml, residual_force=True)
    rng = np.random.RandomState(3)
    nq, nv, ndof = env.model.nq, env.model.nv, env.ndof
    qpos = np.zeros(nq)
    qpos[:3] = [0.1, -0.2, 0.92]
    quat = rng.randn(4)
    qpos[3:7] = quat / np.linalg.norm(quat)
    qpos[7:] = 0.3 * rng.randn(ndof)
    qvel = 0.5 * rng.randn(nv)
    env.reset(qpos, qvel)

    target = qpos[7:] + rng.uniform(-0.4, 0.4, ndof) \
        + rng.choice([-2 * np.pi, 0, 2 * np.pi], ndof)
    ctrl = rng.randn(ndof)

    class _Duck:
        pass

    ref = _Duck()
    for name in ["compute_torque", "compute_desired_accel",
                 "remove_base_rot", "rfc_implicit"]:
        setattr(ref, name, getattr(ha.HumanoidAREnv, name).__get__(ref))
    ref.cc_cfg = _Duck()
    ref.cc_cfg.a_scale = float(env.a_scale) if np.isscalar(env.a_scale) \
        else 1.0
    ref.cc_cfg.action_v = 1
    ref.cc_cfg.jkp = np.asarray(env.jkp)
    ref.cc_cfg.jkd = np.asarray(env.jkd)
    ref.cc_cfg.residual_force_scale = env.rfc_scale
    ref.cc_cfg.residual_force_lim = env.rfc_lim
    ref.ndof = ndof
    ref.qvel_lim = nv
    ref.base_rot = [0.7071, 0.7071, 0.0, 0.0]

    class _M:
        pass

    m = _M()
    m.opt = env.model.opt
    m.nv = env.model.nv
    m._m = env.model
    m._d = env.data  # for the stubbed mj_fullM (see refstubs/mujoco_py)
    ref.model = m
    ref.data = env.data
    ref.get_humanoid_qpos = lambda: env.data.qpos.copy()
    ref.get_humanoid_qvel = lambda: env.data.qvel.copy()
    ref.get_target_kin_pose = lambda: target.copy()

    ref_torque = ref.compute_torque(np.concatenate([ctrl, np.zeros(6)]))

    from egoego_release_tpu.rl import control as C2

    M, Cb = env.mass_matrix_and_bias()
    dt = env.model.opt.timestep
    ours = np.asarray(C2.compute_torque(
        jnp.asarray(ctrl, jnp.float64), jnp.asarray(qpos, jnp.float64),
        jnp.asarray(qvel, jnp.float64), jnp.asarray(target, jnp.float64),
        jnp.asarray(M, jnp.float64), jnp.asarray(Cb, jnp.float64),
        jnp.asarray(env.jkp, jnp.float64), jnp.asarray(env.jkd, jnp.float64),
        dt, ref.cc_cfg.a_scale,
    ))
    np.testing.assert_allclose(ours, ref_torque, rtol=2e-4, atol=2e-3)

    # rfc_implicit: the reference writes qfrc_applied in place
    vf = rng.randn(env.vf_dim)
    env.data.qfrc_applied[:] = 0.0
    ref.rfc_implicit(vf.copy())
    ref_qfrc = env.data.qfrc_applied[: env.vf_dim].copy()
    ours_vf = np.asarray(C2.rfc_implicit_force(
        jnp.asarray(vf, jnp.float64), jnp.asarray(qpos[3:7], jnp.float64),
        env.rfc_scale, env.rfc_lim,
    ))
    np.testing.assert_allclose(ours_vf, ref_qfrc, atol=1e-4)  # f32 vs f64
