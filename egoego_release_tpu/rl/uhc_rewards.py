"""UHC (copycat) world-coordinate imitation rewards on simulator state.

Port of kinpoly/copycat/core/reward_function.py — the family the UHC
training configs actually use (`reward_id: world_rfc_implicit` in BOTH
bundled configs, copycat/cfg/{copycat,deepmimic}.yml:27):

  reward = (w_p e^{-k_p |pose_diff|^2} + w_v e^{-k_v |bangvel_diff|^2}
            + w_e e^{-k_e |ee_diff|^2} + w_c e^{-k_c |com_diff|^2}
            + w_vf e^{-k_vf |vf|^2}) / sum(w)            (:4-54)

plus the multiplicative variant `world_rfc_implicit_v1_mul` (:56-106).
Everything is a pure numpy function over explicit state (this repo's
rl/control.py style); the simulator quantities come from
MujocoHumanoidEnv via the helpers below:

  * `body_quat_local`  — root quat + per-body sxyz-euler->quat of the qpos
    joint angles (humanoid_im.py:384-397; NOTE: local joint quats, not the
    world xquat used by the relive dynamic-supervision context)
  * `expert_physics_attrs` — replays expert qpos through mj_kinematics +
    mj_comPos collecting bquat/ee_wpos/com and finite-difference bangvel,
    the subset of copycat/utils/tools.get_expert (:5-45) these rewards read

Golden-tested against the reference's own reward functions
(tests/test_uhc_rewards.py).
"""

from __future__ import annotations

import numpy as np

EE_NAMES = ("L_Toe", "R_Toe", "L_Wrist", "R_Wrist", "Head")  # humanoid_im.py:371

_DEFAULTS = dict(w_p=0.6, w_v=0.1, w_e=0.2, w_c=0.1, w_vf=0.0,
                 k_p=2.0, k_v=0.005, k_e=20.0, k_c=1000.0, k_vf=1.0, v_ord=2)


# -- quaternion helpers (wxyz, numpy) ---------------------------------------

def _quat_mul(a, b):
    w1, x1, y1, z1 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    w2, x2, y2, z2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return np.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], axis=-1)


def _quat_inv(q):
    out = q.copy()
    out[..., 1:] *= -1.0
    return out / np.maximum((q * q).sum(-1, keepdims=True), 1e-12)


def multi_quat_diff(nq1: np.ndarray, nq0: np.ndarray) -> np.ndarray:
    """Flat (J*4,) quat arrays -> per-body relative quats (khrylib math)."""
    a = nq1.reshape(-1, 4)
    b = nq0.reshape(-1, 4)
    return _quat_mul(a, _quat_inv(b)).reshape(-1)


def multi_quat_norm(nq: np.ndarray) -> np.ndarray:
    """arccos(|w|) per body — the khrylib multi_quat_norm (math.py:173-177;
    the HALF rotation angle, no normalization)."""
    return np.arccos(np.clip(np.abs(nq[::4]), -1.0, 1.0))


def _rotation_from_quaternion(q: np.ndarray) -> np.ndarray:
    """(J, 4) -> (J, 3) axis*angle, angle = 2 acos(w) UNWRAPPED and axis from
    sqrt(1-w^2) (khrylib transformation.py:348-356 exactly — w < 0 yields
    angles > pi, which the reference's get_angvel_fd keeps)."""
    w = np.clip(q[:, 0], -1.0, 1.0)
    small = (1.0 - np.abs(w)) < 1e-8
    s = np.sqrt(np.maximum(1.0 - w * w, 1e-32))
    axis = np.where(small[:, None], np.array([1.0, 0.0, 0.0]), q[:, 1:4] / s[:, None])
    angle = np.where(small, 0.0, 2.0 * np.arccos(w))
    return axis * angle[:, None]


def get_angvel_fd(prev_bquat: np.ndarray, cur_bquat: np.ndarray, dt: float) -> np.ndarray:
    """Finite-difference body angular velocities, (J*3,) (math.py:69-75)."""
    dq = multi_quat_diff(cur_bquat, prev_bquat).reshape(-1, 4)
    return (_rotation_from_quaternion(dq) / dt).reshape(-1)


def euler_sxyz_to_quat(e: np.ndarray) -> np.ndarray:
    """Static-xyz euler (..., 3) -> wxyz quat (Gohlke quaternion_from_euler
    default axes, used by get_body_quat — humanoid_im.py:393)."""
    ai, aj, ak = e[..., 0] / 2.0, e[..., 1] / 2.0, e[..., 2] / 2.0
    ci, si = np.cos(ai), np.sin(ai)
    cj, sj = np.cos(aj), np.sin(aj)
    ck, sk = np.cos(ak), np.sin(ak)
    return np.stack([
        ci * cj * ck + si * sj * sk,
        si * cj * ck - ci * sj * sk,
        ci * sj * ck + si * cj * sk,
        ci * cj * sk - si * sj * ck,
    ], axis=-1)


# -- simulator-state extraction ---------------------------------------------

def body_qposaddr(model) -> dict[str, tuple[int, int]]:
    """body name -> (start, end) qpos address range (khrylib get_body_qposaddr)."""
    import mujoco

    out = {}
    for i in range(model.nbody):
        j0 = model.body_jntadr[i]
        if j0 < 0:
            continue
        j1 = j0 + model.body_jntnum[i]
        q0 = model.jnt_qposadr[j0]
        q1 = model.jnt_qposadr[j1] if j1 < model.njnt else model.nq
        name = mujoco.mj_id2name(model, mujoco.mjtObj.mjOBJ_BODY, i)
        out[name] = (int(q0), int(q1))
    return out


def body_quat_local(qpos: np.ndarray, qaddr: dict[str, tuple[int, int]],
                    body_names: list[str]) -> np.ndarray:
    """Flat (J*4,) local body quats: [root qpos quat, euler->quat per body]
    (humanoid_im.py:384-397; Pelvis holds the free joint, skipped)."""
    quats = [qpos[3:7]]
    for name in body_names:
        if name == "Pelvis" or name not in qaddr:
            continue
        s, e = qaddr[name]
        euler = np.zeros(3)
        euler[: e - s] = qpos[s:e]
        quats.append(euler_sxyz_to_quat(euler))
    return np.concatenate(quats)


def env_ee_wpos(env) -> np.ndarray:
    """World end-effector positions, (len(EE_NAMES)*3,) (get_ee_pos(None))."""
    out = []
    for name in EE_NAMES:
        i = env.body_names.index(name) + 1
        out.append(env.data.xpos[i].copy())
    return np.concatenate(out)


def env_com(env) -> np.ndarray:
    """Whole-tree center of mass (humanoid_im.py:411: subtree_com[0])."""
    return env.data.subtree_com[0].copy()


def expert_physics_attrs(env, qpos_seq: np.ndarray) -> dict:
    """Per-frame expert attrs these rewards read: bquat (T, J*4),
    bangvel (T, J*3) (frame 0 copies frame 1, tools.py:49-52), ee_wpos
    (T, 15), com (T, 3).  Replay uses mj_kinematics + mj_comPos only."""
    import mujoco

    qaddr = body_qposaddr(env.model)
    bquat, ee, com = [], [], []
    for fr in range(len(qpos_seq)):
        env.data.qpos[: qpos_seq.shape[1]] = qpos_seq[fr]
        mujoco.mj_kinematics(env.model, env.data)
        mujoco.mj_comPos(env.model, env.data)
        bquat.append(body_quat_local(qpos_seq[fr], qaddr, env.body_names))
        ee.append(env_ee_wpos(env))
        com.append(env_com(env))
    bquat = np.asarray(bquat)
    if len(bquat) > 1:
        bangvel = np.stack(
            [get_angvel_fd(bquat[i - 1], bquat[i], env.dt)
             for i in range(1, len(bquat))]
        )
        # frame 0 copies frame 1 (tools.py:49-52)
        bangvel = np.concatenate([bangvel[:1], bangvel], axis=0)
    else:
        bangvel = np.zeros((1, (bquat.shape[1] // 4) * 3))
    return {
        "bquat": bquat,
        "bangvel": bangvel,
        "ee_wpos": np.asarray(ee),
        "com": np.asarray(com),
        "qpos": np.asarray(qpos_seq),
    }


# -- rewards ------------------------------------------------------------------

def _terms(cur, expert, ind, action, ws, b_diffw, vf_dim, dt):
    w = dict(_DEFAULTS, **(ws or {}))
    pose_diff = multi_quat_norm(multi_quat_diff(cur["bquat"], expert["bquat"][ind]))
    pose_diff = pose_diff.copy()
    pose_diff[1:] *= b_diffw
    pose_dist = np.linalg.norm(pose_diff)
    pose_reward = np.exp(-w["k_p"] * pose_dist ** 2)

    cur_bangvel = get_angvel_fd(cur["prev_bquat"], cur["bquat"], dt)
    vel_dist = np.linalg.norm(cur_bangvel - expert["bangvel"][ind], ord=w["v_ord"])
    vel_reward = np.exp(-w["k_v"] * vel_dist ** 2)

    ee_dist = np.linalg.norm(cur["ee_wpos"] - expert["ee_wpos"][ind])
    ee_reward = np.exp(-w["k_e"] * ee_dist ** 2)

    com_dist = np.linalg.norm(cur["com"] - expert["com"][ind])
    com_reward = np.exp(-w["k_c"] * com_dist ** 2)

    if w["w_vf"] > 0.0 and vf_dim > 0:
        vf = np.asarray(action)[-vf_dim:]
        vf_reward = np.exp(-w["k_vf"] * np.linalg.norm(vf) ** 2)
    else:
        vf_reward = 0.0
    return w, pose_reward, vel_reward, ee_reward, com_reward, vf_reward


def world_rfc_implicit_reward(cur, expert, ind, action, ws=None,
                              b_diffw=1.0, vf_dim=6, dt=1 / 30):
    """(:4-54).  cur: dict(bquat, prev_bquat, ee_wpos, com); expert: the
    expert_physics_attrs dict; ind: expert frame index."""
    w, rp, rv, re, rc, rvf = _terms(cur, expert, ind, action, ws, b_diffw, vf_dim, dt)
    total = (w["w_p"] * rp + w["w_v"] * rv + w["w_e"] * re
             + w["w_c"] * rc + w["w_vf"] * rvf)
    total /= w["w_p"] + w["w_v"] + w["w_e"] + w["w_c"] + w["w_vf"]
    return float(total), np.array([rp, rv, re, rc, rvf])


def world_rfc_implicit_v1_mul(cur, expert, ind, action, ws=None,
                              b_diffw=1.0, vf_dim=6, dt=1 / 30):
    """Multiplicative variant (:56-103): product of ALL exp terms — the
    residual-force term is unconditional here (:95-96).  Without a residual
    force (vf_dim == 0) the vf factor is exp(0) = 1, not a zeroing 0."""
    w = dict(_DEFAULTS, **(ws or {}))
    w["w_vf"] = 1.0  # force the vf term on (assignment, not a dup kwarg)
    _, rp, rv, re, rc, rvf = _terms(cur, expert, ind, action, w, b_diffw, vf_dim, dt)
    if vf_dim <= 0:
        rvf = 1.0
    total = rp * rv * re * rc * rvf
    return float(total), np.array([rp, rv, re, rc, rvf])


UHC_REWARD_FUNCS = {
    "world_rfc_implicit": world_rfc_implicit_reward,
    "world_rfc_implicit_v1_mul": world_rfc_implicit_v1_mul,
}
