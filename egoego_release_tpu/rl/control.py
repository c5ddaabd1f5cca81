"""The UHC/kinpoly PD + residual-force CONTROL LAWS as pure JAX functions.

Port of the math in `HumanoidAREnv.compute_desired_accel / compute_torque /
rfc_implicit` (kinpoly/relive/envs/humanoid_ar_v1.py:409-495; identical in
copycat/envs/humanoid_im.py).  The reference evaluates these inside a MuJoCo
step; the control laws themselves are simulator-independent once the joint-
space mass matrix M and bias force C are supplied, so they are ported (and
oracle-tested against a scipy transcription of the reference math) with
(M, C) as explicit inputs.  What remains simulator-bound — computing M/C
from the articulated body, contact resolution, and the forward integration
`sim.step()` — is the documented out-of-scope physics backend
(REFERENCE_PARITY.md); an MJX backend would provide `mjx.full_m` /
`qfrc_bias` and plug straight into these functions.

All functions are batched over a leading dim and jit/vmap-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from egoego_release_tpu.ops import heading as heading_mod
from egoego_release_tpu.ops import rotations as rot

Array = jax.Array

# cc_cfg.data_specs base_rot default (humanoid_ar_v1.py:34): the humanoid
# model's root is rotated 90 deg about +x relative to SMPL.
BASE_ROT = (0.7071, 0.7071, 0.0, 0.0)


def remove_base_rot(quat: Array, base_rot=BASE_ROT) -> Array:
    """quat * base_rot^-1 (humanoid_ar_v1.py:162-163)."""
    base = jnp.asarray(base_rot, quat.dtype)
    return rot.quat_multiply(quat, rot.quat_invert(jnp.broadcast_to(base, quat.shape)))


def wrap_to_pi(x: Array) -> Array:
    """Wrap angles to [-pi, pi) — the closed form of the reference's
    while-loop +-2pi adjustment (humanoid_ar_v1.py:447-451)."""
    return (x + jnp.pi) % (2.0 * jnp.pi) - jnp.pi


def stable_pd_accel(
    M: Array,          # (..., nv, nv) joint-space mass matrix
    C: Array,          # (..., nv) bias forces (Coriolis + gravity)
    qpos_err: Array,   # (..., nv)
    qvel_err: Array,   # (..., nv)
    k_p: Array,        # (nv,) proportional gains
    k_d: Array,        # (nv,) derivative gains
    dt: float,
) -> Array:
    """Stable-PD desired acceleration (compute_desired_accel,
    humanoid_ar_v1.py:409-437):  solve (M + Kd*dt) a = -C - Kp e - Kd de."""
    lhs = M + jnp.diag(k_d) * dt
    rhs = -(C + k_p * qpos_err + k_d * qvel_err)
    # M + Kd*dt is SPD -> Cholesky, like the reference's cho_solve
    return jax.scipy.linalg.cho_solve(
        (jnp.linalg.cholesky(lhs), True), rhs[..., None]
    )[..., 0]


def compute_torque(
    ctrl: Array,            # (..., ndof) policy action (joint part)
    qpos: Array,            # (..., 7 + ndof) free-joint root + joint angles
    qvel: Array,            # (..., 6 + ndof)
    base_pos: Array,        # (..., ndof) target kinematic pose (action_v 1-3)
    M: Array,               # (..., nv, nv), nv = 6 + ndof
    C: Array,               # (..., nv)
    jkp: Array,             # (ndof,) joint P gains (cc_cfg.jkp)
    jkd: Array,             # (ndof,) joint D gains (cc_cfg.jkd)
    dt: float,
    a_scale: float = 1.0,   # cc_cfg.a_scale
) -> Array:
    """PD torque from a position-mode action (compute_torque,
    humanoid_ar_v1.py:439-469).  Returns (..., ndof) torques (unclipped; the
    caller applies cfg.torque_lim like do_simulation :505)."""
    ndof = ctrl.shape[-1]
    joints = qpos[..., 7:]
    # wrap the kinematic target into the +-pi neighborhood of the current pose
    base_pos = joints + wrap_to_pi(base_pos - joints)
    target_pos = base_pos + ctrl * a_scale

    k_p = jnp.concatenate([jnp.zeros(6, jkp.dtype), jkp])
    k_d = jnp.concatenate([jnp.zeros(6, jkd.dtype), jkd])
    qpos_err = jnp.concatenate(
        [jnp.zeros_like(qvel[..., :6]), joints + qvel[..., 6:] * dt - target_pos],
        axis=-1,
    )
    qvel_err = qvel
    q_accel = stable_pd_accel(M, C, qpos_err, qvel_err, k_p, k_d, dt)
    qvel_err = qvel_err + q_accel * dt
    return -jkp * qpos_err[..., 6:] - jkd * qvel_err[..., 6:]


def rfc_implicit_force(
    vf: Array,              # (..., vf_dim) residual-force action
    root_quat: Array,       # (..., 4) humanoid root quaternion (wxyz)
    residual_force_scale: float,
    residual_force_lim: float,
    base_rot=BASE_ROT,
) -> Array:
    """Implicit residual-force vector applied at the root (rfc_implicit,
    humanoid_ar_v1.py:485-493): scale, rotate the linear part into the
    heading frame, clip.  Returns the generalized force to add at the root
    dofs (the reference writes it into data.qfrc_applied)."""
    vf = vf * residual_force_scale
    hq = heading_mod.get_heading_quat(remove_base_rot(root_quat, base_rot))
    lin = rot.quat_apply(hq, vf[..., :3])
    vf = jnp.concatenate([lin, vf[..., 3:]], axis=-1)
    return jnp.clip(vf, -residual_force_lim, residual_force_lim)
