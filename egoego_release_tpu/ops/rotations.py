"""Batched rotation algebra in pure JAX.

Replaces the reference's pytorch3d.transforms usage (e.g.
egoego/model/transformer_cond_diffusion_model.py:18) and its vendored numpy
quaternion utilities (egoego/lafan1/utils.py:54-108).  All functions are
shape-polymorphic over leading batch dims, fully vectorized (no python loops
over batch/time), and safe under jit/vmap/grad.

Conventions (same as the reference):
  * quaternions are (w, x, y, z), unit-norm unless noted
  * rotation matrices act on column vectors: v' = R @ v
  * 6d rotation representation = first two ROWS of the rotation matrix
    (Zhou et al.; pytorch3d's matrix_to_rotation_6d convention)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


# ---------------------------------------------------------------------------
# quaternion algebra
# ---------------------------------------------------------------------------

def quat_normalize(q: Array, eps: float = 1e-12) -> Array:
    """Normalize quaternions along the last axis."""
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(norm, eps)


def quat_conjugate(q: Array) -> Array:
    """(w, x, y, z) -> (w, -x, -y, -z)."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_invert(q: Array) -> Array:
    """Inverse of a *unit* quaternion == conjugate (pytorch3d.quaternion_invert)."""
    return quat_conjugate(q)


def quat_multiply(a: Array, b: Array) -> Array:
    """Hamilton product a*b, (..., 4) x (..., 4) -> (..., 4)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_apply(q: Array, v: Array) -> Array:
    """Rotate vectors v (..., 3) by unit quaternions q (..., 4).

    Uses the cross-product form (no matrix materialization):
      v' = v + 2 w (u x v) + 2 u x (u x v),  u = q.xyz
    """
    u = q[..., 1:]
    w = q[..., :1]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_between(x: Array, y: Array) -> Array:
    """Unnormalized quaternion rotating vector x to vector y.

    Same formula as the reference's lafan1 quat_between
    (egoego/lafan1/utils.py:92-108); callers normalize.
    """
    w = jnp.sqrt(
        jnp.sum(x * x, axis=-1) * jnp.sum(y * y, axis=-1)
    ) + jnp.sum(x * y, axis=-1)
    return jnp.concatenate([w[..., None], jnp.cross(x, y)], axis=-1)


def standardize_quat(q: Array) -> Array:
    """Flip sign so w >= 0 (pytorch3d.standardize_quaternion)."""
    return jnp.where(q[..., :1] < 0, -q, q)


# ---------------------------------------------------------------------------
# conversions
# ---------------------------------------------------------------------------

def quat_to_matrix_np(q):
    """Numpy twin of quat_to_matrix for host-side data loaders.

    Per-item dataset code must not touch JAX: through the TPU tunnel every
    dispatch is a full round trip (~0.1-1 s), so a jnp call inside
    __getitem__ dominates training step time (see CLAUDE.md).
    """
    import numpy as np

    q = np.asarray(q, np.float32)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two_s = 2.0 / np.sum(q * q, axis=-1)
    m = np.stack(
        [
            1 - two_s * (y * y + z * z),
            two_s * (x * y - z * w),
            two_s * (x * z + y * w),
            two_s * (x * y + z * w),
            1 - two_s * (x * x + z * z),
            two_s * (y * z - x * w),
            two_s * (x * z - y * w),
            two_s * (y * z + x * w),
            1 - two_s * (x * x + y * y),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def quat_to_matrix(q: Array) -> Array:
    """Unit quaternion (..., 4) -> rotation matrix (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two_s = 2.0 / jnp.sum(q * q, axis=-1)
    m = jnp.stack(
        [
            1 - two_s * (y * y + z * z),
            two_s * (x * y - z * w),
            two_s * (x * z + y * w),
            two_s * (x * y + z * w),
            1 - two_s * (x * x + z * z),
            two_s * (y * z - x * w),
            two_s * (x * z - y * w),
            two_s * (y * z + x * w),
            1 - two_s * (x * x + y * y),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def _sqrt_positive_part(x: Array) -> Array:
    return jnp.sqrt(jnp.maximum(x, 0.0))


def matrix_to_quat_np(m):
    """Numpy twin of matrix_to_quat (same branchless Shepperd's method and
    pivot/sign conventions) for host-side data loaders — per-item JAX calls
    cost a tunnel round trip each (see quat_to_matrix_np)."""
    import numpy as np

    m = np.asarray(m, np.float32)
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    sqrtp = lambda x: np.sqrt(np.maximum(x, 0.0))
    q_abs = np.stack(
        [
            sqrtp(1.0 + m00 + m11 + m22),
            sqrtp(1.0 + m00 - m11 - m22),
            sqrtp(1.0 - m00 + m11 - m22),
            sqrtp(1.0 - m00 - m11 + m22),
        ],
        axis=-1,
    )
    quat_by_w = np.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    quat_by_x = np.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1)
    quat_by_y = np.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1)
    quat_by_z = np.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1)
    quat_candidates = np.stack([quat_by_w, quat_by_x, quat_by_y, quat_by_z], axis=-2)
    quat_candidates = quat_candidates / (2.0 * np.maximum(q_abs, 0.1))[..., None]

    best = np.argmax(q_abs, axis=-1)
    out = np.take_along_axis(
        quat_candidates, best[..., None, None].astype(np.int64), axis=-2
    )[..., 0, :]
    return out / np.maximum(
        np.linalg.norm(out, axis=-1, keepdims=True), 1e-12
    )


def matrix_to_quat(m: Array) -> Array:
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4), (w, x, y, z).

    Branchless Shepperd's method: compute all four candidate quaternions and
    select the one whose pivot diagonal term is largest (numerically the most
    stable), matching pytorch3d.matrix_to_quaternion behavior.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    q_abs = jnp.stack(
        [
            _sqrt_positive_part(1.0 + m00 + m11 + m22),
            _sqrt_positive_part(1.0 + m00 - m11 - m22),
            _sqrt_positive_part(1.0 - m00 + m11 - m22),
            _sqrt_positive_part(1.0 - m00 - m11 + m22),
        ],
        axis=-1,
    )

    # Four candidate quaternions, one per pivot.
    quat_by_w = jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    quat_by_x = jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1)
    quat_by_y = jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1)
    quat_by_z = jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1)
    quat_candidates = jnp.stack([quat_by_w, quat_by_x, quat_by_y, quat_by_z], axis=-2)

    denom = 2.0 * jnp.maximum(q_abs, 0.1)  # same floor as pytorch3d
    quat_candidates = quat_candidates / denom[..., None]

    best = jnp.argmax(q_abs, axis=-1)
    out = jnp.take_along_axis(
        quat_candidates, best[..., None, None].astype(jnp.int32), axis=-2
    )[..., 0, :]
    return quat_normalize(out)


def axis_angle_to_quat(aa: Array, eps: float = 1e-6) -> Array:
    """Axis-angle (..., 3) -> unit quaternion (..., 4).

    Uses a Taylor expansion of sin(a/2)/a near zero for stability under grad
    (same approach as pytorch3d.axis_angle_to_quaternion).
    """
    angle_sq = jnp.sum(aa * aa, axis=-1, keepdims=True)
    angle = jnp.sqrt(jnp.maximum(angle_sq, 1e-30))
    half = 0.5 * angle
    small = angle < eps
    # sin(a/2)/a ~ 1/2 - a^2/48
    sin_half_over_angle = jnp.where(
        small, 0.5 - angle_sq / 48.0, jnp.sin(half) / jnp.where(small, 1.0, angle)
    )
    return jnp.concatenate([jnp.cos(half), aa * sin_half_over_angle], axis=-1)


def quat_to_axis_angle(q: Array, eps: float = 1e-6) -> Array:
    """Unit quaternion (..., 4) -> axis-angle (..., 3)."""
    norm_xyz = jnp.linalg.norm(q[..., 1:], axis=-1, keepdims=True)
    half_angle = jnp.arctan2(norm_xyz, q[..., :1])
    angle = 2.0 * half_angle
    small = jnp.abs(angle) < eps
    # a / sin(a/2) ~ 2 + a^2/12
    sin_half = jnp.where(small, 1.0, jnp.sin(half_angle))
    scale = jnp.where(small, 2.0 + angle * angle / 12.0, angle / sin_half)
    return q[..., 1:] * scale


def axis_angle_to_matrix(aa: Array) -> Array:
    return quat_to_matrix(axis_angle_to_quat(aa))


def matrix_to_axis_angle(m: Array) -> Array:
    return quat_to_axis_angle(matrix_to_quat(m))


def matrix_to_rot6d(m: Array) -> Array:
    """(..., 3, 3) -> (..., 6): first two rows, flattened."""
    return m[..., :2, :].reshape(m.shape[:-2] + (6,))


def rot6d_to_matrix(d6: Array) -> Array:
    """(..., 6) -> (..., 3, 3) via Gram-Schmidt (Zhou et al.), rows stacked."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-12)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / jnp.maximum(jnp.linalg.norm(a2p, axis=-1, keepdims=True), 1e-12)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def quat_to_rot6d(q: Array) -> Array:
    return matrix_to_rot6d(quat_to_matrix(q))


def rot6d_to_quat(d6: Array) -> Array:
    return matrix_to_quat(rot6d_to_matrix(d6))
