"""Rotation algebra vs. scipy.spatial.transform.Rotation oracles."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as sR

from egoego_release_tpu.ops import rotations as rot


def rand_quats(n, seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(n, 4)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return q.astype(np.float32)


def to_scipy(q_wxyz):
    # scipy uses xyzw
    return sR.from_quat(np.concatenate([q_wxyz[:, 1:], q_wxyz[:, :1]], axis=-1))


def test_quat_to_matrix_matches_scipy():
    q = rand_quats(64)
    ours = np.asarray(rot.quat_to_matrix(jnp.asarray(q)))
    theirs = to_scipy(q).as_matrix()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_matrix_to_quat_roundtrip():
    q = rand_quats(128, seed=1)
    m = to_scipy(q).as_matrix().astype(np.float32)
    q2 = np.asarray(rot.matrix_to_quat(jnp.asarray(m)))
    # sign-invariant comparison
    dot = np.abs(np.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_quat_multiply_matches_scipy():
    a, b = rand_quats(32, 2), rand_quats(32, 3)
    ours = np.asarray(rot.quat_multiply(jnp.asarray(a), jnp.asarray(b)))
    theirs = (to_scipy(a) * to_scipy(b)).as_quat()
    theirs = np.concatenate([theirs[:, 3:], theirs[:, :3]], axis=-1)
    dot = np.abs(np.sum(ours * theirs, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_quat_apply_matches_matrix():
    q = rand_quats(32, 4)
    v = np.random.RandomState(5).randn(32, 3).astype(np.float32)
    ours = np.asarray(rot.quat_apply(jnp.asarray(q), jnp.asarray(v)))
    theirs = np.einsum("nij,nj->ni", to_scipy(q).as_matrix(), v)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_axis_angle_roundtrip():
    rng = np.random.RandomState(6)
    aa = rng.randn(64, 3).astype(np.float32)
    aa[0] = 0.0  # degenerate case
    aa[1] = 1e-8
    m_ours = np.asarray(rot.axis_angle_to_matrix(jnp.asarray(aa)))
    m_scipy = sR.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(m_ours, m_scipy, atol=1e-5)
    aa2 = np.asarray(rot.matrix_to_axis_angle(jnp.asarray(m_scipy.astype(np.float32))))
    # axis-angle is unique up to 2pi wraps; these are all within (-pi, pi)
    r_back = sR.from_rotvec(aa2)
    err = (r_back.inv() * sR.from_rotvec(aa)).magnitude()
    assert np.max(err) < 1e-4


def test_rot6d_roundtrip():
    q = rand_quats(64, 7)
    m = np.asarray(rot.quat_to_matrix(jnp.asarray(q)))
    d6 = np.asarray(rot.matrix_to_rot6d(jnp.asarray(m)))
    # first two rows flattened
    np.testing.assert_allclose(d6, m[:, :2, :].reshape(64, 6), atol=1e-6)
    m2 = np.asarray(rot.rot6d_to_matrix(jnp.asarray(d6)))
    np.testing.assert_allclose(m2, m, atol=1e-5)


def test_rot6d_gram_schmidt_on_noisy_input():
    rng = np.random.RandomState(8)
    d6 = rng.randn(32, 6).astype(np.float32)
    m = np.asarray(rot.rot6d_to_matrix(jnp.asarray(d6)))
    # result must be a valid rotation
    eye = np.einsum("nij,nkj->nik", m, m)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    det = np.linalg.det(m)
    np.testing.assert_allclose(det, 1.0, atol=1e-5)


def test_quat_between():
    rng = np.random.RandomState(9)
    x = rng.randn(32, 3).astype(np.float32)
    y = rng.randn(32, 3).astype(np.float32)
    q = np.array(rot.quat_between(jnp.asarray(x), jnp.asarray(y)))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    x_rot = np.asarray(rot.quat_apply(jnp.asarray(q), jnp.asarray(x)))
    # rotated x should be parallel to y
    cos = np.sum(x_rot * y, axis=-1) / (
        np.linalg.norm(x_rot, axis=-1) * np.linalg.norm(y, axis=-1)
    )
    np.testing.assert_allclose(cos, 1.0, atol=1e-5)
