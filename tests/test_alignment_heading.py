"""Umeyama / heading canonicalization property tests."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as sR

from egoego_release_tpu.ops import alignment, heading, rotations as rot


def test_umeyama_recovers_known_transform():
    rng = np.random.RandomState(0)
    src = rng.randn(100, 3).astype(np.float32)
    r_true = sR.random(random_state=1).as_matrix().astype(np.float32)
    s_true, t_true = 2.3, np.asarray([0.5, -1.0, 3.0], dtype=np.float32)
    dst = s_true * src @ r_true.T + t_true

    r, t, s = alignment.umeyama(jnp.asarray(src), jnp.asarray(dst), with_scale=True)
    np.testing.assert_allclose(np.asarray(r), r_true, atol=1e-4)
    np.testing.assert_allclose(float(s), s_true, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-3)


def test_umeyama_no_scale():
    rng = np.random.RandomState(2)
    src = rng.randn(50, 3).astype(np.float32)
    r_true = sR.random(random_state=3).as_matrix().astype(np.float32)
    dst = src @ r_true.T + 1.5
    r, t, s = alignment.umeyama(jnp.asarray(src), jnp.asarray(dst), with_scale=False)
    assert float(s) == 1.0
    np.testing.assert_allclose(np.asarray(r), r_true, atol=1e-4)


def test_align_slam_first_frame():
    rng = np.random.RandomState(4)
    t_len = 30
    q = rng.randn(t_len, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    trans = rng.randn(t_len, 3).astype(np.float32)
    gt0 = rng.randn(7).astype(np.float32)
    gt0[3:] /= np.linalg.norm(gt0[3:])

    a_trans, a_mat, a_quat = alignment.align_slam_to_first_frame(
        jnp.asarray(trans), jnp.asarray(q), jnp.asarray(gt0)
    )
    # first frame must match GT pose exactly
    np.testing.assert_allclose(np.asarray(a_trans[0]), gt0[:3], atol=1e-5)
    gt_mat0 = np.asarray(rot.quat_to_matrix(jnp.asarray(gt0[3:])))
    np.testing.assert_allclose(np.asarray(a_mat[0]), gt_mat0, atol=1e-5)
    # body-frame relative transforms preserved: R_0^T R_t unchanged
    m = np.asarray(rot.quat_to_matrix(jnp.asarray(q)))
    rel_ori = m[0].T @ m[5]
    rel_new = np.asarray(a_mat[0]).T @ np.asarray(a_mat[5])
    np.testing.assert_allclose(rel_new, rel_ori, atol=1e-4)


def test_rotation_from_floor_normal():
    n = np.asarray([0.3, -0.2, 0.9], dtype=np.float32)
    r = np.asarray(alignment.rotation_from_floor_normal(jnp.asarray(n)))
    out = r @ (n / np.linalg.norm(n))
    np.testing.assert_allclose(out, [0, 0, 1], atol=1e-5)


def test_heading_quat():
    rng = np.random.RandomState(5)
    q = rng.randn(16, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    h = np.asarray(heading.get_heading_quat(jnp.asarray(q)))
    # heading is a pure z rotation
    assert np.allclose(h[:, 1:3], 0)
    np.testing.assert_allclose(np.linalg.norm(h, axis=-1), 1.0, atol=1e-5)
    # de-headed quaternion has no heading left
    dh = np.asarray(heading.de_heading(jnp.asarray(q)))
    h2 = np.asarray(heading.get_heading_quat(jnp.asarray(dh)))
    # the de-headed quat's heading is identity (up to sign)
    np.testing.assert_allclose(np.abs(h2[:, 0]), 1.0, atol=1e-4)


def test_rotate_at_frame_properties():
    rng = np.random.RandomState(6)
    b, t = 3, 25
    q = rng.randn(b, t, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    trans = rng.randn(b, t, 3).astype(np.float32)

    new_trans, new_quat, yrot = heading.rotate_at_frame(
        jnp.asarray(trans), jnp.asarray(q), cano_t_idx=0
    )
    # after canonicalization, frame-0 body-x projected to xy is +x
    fwd = np.asarray(
        rot.quat_apply(new_quat[:, 0], jnp.asarray([1.0, 0.0, 0.0]))
    )
    fwd_xy = fwd[:, :2] / np.linalg.norm(fwd[:, :2], axis=-1, keepdims=True)
    np.testing.assert_allclose(fwd_xy, np.tile([[1.0, 0.0]], (b, 1)), atol=1e-4)

    # applying yrot recovers the original trajectory
    yq = np.asarray(yrot)[:, 0, 0]  # (B, 4)
    rec_trans = np.asarray(
        rot.quat_apply(jnp.asarray(yq[:, None]), new_trans)
    )
    np.testing.assert_allclose(rec_trans, trans, atol=1e-4)
    rec_quat = np.asarray(
        rot.quat_multiply(jnp.asarray(yq[:, None]), new_quat)
    )
    dot = np.abs(np.sum(rec_quat * q, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-4)


def test_numpy_twins_match_jax_and_scipy():
    """quat_to_matrix_np / matrix_to_quat_np / align_slam_to_first_frame_np
    (the host-side data-loader twins) must match both scipy (independent
    oracle) and the JAX originals bit-for-sign (loaders' outputs feed golden
    tests that assume the JAX conventions)."""
    rng = np.random.RandomState(11)
    q = rng.randn(40, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)

    m_np = rot.quat_to_matrix_np(q)
    m_scipy = sR.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()  # scipy is xyzw
    np.testing.assert_allclose(m_np, m_scipy, atol=1e-5)
    np.testing.assert_allclose(m_np, np.asarray(rot.quat_to_matrix(jnp.asarray(q))),
                               atol=1e-6)

    q_back = rot.matrix_to_quat_np(m_np)
    # same rotation as scipy (up to global sign)...
    q_scipy = sR.from_matrix(m_np).as_quat()[:, [3, 0, 1, 2]]
    sign = np.sign(np.sum(q_back * q_scipy, axis=-1, keepdims=True))
    np.testing.assert_allclose(q_back, sign * q_scipy, atol=1e-5)
    # ...and the EXACT same sign convention as the JAX Shepperd implementation
    np.testing.assert_allclose(
        q_back, np.asarray(rot.matrix_to_quat(jnp.asarray(m_np))), atol=1e-5
    )

    trans = rng.randn(40, 3).astype(np.float32)
    gt0 = rng.randn(7).astype(np.float32)
    gt0[3:] /= np.linalg.norm(gt0[3:])
    a_np = alignment.align_slam_to_first_frame_np(trans, q, gt0)
    a_jax = alignment.align_slam_to_first_frame(
        jnp.asarray(trans), jnp.asarray(q), jnp.asarray(gt0)
    )
    for got, want in zip(a_np, a_jax):
        np.testing.assert_allclose(got, np.asarray(want), atol=1e-5)
