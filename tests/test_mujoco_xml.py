"""MuJoCo XML skeleton parsing + FK against the reference's bundled humanoid."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from egoego_release_tpu.ops.mujoco_xml import fk_generic, load_mujoco_skeleton, qpos_fk

XML = "/root/reference/kinpoly/assets/mujoco_models/humanoid_smpl_neutral_mesh.xml"

needs_xml = pytest.mark.skipif(not os.path.exists(XML), reason="reference XML unavailable")


@needs_xml
def test_parse_reference_humanoid():
    sk = load_mujoco_skeleton(XML)
    assert len(sk.body_names) == 24
    assert sk.body_names[0] == "Pelvis"
    assert "Head" in sk.body_names
    assert sk.parents[0] == -1
    # qpos layout consistency: 3 + 4 + 23*3 = 76
    assert 7 + (len(sk.body_names) - 1) * 3 == 76
    # offsets reconstruct rest positions
    rp = np.asarray(sk.rest_pos)
    off = np.asarray(sk.offsets)
    rec = np.zeros_like(rp)
    rec[0] = rp[0]
    for j in range(1, 24):
        rec[j] = rec[sk.parents[j]] + off[j]
    np.testing.assert_allclose(rec, rp, atol=1e-6)


@needs_xml
def test_qpos_fk_identity_pose():
    sk = load_mujoco_skeleton(XML)
    qpos = np.zeros((2, 76), np.float32)
    qpos[:, 3] = 1.0  # identity root quat, zero trans
    gq, gp = qpos_fk(sk, jnp.asarray(qpos))
    # identity pose reproduces rest positions relative to the root
    expect = np.asarray(sk.rest_pos) - np.asarray(sk.rest_pos)[0]
    np.testing.assert_allclose(np.asarray(gp[0]) - np.asarray(gp[0])[0], expect, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gq[0, :, 0]), 1.0, atol=1e-6)


@needs_xml
def test_qpos_fk_matches_codec_head_motion():
    """Rotating the root yaw by 90deg swings every body position accordingly."""
    sk = load_mujoco_skeleton(XML)
    qpos = np.zeros((1, 76), np.float32)
    qpos[:, 3] = 1.0
    _, gp0 = qpos_fk(sk, jnp.asarray(qpos))
    qpos_rot = qpos.copy()
    qpos_rot[:, 3:7] = [np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)]  # yaw 90
    _, gp1 = qpos_fk(sk, jnp.asarray(qpos_rot))
    p0 = np.asarray(gp0[0]) - np.asarray(gp0[0])[0]
    p1 = np.asarray(gp1[0]) - np.asarray(gp1[0])[0]
    rot90 = np.asarray([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    np.testing.assert_allclose(p1, p0 @ rot90.T, atol=1e-5)
