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


def test_qpos_fk_matches_reference_torch_humanoid():
    """Our MuJoCo-XML FK (+ the AR session's body_com) vs the reference's
    OWN torch_smpl_humanoid.Humanoid.qpos_fk (runs via the mujoco_py shim
    backed by real mujoco 3), including the bquat local-quat layout."""
    import sys

    import numpy as np
    import pytest

    sys.path.insert(0, "/root/repo/tests")
    import reforacle

    reforacle.add_reference_paths()
    if "/root/reference/kinpoly" not in sys.path:
        sys.path.insert(0, "/root/reference/kinpoly")
    torch = pytest.importorskip("torch")
    mujoco = pytest.importorskip("mujoco")  # noqa: F841
    from relive.utils.torch_smpl_humanoid import Humanoid

    xml = ("/root/reference/kinpoly/assets/mujoco_models/"
           "humanoid_smpl_neutral_mesh.xml")
    href = Humanoid(model_file=xml)

    rng = np.random.RandomState(11)
    b = 3
    q = np.zeros((b, 76), np.float64)
    q[:, :3] = rng.randn(b, 3) * 0.3
    quat = rng.randn(b, 4)
    q[:, 3:7] = quat / np.linalg.norm(quat, axis=1, keepdims=True)
    q[:, 7:] = 0.3 * rng.randn(b, 69)

    with torch.no_grad():
        ref = href.qpos_fk(torch.from_numpy(q))

    from egoego_release_tpu.rl.ar_session import ARPhysicsSession
    from egoego_release_tpu.rl.uhc_rewards import body_qposaddr, body_quat_local

    sess = ARPhysicsSession(xml, lambda o: np.zeros(75),
                            residual_force=False)
    for i in range(b):
        tgt = sess._target_dict(q[i])
        np.testing.assert_allclose(
            tgt["wbpos"].reshape(-1, 3), ref["wbpos"][i].numpy(), atol=2e-5)
        np.testing.assert_allclose(
            tgt["body_com"].reshape(-1, 3), ref["body_com"][i].numpy(),
            atol=2e-5)
        dots = np.abs((tgt["wbquat"].reshape(-1, 4)
                       * ref["wbquat"][i].numpy()).sum(1))
        np.testing.assert_allclose(dots, 1.0, atol=2e-5)

    # bquat (root + per-joint sxyz quats) == uhc body_quat_local
    qaddr = body_qposaddr(sess.env.model)
    for i in range(b):
        ours = body_quat_local(q[i], qaddr, sess.env.body_names).reshape(-1, 4)
        np.testing.assert_allclose(ours, ref["bquat"][i].numpy(), atol=1e-10)
