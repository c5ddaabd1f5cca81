"""Metric suite vs. per-frame numpy oracles (explicit loops + np.linalg.inv,
the way the reference computes them)."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as sR

from egoego_release_tpu.eval import metrics as M


def rand_seq(t=25, j=22, seed=0):
    rng = np.random.RandomState(seed)
    quat = rng.randn(t, j, 4).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    jpos = rng.randn(t, j, 3).astype(np.float32)
    return quat, jpos


def np_mat4(trans, quat):
    t = trans.shape[0]
    out = np.zeros((t, 4, 4))
    for i in range(t):
        r = sR.from_quat(np.roll(quat[i], -1)).as_matrix()
        out[i, :3, :3] = r
        out[i, :3, 3] = trans[i]
        out[i, 3, 3] = 1
    return out


def np_frob4(x, y):
    err = 0.0
    for i in range(len(x)):
        err += np.linalg.norm(np.eye(4) - x[i] @ np.linalg.inv(y[i]), "fro")
    return err / len(x)


def np_frob3(x, y):
    err = 0.0
    for i in range(len(x)):
        err += np.linalg.norm(np.eye(3) - x[i] @ np.linalg.inv(y[i]), "fro")
    return err / len(x)


def np_foot_sliding(jpos, floor_h):
    jpos = jpos.copy()
    seq_len = jpos.shape[0]
    jpos[:, :, 2] -= floor_h
    total = 0.0
    for joint, H in [(7, 0.08), (8, 0.08), (10, 0.04), (11, 0.04)]:
        pos = jpos[:, joint]
        disp = np.linalg.norm(pos[1:, :2] - pos[:-1, :2], axis=1)
        sub = pos[:-1, 2] < H
        stats = np.abs(disp * (2 - 2 ** (pos[:-1, 2] / H)))[sub]
        total += np.sum(stats) / seq_len * 1000
    return total / 4


def test_metrics_match_numpy_oracle():
    gt_q, gt_p = rand_seq(seed=1)
    pr_q, pr_p = rand_seq(seed=2)
    res = M.compute_metrics_for_smpl(
        jnp.asarray(gt_q), jnp.asarray(gt_p), jnp.float32(0.1),
        jnp.asarray(pr_q), jnp.asarray(pr_p), jnp.float32(0.2),
    )

    # oracle
    root_pred = np_mat4(pr_p[:, 0], pr_q[:, 0])
    root_gt = np_mat4(gt_p[:, 0], gt_q[:, 0])
    np.testing.assert_allclose(float(res["root_dist"]), np_frob4(root_pred, root_gt), rtol=1e-4)
    np.testing.assert_allclose(
        float(res["root_rot_dist"]),
        np_frob3(root_pred[:, :3, :3], root_gt[:, :3, :3]),
        rtol=1e-4,
    )
    jc_p = pr_p - pr_p[:, 0:1]
    jc_g = gt_p - gt_p[:, 0:1]
    mpjpe = np.linalg.norm(jc_p - jc_g, axis=2).mean() * 1000
    np.testing.assert_allclose(float(res["mpjpe"]), mpjpe, rtol=1e-4)
    sj = np.linalg.norm(jc_p - jc_g, axis=2).mean(axis=0) * 1000
    np.testing.assert_allclose(np.asarray(res["single_jpe"]), sj, rtol=1e-4)
    np.testing.assert_allclose(float(res["mpjpe_wo_hand"]), sj[:18].mean(), rtol=1e-4)

    accels = pr_p[:-2] - 2 * pr_p[1:-1] + pr_p[2:]
    np.testing.assert_allclose(
        float(res["accel_pred"]),
        np.linalg.norm(accels, axis=2).mean() * 1000,
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        float(res["pred_fs"]), np_foot_sliding(pr_p, 0.2), rtol=1e-3
    )
    np.testing.assert_allclose(
        float(res["head_trans_dist"]),
        np.linalg.norm(pr_p[:, 15] - gt_p[:, 15], axis=1).mean() * 1000,
        rtol=1e-4,
    )


def test_head_pose_metrics_match_oracle():
    rng = np.random.RandomState(3)
    t = 20
    pr_t = rng.randn(t, 3).astype(np.float32)
    gt_t = rng.randn(t, 3).astype(np.float32)
    pr_r = sR.random(t, random_state=4).as_matrix().astype(np.float32)
    gt_r = sR.random(t, random_state=5).as_matrix().astype(np.float32)

    hd, hrd, hte = M.compute_head_pose_metrics(
        jnp.asarray(pr_t), jnp.asarray(pr_r), jnp.asarray(gt_t), jnp.asarray(gt_r)
    )
    pm = np.zeros((t, 4, 4)); gm = np.zeros((t, 4, 4))
    pm[:, :3, :3] = pr_r; pm[:, :3, 3] = pr_t; pm[:, 3, 3] = 1
    gm[:, :3, :3] = gt_r; gm[:, :3, 3] = gt_t; gm[:, 3, 3] = 1
    np.testing.assert_allclose(float(hd), np_frob4(pm, gm), rtol=1e-4)
    np.testing.assert_allclose(float(hrd), np_frob3(pr_r, gt_r), rtol=1e-4)
    np.testing.assert_allclose(
        float(hte), np.linalg.norm(pr_t - gt_t, axis=1).mean() * 1000, rtol=1e-4
    )


def test_batched_metrics_vmap():
    gt_q, gt_p = rand_seq(seed=6)
    pr_q, pr_p = rand_seq(seed=7)
    b = 3
    res = M.batched_metrics_for_smpl(
        jnp.tile(gt_q[None], (b, 1, 1, 1)), jnp.tile(gt_p[None], (b, 1, 1, 1)),
        jnp.zeros(b), jnp.tile(pr_q[None], (b, 1, 1, 1)),
        jnp.tile(pr_p[None], (b, 1, 1, 1)), jnp.zeros(b),
    )
    assert res["mpjpe"].shape == (b,)
    assert np.allclose(np.asarray(res["mpjpe"]), float(res["mpjpe"][0]))


def test_qpos_metrics_identity():
    """Identical qpos records score ~0 on pose errors (compute_metrics_for_qpos
    replaces the reference's MuJoCo-backed qpos metric path)."""
    rng = np.random.RandomState(8)
    t = 15
    qpos = np.zeros((t, 76), np.float32)
    qpos[:, :3] = np.cumsum(rng.randn(t, 3) * 0.02, 0)
    q = rng.randn(t, 4); q /= np.linalg.norm(q, axis=-1, keepdims=True)
    qpos[:, 3:7] = q
    qpos[:, 7:] = rng.randn(t, 69) * 0.3
    rest = jnp.asarray(rng.randn(22, 3).astype(np.float32) * 0.1)

    res = M.compute_metrics_for_qpos(jnp.asarray(qpos), jnp.asarray(qpos), rest)
    assert float(res["mpjpe"]) < 1e-3
    assert float(res["root_dist"]) < 1e-3
    assert float(res["accel_err"]) < 1e-3


def test_qpos_record_prep_helpers_match_reference_loops():
    """norm_qpos / trans_to_velocity / velocity_to_trans against literal
    numpy re-statements of the reference's loops (vis_mesh_gen.py:609-633)."""
    from egoego_release_tpu.eval.qpos_metrics import (
        norm_qpos, trans_to_velocity, velocity_to_trans)

    rng = np.random.RandomState(3)
    qpos = rng.randn(7, 76)
    got = norm_qpos(qpos)
    want = qpos.copy()
    want[:, 3:7] /= np.linalg.norm(want[:, 3:7], axis=1)[:, None]
    np.testing.assert_allclose(got, want, rtol=1e-12)
    np.testing.assert_array_equal(got[:, 7:], qpos[:, 7:])  # only quat touched

    trans = np.cumsum(rng.randn(9, 3), axis=0)
    vel = trans_to_velocity(trans)
    np.testing.assert_allclose(vel, trans[1:] - trans[:-1], rtol=1e-12)

    # reference integration loop, verbatim semantics
    init = trans[0]
    absolute = np.zeros((9, 3))
    absolute[0] = init
    cur = init[np.newaxis].copy()
    for t in range(1, 9):
        cur = cur + vel[t - 1:t]
        absolute[t] = cur
    np.testing.assert_allclose(velocity_to_trans(init, vel), absolute, atol=1e-12)
    np.testing.assert_allclose(velocity_to_trans(init, vel), trans, atol=1e-9)
