"""Stage-1 HeadNet / GravityNet tests."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as sR

from egoego_release_tpu.models.headnet import (
    HeadFormer,
    headformer_forward_for_eval,
    headformer_loss,
    padding_mask_from_len,
    rescale_slam_trans,
    va2rot,
)
from egoego_release_tpu.models.gravitynet import (
    HeadNormalFormer,
    gravitynet_eval_transform,
    prep_gravitynet_input,
    slam_traj_features,
)
from egoego_release_tpu.ops import rotations as rot


def test_va2rot_matches_sequential_oracle():
    rng = np.random.RandomState(0)
    b, t = 2, 15
    init = rng.randn(b, 4).astype(np.float32)
    init /= np.linalg.norm(init, axis=-1, keepdims=True)
    vels = (rng.randn(b, t, 3) * 0.5).astype(np.float32)

    out = np.asarray(va2rot(jnp.asarray(init), jnp.asarray(vels)))

    # oracle: sequential integration with scipy
    dt = 1.0 / 30.0
    seq = [init.copy()]
    curr = init.copy()
    for i in range(t):
        for bi in range(b):
            r = sR.from_quat(np.roll(curr[bi], -1))
            angv = r.apply(vels[bi, i])
            dq = sR.from_rotvec(angv * dt)
            new = (dq * r).as_quat()
            new = np.roll(new, 1)
            curr[bi] = new / np.linalg.norm(new)
        seq.append(curr.copy())
    oracle = np.stack(seq, axis=1)
    dot = np.abs(np.sum(out * oracle, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-4)


def test_rescale_slam_trans_matches_loop_oracle():
    rng = np.random.RandomState(1)
    t = 20
    slam = rng.randn(t, 3).astype(np.float32)
    dist = np.abs(rng.randn(t)).astype(np.float32)

    rescaled, scale = rescale_slam_trans(jnp.asarray(slam), jnp.asarray(dist))

    # oracle: the reference's explicit loop (head_estimation_transformer.py:180-212)
    lens = [np.linalg.norm(slam[i + 1] - slam[i]) for i in range(t - 1)]
    s = dist[: t - 1].mean() / np.mean(lens)
    out = [slam[0]]
    for i in range(t - 1):
        out.append(out[-1] + s * (slam[i + 1] - slam[i]))
    oracle = np.stack(out)
    np.testing.assert_allclose(float(scale), s, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rescaled), oracle, atol=1e-4)


def test_headformer_batched_blocks_match_sequential_blocks():
    model = HeadFormer(d_model=32, n_layers=2, n_head=2, d_k=16, d_v=16, window=8,
                       cnn_fdim=24, mlp_hsize=(16,))
    t_total = 19  # 3 blocks: 8, 8, 3(padded)
    rng = np.random.RandomState(2)
    feats = rng.randn(1, t_total, 24).astype(np.float32)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 8, 24)),
        jnp.ones((1, 8)),
    )
    init_q = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
    slam = jnp.asarray(rng.randn(t_total, 3).astype(np.float32))

    res = headformer_forward_for_eval(model, params, jnp.asarray(feats), init_q, slam)
    assert res["head_pose"].shape == (1, t_total, 7)

    # oracle: run blocks one by one (the reference's loop), concatenate va/dist
    vas, dists = [], []
    for b in range(3):
        blk = feats[0, b * 8 : (b + 1) * 8]
        blen = blk.shape[0]
        blk = np.pad(blk, ((0, 8 - blen), (0, 0)))
        mask = padding_mask_from_len(jnp.asarray([blen]), 8)
        va, dist = model.apply(params, jnp.asarray(blk[None]), mask)
        vas.append(np.asarray(va[0, :blen]))
        dists.append(np.asarray(dist[0, :blen, 0]))
    va_all = np.concatenate(vas)[None]
    dist_all = np.concatenate(dists)
    head_quat = np.asarray(va2rot(init_q, jnp.asarray(va_all)))[:, :t_total]
    rescaled, scale = rescale_slam_trans(slam, jnp.asarray(dist_all) / 10.0)
    oracle_pose = np.concatenate([np.asarray(rescaled)[None], head_quat], axis=-1)
    np.testing.assert_allclose(np.asarray(res["head_pose"]), oracle_pose, atol=1e-4)
    np.testing.assert_allclose(float(res["pred_scale"]), float(scale), rtol=1e-5)


def test_headformer_loss_runs():
    rng = np.random.RandomState(3)
    b, t = 2, 10
    va = jnp.asarray(rng.randn(b, t, 3).astype(np.float32) * 0.1)
    dist = jnp.asarray(np.abs(rng.randn(b, t, 1)).astype(np.float32))
    q = rng.randn(b, t + 1, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    trans = rng.randn(b, t + 1, 3).astype(np.float32)
    loss, (ol, vl, dl) = headformer_loss(
        va, dist, jnp.asarray(q[:, 0]), va, jnp.asarray(q), jnp.asarray(trans)
    )
    assert np.isfinite(float(loss))
    assert float(vl) == 0.0  # pred va == gt va


def test_gravitynet_forward_and_features():
    rng = np.random.RandomState(4)
    b, t = 2, 30
    m = sR.random(b * (t + 1), random_state=5).as_matrix().reshape(b, t + 1, 3, 3).astype(np.float32)
    trans = rng.randn(b, t + 1, 3).astype(np.float32)

    feats = slam_traj_features(jnp.asarray(m), jnp.asarray(trans))
    assert feats.shape == (b, t, 18)
    # rot6d part is rows of the rotation matrices
    np.testing.assert_allclose(np.asarray(feats[:, :, :6]), m[:, :-1, :2, :].reshape(b, t, 6), atol=1e-6)

    model = HeadNormalFormer(d_model=32, n_layers=1, n_head=2, d_k=16, d_v=16,
                             window=40, mlp_hsize=(16,))
    fpad, mask = prep_gravitynet_input(jnp.asarray(m), jnp.asarray(trans), 40)
    assert fpad.shape == (b, 40, 18) and mask.shape == (b, 40)
    assert float(mask[0].sum()) == t
    params = model.init(jax.random.PRNGKey(0), fpad, mask)
    normal = model.apply(params, fpad, mask)
    assert normal.shape == (b, 3)


def test_gravitynet_eval_transform_properties():
    rng = np.random.RandomState(6)
    t = 25
    slam_rot = sR.random(t, random_state=7).as_matrix().astype(np.float32)
    slam_trans = np.cumsum(rng.randn(t, 3).astype(np.float32) * 0.01, axis=0)
    gt_pose = np.concatenate(
        [np.cumsum(rng.randn(t, 3).astype(np.float32) * 0.05, axis=0),
         np.tile([1.0, 0, 0, 0], (t, 1)).astype(np.float32)], axis=-1
    )
    normal = jnp.asarray([0.1, 0.05, 0.99])
    out = gravitynet_eval_transform(
        normal, jnp.asarray(slam_rot), jnp.asarray(slam_trans),
        jnp.float32(2.0), jnp.asarray(gt_pose),
    )
    # starts at GT first-frame translation
    np.testing.assert_allclose(np.asarray(out["head_trans"][0]), gt_pose[0, :3], atol=1e-5)
    # scale preserved: successive displacement norms = 2x originals (rigid rotations preserve norm)
    d_out = np.linalg.norm(np.diff(np.asarray(out["head_trans"]), axis=0), axis=1)
    d_in = np.linalg.norm(np.diff(slam_trans, axis=0), axis=1)
    np.testing.assert_allclose(d_out, 2.0 * d_in, rtol=1e-3)
    # rotations stay valid
    r = np.asarray(out["head_rot_mat"])
    np.testing.assert_allclose(
        np.einsum("tij,tkj->tik", r, r), np.broadcast_to(np.eye(3), r.shape), atol=1e-4
    )
