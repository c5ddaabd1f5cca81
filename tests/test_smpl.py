"""LBS vs. brute-force numpy oracle on a synthetic SMPL-like model."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as sR

from egoego_release_tpu.ops import fk as fk_mod
from egoego_release_tpu.ops.smpl import SMPLModel, lbs, rest_joints, rest_offsets_22, GenderedSMPL


def synth_model(v=40, j=6, n_betas=4, seed=0):
    rng = np.random.RandomState(seed)
    parents = np.asarray([-1, 0, 0, 1, 2, 3], dtype=np.int32)[:j]
    return SMPLModel(
        v_template=jnp.asarray(rng.randn(v, 3).astype(np.float32)),
        shapedirs=jnp.asarray(rng.randn(v, 3, n_betas).astype(np.float32) * 0.1),
        posedirs=jnp.asarray(rng.randn(v, 3, (j - 1) * 9).astype(np.float32) * 0.01),
        j_regressor=jnp.asarray(np.abs(rng.randn(j, v)).astype(np.float32) / v),
        weights=jnp.asarray(
            (lambda w: w / w.sum(-1, keepdims=True))(np.abs(rng.randn(v, j))).astype(np.float32)
        ),
        parents=jnp.asarray(parents),
    ), parents


def np_lbs_oracle(model, parents, betas, pose_aa, trans):
    """Standard SMPL LBS, sequential loops."""
    v_t = np.asarray(model.v_template)
    v_shaped = v_t + np.einsum("vdk,k->vd", np.asarray(model.shapedirs), betas)
    j_rest = np.asarray(model.j_regressor) @ v_shaped
    j = j_rest.shape[0]

    rots = sR.from_rotvec(pose_aa).as_matrix()
    pose_feat = (rots[1:] - np.eye(3)).reshape(-1)
    v_posed = v_shaped + np.einsum("vdp,p->vd", np.asarray(model.posedirs), pose_feat)

    g = np.zeros((j, 4, 4))
    g[0] = np.eye(4)
    g[0, :3, :3] = rots[0]
    g[0, :3, 3] = j_rest[0]
    for i in range(1, j):
        local = np.eye(4)
        local[:3, :3] = rots[i]
        local[:3, 3] = j_rest[i] - j_rest[parents[i]]
        g[i] = g[parents[i]] @ local
    posed_joints = g[:, :3, 3].copy()

    rel = g.copy()
    for i in range(j):
        rel[i, :3, 3] -= g[i, :3, :3] @ j_rest[i]

    w = np.asarray(model.weights)
    t_blend = np.einsum("vj,jik->vik", w, rel)
    v_h = np.concatenate([v_posed, np.ones((v_posed.shape[0], 1))], -1)
    verts = np.einsum("vik,vk->vi", t_blend, v_h)[:, :3] + trans
    return posed_joints + trans, verts


def test_lbs_matches_numpy_oracle():
    model, parents = synth_model()
    rng = np.random.RandomState(1)
    betas = rng.randn(4).astype(np.float32)
    pose = (rng.randn(6, 3) * 0.4).astype(np.float32)
    trans = rng.randn(3).astype(np.float32)

    joints, verts = lbs(model, jnp.asarray(betas[None]), jnp.asarray(pose[None]),
                        jnp.asarray(trans[None]))
    j_o, v_o = np_lbs_oracle(model, parents, betas, pose, trans)
    np.testing.assert_allclose(np.asarray(joints[0]), j_o, atol=1e-4)
    np.testing.assert_allclose(np.asarray(verts[0]), v_o, atol=1e-4)


def test_lbs_identity_pose():
    model, parents = synth_model(seed=2)
    betas = jnp.zeros((1, 4))
    pose = jnp.zeros((1, 6, 3))
    trans = jnp.asarray([[1.0, 2.0, 3.0]])
    joints, verts = lbs(model, betas, pose, trans)
    # identity pose: joints = rest joints + trans; verts = template + trans
    np.testing.assert_allclose(
        np.asarray(joints[0]), np.asarray(rest_joints(model)) + np.asarray(trans[0]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(verts[0]), np.asarray(model.v_template) + np.asarray(trans[0]), atol=1e-4
    )


def test_gendered_select():
    m, _ = synth_model(seed=3)
    f, _ = synth_model(seed=4)
    g = GenderedSMPL(male=m, female=f)
    betas = jnp.zeros((2, 4))
    pose = jnp.zeros((2, 6, 3))
    trans = jnp.zeros((2, 3))
    joints, _ = g.run(betas, pose, trans, jnp.asarray([False, True]))
    jm, _ = lbs(m, betas[:1], pose[:1], trans[:1])
    jf, _ = lbs(f, betas[1:], pose[1:], trans[1:])
    np.testing.assert_allclose(np.asarray(joints[0]), np.asarray(jm[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(joints[1]), np.asarray(jf[0]), atol=1e-6)


def test_rest_offsets_22_fk_roundtrip():
    """FK at identity pose over the rest offsets reproduces root-relative
    rest joints (the invariant the diffusion decode path relies on)."""
    rng = np.random.RandomState(5)
    v = 100
    model = SMPLModel(
        v_template=jnp.asarray(rng.randn(v, 3).astype(np.float32)),
        shapedirs=jnp.asarray(rng.randn(v, 3, 4).astype(np.float32) * 0.1),
        posedirs=jnp.asarray(rng.randn(v, 3, 21 * 9).astype(np.float32) * 0.01),
        j_regressor=jnp.asarray(np.abs(rng.randn(22, v)).astype(np.float32) / v),
        weights=jnp.asarray(np.ones((v, 22), np.float32) / 22),
        parents=jnp.asarray(fk_mod.SMPL_PARENTS),
    )
    offsets = rest_offsets_22(model)
    rj = np.asarray(rest_joints(model))[:22]
    gq, gp = fk_mod.fk_smpl(jnp.zeros((1, 3)), jnp.zeros((1, 22, 3)), offsets)
    np.testing.assert_allclose(np.asarray(gp[0]), rj - rj[0], atol=1e-5)
