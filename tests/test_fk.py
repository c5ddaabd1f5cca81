"""FK/IK vs. a brute-force sequential numpy oracle (independent of the impl)."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as sR

from egoego_release_tpu.ops import fk as fk_mod
from egoego_release_tpu.ops import rotations as rot


PARENTS = fk_mod.SMPL_PARENTS


def seq_fk_oracle(local_quat_wxyz, offsets, root_trans):
    """Sequential per-joint FK using scipy, mirroring the reference's loop
    (amass_diffusion_dataset.py:281-287)."""
    n, j, _ = local_quat_wxyz.shape
    gq = np.zeros((n, j, 4))
    gp = np.zeros((n, j, 3))
    gq[:, 0] = local_quat_wxyz[:, 0]
    gp[:, 0] = offsets[0]
    for i in range(1, j):
        p = PARENTS[i]
        rp = sR.from_quat(np.roll(gq[:, p], -1, axis=-1))  # wxyz->xyzw
        gp[:, i] = rp.apply(np.broadcast_to(offsets[i], (n, 3))) + gp[:, p]
        ri = sR.from_quat(np.roll(local_quat_wxyz[:, i], -1, axis=-1))
        gchild = rp * ri
        q = gchild.as_quat()
        gq[:, i] = np.roll(q, 1, axis=-1)
    gp = gp + root_trans[:, None, :]
    return gq, gp


def rand_local_quats(n, j, seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(n, j, 4)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return q.astype(np.float32)


def test_fk_matches_sequential_oracle():
    n = 8
    lq = rand_local_quats(n, 22)
    offsets = np.random.RandomState(1).randn(22, 3).astype(np.float32) * 0.2
    offsets[0] = 0.0
    root_trans = np.random.RandomState(2).randn(n, 3).astype(np.float32)

    gq, gp = fk_mod.fk_from_local_quat(
        jnp.asarray(lq), jnp.asarray(offsets), jnp.asarray(root_trans)
    )
    gq_o, gp_o = seq_fk_oracle(lq, offsets, root_trans)

    np.testing.assert_allclose(np.asarray(gp), gp_o, atol=1e-4)
    dot = np.abs(np.sum(np.asarray(gq) * gq_o, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-4)


def test_ik_inverts_fk():
    n = 4
    lq = rand_local_quats(n, 22, seed=3)
    offsets = np.zeros((22, 3), dtype=np.float32)
    gq, _ = fk_mod.fk_from_local_quat(jnp.asarray(lq), jnp.asarray(offsets))
    lq2 = np.asarray(fk_mod.ik_to_local_quat(gq))
    dot = np.abs(np.sum(lq2 * lq, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-4)


def test_local_to_global_matrix_matches_fk_rotations():
    n = 4
    lq = rand_local_quats(n, 22, seed=4)
    lmat = np.asarray(rot.quat_to_matrix(jnp.asarray(lq)))
    gmat = np.asarray(fk_mod.local_to_global_matrix(jnp.asarray(lmat)))
    gq, _ = fk_mod.fk_from_local_quat(jnp.asarray(lq), jnp.zeros((22, 3)))
    gmat2 = np.asarray(rot.quat_to_matrix(gq))
    np.testing.assert_allclose(gmat, gmat2, atol=1e-4)


def test_fk_smpl_axis_angle_path():
    n = 6
    rng = np.random.RandomState(5)
    aa = (rng.randn(n, 22, 3) * 0.3).astype(np.float32)
    offsets = rng.randn(22, 3).astype(np.float32) * 0.1
    offsets[0] = 0
    root_trans = rng.randn(n, 3).astype(np.float32)
    gq, gp = fk_mod.fk_smpl(jnp.asarray(root_trans), jnp.asarray(aa), jnp.asarray(offsets))

    lq = np.roll(sR.from_rotvec(aa.reshape(-1, 3)).as_quat().reshape(n, 22, 4), 1, axis=-1)
    gq_o, gp_o = seq_fk_oracle(lq, offsets, root_trans)
    np.testing.assert_allclose(np.asarray(gp), gp_o, atol=1e-4)
    dot = np.abs(np.sum(np.asarray(gq) * gq_o, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-4)
