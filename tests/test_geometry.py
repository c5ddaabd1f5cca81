"""qpos codec / head velocity / floor height tests."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as sR

from egoego_release_tpu.ops import geometry as G
from egoego_release_tpu.ops import rotations as rot


def test_qpos_euler_matches_scipy():
    rng = np.random.RandomState(0)
    t = 5
    qpos = np.zeros((t, 76), dtype=np.float32)
    qpos[:, :3] = rng.randn(t, 3)
    rq = rng.randn(t, 4); rq /= np.linalg.norm(rq, axis=-1, keepdims=True)
    qpos[:, 3:7] = rq
    eulers = (rng.rand(t, 23, 3) * 2 - 1) * 1.2
    qpos[:, 7:] = eulers.reshape(t, -1)

    trans, aa = G.qpos_to_smpl(jnp.asarray(qpos))
    np.testing.assert_allclose(np.asarray(trans), qpos[:, :3], atol=1e-6)

    # oracle: scipy intrinsic ZYX euler -> rotvec, then the joint permutation
    r = sR.from_euler("ZYX", eulers.reshape(-1, 3))
    joint_aa = r.as_rotvec().reshape(t, 23, 3)
    root_aa = sR.from_quat(np.roll(rq, -1, axis=-1)).as_rotvec()
    aa_mj = np.concatenate([root_aa[:, None], joint_aa], axis=1)
    oracle = aa_mj[:, G.MUJOCO2SMPL_JOINT_IDX]

    err = (sR.from_rotvec(np.asarray(aa).reshape(-1, 3)).inv()
           * sR.from_rotvec(oracle.reshape(-1, 3))).magnitude()
    assert err.max() < 1e-4


def test_qpos_roundtrip():
    rng = np.random.RandomState(1)
    t = 4
    trans = rng.randn(t, 3).astype(np.float32)
    aa = (rng.randn(t, 24, 3) * 0.5).astype(np.float32)
    qpos = G.smpl_to_qpos(jnp.asarray(trans), jnp.asarray(aa))
    trans2, aa2 = G.qpos_to_smpl(qpos)
    np.testing.assert_allclose(np.asarray(trans2), trans, atol=1e-5)
    err = (sR.from_rotvec(np.asarray(aa2).reshape(-1, 3)).inv()
           * sR.from_rotvec(aa.reshape(-1, 3))).magnitude()
    assert err.max() < 1e-4


def test_get_head_vel_matches_loop_oracle():
    rng = np.random.RandomState(2)
    t = 12
    pose = np.zeros((t, 7), dtype=np.float32)
    pose[:, :3] = np.cumsum(rng.randn(t, 3) * 0.02, axis=0)
    q = rng.randn(t, 4); q /= np.linalg.norm(q, axis=-1, keepdims=True)
    pose[:, 3:] = q

    out = np.asarray(G.get_head_vel(jnp.asarray(pose)))
    assert out.shape == (t, 6)

    # oracle per frame
    dt = 1 / 30
    for i in range(t - 1):
        v = (pose[i + 1, :3] - pose[i, :3]) / dt
        hq = q[i].copy(); hq[1] = hq[2] = 0; hq /= np.linalg.norm(hq)
        v_loc = sR.from_quat(np.roll(hq, -1)).inv().apply(v)
        np.testing.assert_allclose(out[i, :3], v_loc, atol=1e-4)

        r_rel = sR.from_quat(np.roll(q[i + 1], -1)) * sR.from_quat(np.roll(q[i], -1)).inv()
        rv = r_rel.as_rotvec() / dt
        rv_loc = sR.from_quat(np.roll(q[i], -1)).inv().apply(rv)
        np.testing.assert_allclose(out[i, 3:], rv_loc, atol=1e-3)
    np.testing.assert_allclose(out[-1], out[-2], atol=1e-6)


def test_floor_height_flat_stance():
    t = 60
    jpos = np.zeros((t, 22, 3))
    jpos[:, :, 2] = 1.0            # body parts at 1m
    jpos[:, 10, 2] = 0.31          # left toe static at 0.31
    jpos[:, 11, 2] = 0.32          # right toe slightly higher
    floor, contacts, discard = G.determine_floor_height_and_contacts(jpos, fps=30)
    # min cluster median 0.31, offset by 0.01
    assert abs(floor - 0.30) < 1e-6
    assert contacts[:, 10].all() and contacts[:, 11].all()
    assert not discard


def test_obj_relative_pose_identity_ref():
    rng = np.random.RandomState(3)
    t = 6
    obj = np.zeros((t, 7), dtype=np.float32)
    obj[:, :3] = rng.randn(t, 3)
    obj[:, 3] = 1.0
    ref = np.zeros((t, 7), dtype=np.float32)
    ref[:, 3] = 1.0  # identity orientation at origin
    out = np.asarray(G.get_obj_relative_pose(jnp.asarray(obj), jnp.asarray(ref)))
    np.testing.assert_allclose(out[:, :3], obj[:, :3], atol=1e-5)
    np.testing.assert_allclose(out[:, 3:], obj[:, 3:], atol=1e-5)


def test_qpos_codec_near_gimbal_lock():
    """ZYX euler extraction degenerates at pitch = ±pi/2; the codec must stay
    finite and the roundtrip rotation error bounded near the singularity."""
    rng = np.random.RandomState(9)
    t = 8
    aa = np.zeros((t, 24, 3), np.float32)
    # drive joint 1 (mujoco order) toward pitch ±pi/2
    for i, eps in enumerate([1e-3, 1e-4, 1e-5, 1e-6, -1e-3, -1e-4, -1e-5, -1e-6]):
        pitch = np.pi / 2 - eps
        r = sR.from_euler("ZYX", [0.3, pitch, -0.2])
        aa[i, G.MUJOCO2SMPL_JOINT_IDX[1]] = r.as_rotvec()
    trans = rng.randn(t, 3).astype(np.float32)
    qpos = G.smpl_to_qpos(jnp.asarray(trans), jnp.asarray(aa))
    assert np.isfinite(np.asarray(qpos)).all()
    tr2, aa2 = G.qpos_to_smpl(qpos)
    assert np.isfinite(np.asarray(aa2)).all()
    err = (sR.from_rotvec(np.asarray(aa2).reshape(-1, 3)).inv()
           * sR.from_rotvec(aa.reshape(-1, 3))).magnitude()
    # f32 arcsin loses ~sqrt(eps) precision at |sin|->1: ~1 degree at 1e-6
    # from the singularity; must stay bounded (no blow-up), and be tight away
    # from it
    assert err.max() < 0.05
    err_away = err.reshape(t, -1)[[0, 4]]  # the 1e-3-away cases
    assert err_away.max() < 1e-3


def test_head_vel_near_identity_rotation():
    """Tiny frame-to-frame rotations (the common case) must not blow up the
    angular-velocity finite difference."""
    t = 10
    pose = np.zeros((t, 7), np.float32)
    pose[:, 3] = 1.0
    pose[:, 4] = np.linspace(0, 1e-6, t)  # microscopic rotation drift
    pose[:, 3:] /= np.linalg.norm(pose[:, 3:], axis=-1, keepdims=True)
    out = np.asarray(G.get_head_vel(jnp.asarray(pose)))
    assert np.isfinite(out).all()
    assert np.abs(out[:, 3:]).max() < 1e-3


# ---------------------------------------------------------------------------
# floor height / contacts / terrain discard vs the reference's OWN function
# (process_amass_dataset.py:160-338, imported via tests/refstubs)
# ---------------------------------------------------------------------------

def _synthetic_body_seq(kind: str, t: int = 90, seed: int = 0) -> np.ndarray:
    """(T, 22, 3) sequences: 'flat' = standing/walking on z=0;
    'stairs' = second half standing on a 0.3 m step (root raised too);
    'crouch' = toes briefly high but root stays low (must NOT discard)."""
    rng = np.random.RandomState(seed)
    seq = rng.uniform(-0.002, 0.002, (t, 22, 3))  # small static jitter
    seq[:, :, 2] += 0.5   # generic joints mid-height
    J_ROOT, J_LTOE, J_RTOE = 0, 10, 11
    seq[:, J_ROOT, 2] = 0.9 + rng.uniform(-0.001, 0.001, t)
    seq[:, J_LTOE, 2] = 0.01 + rng.uniform(-0.001, 0.001, t)
    seq[:, J_RTOE, 2] = 0.012 + rng.uniform(-0.001, 0.001, t)
    if kind == "stairs":
        half = t // 2
        seq[half:, J_LTOE, 2] += 0.30
        seq[half:, J_RTOE, 2] += 0.30
        seq[half:, J_ROOT, 2] += 0.30
    elif kind == "crouch":
        # toes high for a long stretch but the root DROPS (sitting on heels)
        half = t // 2
        seq[half:, J_LTOE, 2] += 0.30
        seq[half:, J_RTOE, 2] += 0.30
        seq[half:, J_ROOT, 2] -= 0.40
    return seq


def test_floor_and_terrain_discard_vs_reference():
    import reforacle

    ref_mod = reforacle.import_reference("utils.data_utils.process_amass_dataset")

    for kind, want_discard in (("flat", False), ("stairs", True), ("crouch", False)):
        seq = _synthetic_body_seq(kind)
        ref_floor, ref_contacts, ref_discard = \
            ref_mod.determine_floor_height_and_contacts(seq, fps=30)
        floor, contacts, discard = G.determine_floor_height_and_contacts(seq, fps=30)
        assert discard == ref_discard == want_discard, (kind, discard, ref_discard)
        np.testing.assert_allclose(floor, ref_floor, atol=1e-9, err_msg=kind)
        np.testing.assert_array_equal(contacts, ref_contacts[:, :22], err_msg=kind)


def test_terrain_discard_needs_all_three_conditions():
    """Small clusters (< CLUSTER_SIZE_THRESH * fps frames) on a step must not
    trigger the discard (process_amass_dataset.py:273)."""
    seq = _synthetic_body_seq("flat", t=90)
    # 5 static frames on a step: cluster size 10 (L+R) > 7 at fps=30... use 3
    seq[40:43, 10, 2] += 0.30
    seq[40:43, 11, 2] += 0.30
    seq[40:43, 0, 2] += 0.30
    _, _, discard = G.determine_floor_height_and_contacts(seq, fps=30)
    assert not discard  # cluster size 6 <= int(0.25 * 30) = 7
