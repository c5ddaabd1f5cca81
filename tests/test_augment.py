"""preprocess/augment.py vs the reference augment_amass.py formulas,
oracle-tested with scipy (never the implementation's own helpers)."""

import numpy as np
from scipy.spatial.transform import Rotation as sRot

from egoego_release_tpu.preprocess.augment import (
    LEFT_RIGHT_IDX,
    fix_height_qpos,
    flip_smpl,
    get_random_shape,
    sample_random_hemisphere_root,
    sample_seq_length,
)


def reference_flip_smpl(pose):
    """Verbatim re-expression of augment_amass.py:28-49 with scipy."""
    curr_spose = sRot.from_rotvec(pose.reshape(-1, 3))
    eul = curr_spose.as_euler("ZXY", degrees=False).reshape(
        pose.shape[0], 24, 3
    )
    eul[:, :, 0] *= -1
    eul[:, :, 2] *= -1
    eul = eul[:, LEFT_RIGHT_IDX, :]
    aa = sRot.from_euler("ZXY", eul.reshape(-1, 3), degrees=False)
    return aa.as_rotvec().reshape(pose.shape[0], 72)


def _aa_allclose(a, b, atol=1e-5):
    """Axis-angle equality up to the 2*pi*axis ambiguity: compare as
    rotation matrices."""
    ra = sRot.from_rotvec(a.reshape(-1, 3)).as_matrix()
    rb = sRot.from_rotvec(b.reshape(-1, 3)).as_matrix()
    np.testing.assert_allclose(ra, rb, atol=atol)


def test_flip_smpl_matches_reference_euler_formulation():
    rng = np.random.RandomState(0)
    pose = rng.randn(7, 72) * 0.9
    _aa_allclose(flip_smpl(pose), reference_flip_smpl(pose.copy()))


def test_flip_smpl_large_angles():
    """Angles near pi (where euler decompositions gimbal and the matrix
    log degenerates) must still mirror correctly."""
    rng = np.random.RandomState(1)
    axes = rng.randn(5, 24, 3)
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    pose = (axes * (np.pi - 1e-4)).reshape(5, 72)
    _aa_allclose(flip_smpl(pose), reference_flip_smpl(pose.copy()), atol=1e-5)


def test_flip_smpl_is_involution():
    rng = np.random.RandomState(2)
    pose = rng.randn(4, 72) * 0.8
    _aa_allclose(flip_smpl(flip_smpl(pose)), pose)


def test_hemisphere_root_matches_reference_composition():
    """augment_amass.py:52-58: rotvec of Rx(pi+U*pi/3) * Ry(U*2pi)."""
    class SeqRNG:
        def __init__(self, vals):
            self.vals = list(vals)

        def random_sample(self):
            return self.vals.pop(0)

    u_rot, u_pitch = 0.37, 0.81
    rng = SeqRNG([u_rot, u_pitch])
    got = sample_random_hemisphere_root(rng)
    rot = u_rot * np.pi * 2
    pitch = u_pitch * np.pi / 3 + np.pi
    want = (
        sRot.from_rotvec([pitch, 0, 0]) * sRot.from_rotvec([0, rot, 0])
    ).as_rotvec()
    _aa_allclose(got[None], want[None], atol=1e-5)


def test_hemisphere_root_sampling_ranges():
    """Decomposing any sample as Rx(p) @ Ry(r) recovers p in
    [pi, pi + pi/3) and r in [0, 2pi) — the reference's draw ranges
    (augment_amass.py:53-54)."""
    rng = np.random.RandomState(3)
    for _ in range(20):
        aa = sample_random_hemisphere_root(rng)
        m = sRot.from_rotvec(aa).as_matrix()
        # Rx(p) @ Ry(r): m[2,1]=sin p, m[1,1]=cos p; m[0,2]=sin r, m[0,0]=cos r
        p = np.arctan2(m[2, 1], m[1, 1]) % (2 * np.pi)
        r = np.arctan2(m[0, 2], m[0, 0]) % (2 * np.pi)
        assert np.pi - 1e-9 <= p <= np.pi + np.pi / 3 + 1e-9
        recon = (sRot.from_rotvec([p, 0, 0])
                 * sRot.from_rotvec([0, r, 0])).as_matrix()
        np.testing.assert_allclose(m, recon, atol=1e-5)


def test_sample_seq_length_windows():
    rng = np.random.RandomState(4)
    seq = np.arange(400)[:, None] * np.ones((1, 5))
    tran = np.arange(400)[:, None] * np.ones((1, 3))
    seqs, trans, starts = sample_seq_length(seq, tran, 150, rng)
    assert len(seqs) == len(trans) == len(starts) >= 2
    for s, tr, st in zip(seqs, trans, starts):
        assert s.shape[0] == 150 and tr.shape[0] == 150
        assert s[0, 0] == st  # window really starts at the start point
    # pass-through mode
    seqs, trans, starts = sample_seq_length(seq, tran, -1, rng)
    assert len(seqs) == 1 and starts == [] and seqs[0] is seq


def test_get_random_shape():
    rng = np.random.RandomState(5)
    s = get_random_shape(6, rng)
    assert s.shape == (6, 10)
    assert np.allclose(s, s[0])  # repeated across the batch, like torch.repeat


def make_wbpos(begin_feet_z, begin_root_z, t=10):
    wbpos = np.zeros((t, 24, 3))
    wbpos[:, :, 2] = 1.0
    wbpos[0, 4, 2] = begin_feet_z
    wbpos[0, 8, 2] = begin_feet_z + 0.02
    wbpos[0, 0, 2] = begin_root_z
    return wbpos


def test_fix_height_shifts_to_feet():
    qpos = np.zeros((10, 76))
    qpos[:, 2] = 0.9
    wbpos = make_wbpos(begin_feet_z=0.25, begin_root_z=0.95)
    out, status = fix_height_qpos(qpos, wbpos)
    assert status == "fixed"
    # z shifted by begin_feet - 0.015 (reference feet_offset)
    np.testing.assert_allclose(out[:, 2], 0.9 - (0.25 - 0.015))
    assert qpos[0, 2] == 0.9  # input untouched


def test_fix_height_crawling_guard():
    qpos = np.zeros((5, 76))
    wbpos = make_wbpos(begin_feet_z=0.0, begin_root_z=0.2)
    out, status = fix_height_qpos(qpos, wbpos)
    assert status == "crawling"
    np.testing.assert_array_equal(out, qpos)


def test_fix_height_penetration_veto():
    qpos = np.zeros((5, 76))
    wbpos = make_wbpos(begin_feet_z=0.5, begin_root_z=1.0)
    wbpos[3, 4, 2] = 0.2  # after the -0.485 shift: -0.285 < -0.15
    out, status = fix_height_qpos(qpos, wbpos)
    assert status == "invalid"
