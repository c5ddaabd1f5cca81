"""Egocentric camera-pose export (the portable core of ARES synthesis)."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from egoego_release_tpu.ops import fk as fk_mod
from egoego_release_tpu.preprocess.ego_camera import (
    MP3D_TO_HABITAT,
    camera_poses_from_motion,
    camera_rotation_from_head,
    head_orientation,
    process_motion_dir,
)


def _random_motion(t=6, seed=0):
    rng = np.random.RandomState(seed)
    root_aa = 0.3 * rng.randn(t, 3)
    body_aa = 0.2 * rng.randn(t, 21, 3)
    return root_aa, body_aa


def test_head_orientation_matches_chain_oracle():
    """Global head rotation == product of local matrices down the kintree
    (independent scipy/numpy loop)."""
    root_aa, body_aa = _random_motion()
    ours = head_orientation(root_aa, body_aa)

    parents = fk_mod.SMPL_PARENTS
    t = len(root_aa)
    local = np.concatenate(
        [Rotation.from_rotvec(root_aa).as_matrix()[:, None],
         Rotation.from_rotvec(body_aa.reshape(-1, 3)).as_matrix().reshape(t, 21, 3, 3)],
        axis=1,
    )
    for fr in range(t):
        g = np.zeros((22, 3, 3))
        for j in range(22):
            g[j] = local[fr, j] if parents[j] < 0 else g[parents[j]] @ local[fr, j]
        np.testing.assert_allclose(ours[fr], g[fk_mod.HEAD_IDX], atol=1e-5)


def test_world_conversion_and_camera_frame():
    # z-up -> y-up: habitat GRAVITY (0,-1,0) receives mp3d -z; up maps to up
    np.testing.assert_allclose(MP3D_TO_HABITAT @ [0, 0, -1], [0, -1, 0], atol=1e-12)
    np.testing.assert_allclose(MP3D_TO_HABITAT @ [0, 0, 1], [0, 1, 0], atol=1e-12)
    assert abs(np.linalg.det(MP3D_TO_HABITAT) - 1.0) < 1e-12

    root_aa, body_aa = _random_motion(seed=1)
    head = head_orientation(root_aa, body_aa)
    cam = camera_rotation_from_head(head)
    # proper rotations, and the camera's -z (its viewing direction) is the
    # head frame's +z (save_obs_replica_from_motion_seq.py:239-242)
    assert np.all(np.linalg.det(cam) > 0.999)
    np.testing.assert_allclose(-cam[..., :, 2], head[..., :, 2], atol=1e-6)
    np.testing.assert_allclose(cam[..., :, 1], head[..., :, 1], atol=1e-6)


def test_camera_poses_outputs_consistent():
    root_aa, body_aa = _random_motion(seed=2)
    t = len(root_aa)
    head_pos = np.cumsum(0.02 * np.random.RandomState(3).randn(t, 3), 0) + [0, 0, 1.6]
    out = camera_poses_from_motion(root_aa, body_aa, head_pos)
    assert out["positions"].shape == (t, 3)
    assert out["quats_wxyz"].shape == (t, 4)
    assert out["mats4"].shape == (t, 4, 4)
    # quats reconstruct the matrices
    m = Rotation.from_quat(out["quats_wxyz"][:, [1, 2, 3, 0]]).as_matrix()
    np.testing.assert_allclose(m, out["mats4"][:, :3, :3], atol=1e-5)
    # z-up head height becomes habitat y
    np.testing.assert_allclose(out["positions"][:, 1], head_pos[:, 2], atol=1e-6)


def test_process_motion_dir_cli(tmp_path):
    root_aa, body_aa = _random_motion(seed=4)
    t = len(root_aa)
    rng = np.random.RandomState(5)
    motion = tmp_path / "CMU_run_01"
    motion.mkdir()
    np.savez(
        motion / "motion_seq.npz",
        root_orient=Rotation.from_rotvec(root_aa).as_matrix(),
        pose_body=Rotation.from_rotvec(body_aa.reshape(-1, 3)).as_matrix()
        .reshape(t, 21, 3, 3),
        joints=rng.randn(t, 22, 3).astype(np.float32),
        head_cam_v_pos=rng.randn(t, 3).astype(np.float32) + [0, 0, 1.6],
    )
    assert process_motion_dir(str(motion)) is True
    out = np.load(motion / "camera_poses.npz")
    assert out["positions"].shape == (t, 3)
    assert np.isfinite(out["mats4"]).all()
    # idempotent unless overwrite
    assert process_motion_dir(str(motion)) is False
    assert process_motion_dir(str(motion), overwrite=True) is True
