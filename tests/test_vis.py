"""Visualization output smoke tests (OBJ export + matplotlib plots)."""

import os

import numpy as np

from egoego_release_tpu.vis.mesh_export import save_obj
from egoego_release_tpu.vis.plots import (
    show3dpose_animation,
    vis_head_pose_traj,
    vis_head_traj_2d,
)


def test_save_obj(tmp_path):
    verts = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.asarray([[0, 1, 2]])
    path = os.path.join(tmp_path, "m.obj")
    save_obj(path, verts, faces)
    lines = open(path).read().strip().splitlines()
    assert lines[0].startswith("v ") and lines[-1] == "f 1 2 3"


def test_head_traj_plots(tmp_path):
    t = 30
    rng = np.random.RandomState(0)
    trans = np.cumsum(rng.randn(t, 3) * 0.05, 0)
    rot = np.tile(np.eye(3), (t, 1, 1))
    p1 = vis_head_pose_traj(trans, rot, os.path.join(tmp_path, "traj3d.png"),
                            gt_head_trans=trans + 0.1)
    p2 = vis_head_traj_2d(trans, os.path.join(tmp_path, "traj2d.png"))
    assert os.path.getsize(p1) > 1000 and os.path.getsize(p2) > 1000


def test_skeleton_animation(tmp_path):
    rng = np.random.RandomState(1)
    jpos = rng.randn(1, 5, 22, 3).astype(np.float32)
    path = show3dpose_animation(jpos, os.path.join(tmp_path, "anim.gif"), fps=5)
    assert os.path.getsize(path) > 1000
