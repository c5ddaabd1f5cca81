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


def test_html_viewer_export(tmp_path):
    """Standalone HTML animation export (scenepic sp_animation replacement,
    mesh_motion.py:287-339): valid self-contained file, embeds every layer,
    round-trips the frame data."""
    import json
    import re

    from egoego_release_tpu.vis.html_viewer import (
        HTMLAnimation,
        vis_skeleton_motion_html,
    )

    rng = np.random.RandomState(0)
    jpos = rng.randn(5, 22, 3).astype(np.float32)
    traj = rng.randn(5, 3).astype(np.float32)

    anim = HTMLAnimation(fps=30, title="test seq")
    anim.add_skeleton("pred", jpos)
    anim.add_trajectory("head", traj)
    out = anim.save_animation(str(tmp_path / "anim.html"))

    html = open(out).read()
    assert html.startswith("<!DOCTYPE html>")
    assert "test seq" in html and "__DATA__" not in html
    data = json.loads(re.search(r"const DATA = (\{.*?\});\n", html).group(1))
    assert data["numFrames"] == 5
    assert data["skeletons"][0]["name"] == "pred"
    assert len(data["skeletons"][0]["parents"]) == 22
    np.testing.assert_allclose(
        np.asarray(data["skeletons"][0]["frames"]), jpos, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(data["trajectories"][0]["points"]), traj, atol=1e-3
    )

    # one-call analog of vis_mesh_motion with GT overlay
    out2 = vis_skeleton_motion_html(
        jpos, str(tmp_path / "cmp.html"), gt_jpos=jpos + 0.1, head_traj=traj
    )
    data2 = json.loads(re.search(r"const DATA = (\{.*?\});\n", open(out2).read()).group(1))
    assert [s["name"] for s in data2["skeletons"]] == ["pred", "gt"]


def test_html_mesh_viewer_roundtrip(tmp_path):
    """add_mesh embeds a quantized-uint16 base64 vertex stream: re-parsing
    the standalone html must recover the vertices within the quantization
    resolution (span/65535) and preserve faces/frames — the sp_animation
    mesh-mode twin (mesh_motion.py:287-339), validated without a browser."""
    import base64
    import json
    import re

    import numpy as np

    from egoego_release_tpu.vis.html_viewer import vis_mesh_motion_html

    rng = np.random.RandomState(0)
    t, v = 5, 12
    base = rng.uniform(-0.5, 0.5, (v, 3)).astype(np.float32)
    offsets = np.cumsum(rng.uniform(-0.05, 0.05, (t, 1, 3)), axis=0)
    verts = (base[None] + offsets).astype(np.float32)
    faces = np.array([[0, 1, 2], [2, 3, 4], [4, 5, 6], [6, 7, 8],
                      [8, 9, 10], [10, 11, 0]])
    head = verts[:, 0]

    out = str(tmp_path / "mesh.html")
    vis_mesh_motion_html(verts, faces, out, gt_verts=verts + 0.01,
                         head_traj=head, fps=25)
    html = open(out).read()
    data = json.loads(re.search(r"const DATA = (\{.*?\});\n", html).group(1))

    assert data["numFrames"] == t and data["fps"] == 25
    assert [m["name"] for m in data["meshes"]] == ["pred", "gt"]
    assert [tr["name"] for tr in data["trajectories"]] == ["head"]

    m = data["meshes"][0]
    assert m["numFrames"] == t and m["numVerts"] == v
    assert m["faces"] == faces.ravel().tolist()
    q = np.frombuffer(base64.b64decode(m["vertsB64"]), "<u2").reshape(t, v, 3)
    lo = np.asarray(m["lo"], np.float64)
    span = np.asarray(m["span"], np.float64)
    decoded = lo + q.astype(np.float64) / 65535.0 * span
    resolution = span / 65535.0
    assert np.all(np.abs(decoded - verts) <= resolution + 1e-6), (
        np.abs(decoded - verts).max(), resolution
    )
    # the JS renderer branches must be present in the standalone artifact
    for token in ("drawMesh", "meshVert", "painter", "atob"):
        assert token in html


def test_html_mesh_viewer_rejects_bad_faces(tmp_path):
    import numpy as np
    import pytest

    from egoego_release_tpu.vis.html_viewer import HTMLAnimation

    anim = HTMLAnimation()
    verts = np.zeros((2, 4, 3), np.float32)
    with pytest.raises(AssertionError):
        anim.add_mesh("bad", verts, np.array([[0, 1, 9]]))
