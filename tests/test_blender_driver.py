"""Blender driver: binary discovery + command contract (stub binary) and
frame stitching, mirroring run_blender_rendering_and_save2video
(blender_vis_mesh_motion.py:34-101)."""

import os
import stat

import numpy as np

from egoego_release_tpu.vis import blender_driver


def test_run_blender_rendering_invokes_stub(tmp_path, monkeypatch):
    log = tmp_path / "argv.txt"
    stub = tmp_path / "blender"
    stub.write_text(f'#!/bin/sh\necho "$@" > {log}\n')
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("BLENDER_PATH", str(stub))

    obj_dir = tmp_path / "objs"
    out_dir = tmp_path / "frames"
    obj_dir.mkdir()
    ok = blender_driver.run_blender_rendering(
        str(obj_dir), str(out_dir), "/some/script.py",
        scene_blend="/some/scene.blend",
    )
    assert ok and os.path.isdir(out_dir)
    argv = log.read_text().split()
    # reference CLI contract: blender -b [scene] -P script -- --folder ...
    assert argv[0] == "-b" and argv[1] == "/some/scene.blend"
    assert argv[2:4] == ["-P", "/some/script.py"]
    assert "--folder" in argv and "--out-folder" in argv


def test_run_blender_rendering_missing_binary(tmp_path, monkeypatch):
    monkeypatch.setenv("BLENDER_PATH", "")
    monkeypatch.setenv("PATH", str(tmp_path))  # no blender on PATH
    assert blender_driver.find_blender() is None
    assert not blender_driver.run_blender_rendering(
        str(tmp_path), str(tmp_path / "o"), "s.py"
    )


def test_frames_to_video(tmp_path):
    try:
        import imageio  # noqa: F401
        from PIL import Image
    except ImportError:
        return  # optional dependency absent: the driver returns False anyway
    frames = tmp_path / "frames"
    frames.mkdir()
    for i in range(3):
        Image.fromarray(
            np.full((8, 8, 3), i * 60, np.uint8)
        ).save(frames / f"{i:04d}.png")
    out = tmp_path / "out.mp4"
    ok = blender_driver.frames_to_video(str(frames), str(out), fps=5)
    assert ok
    # mp4 when an ffmpeg plugin exists, GIF fallback otherwise
    written = out if out.exists() else tmp_path / "out.gif"
    assert written.exists() and written.stat().st_size > 0
