"""Loaders for the reference's on-disk formats.

Format parity targets:
  * joblib motion pickles — per-sequence records with keys
    root_orient (T,3), body_pose (T,63), trans (T,3), beta (16,), gender,
    seq_name, of_files, head_qpos (T,7), head_vels (T,6),
    global_head_trans (T,3), global_head_rot_6d (T,6) [+ _diff variants]
    (verified against test_data/ares/demo_ares_data.p)
  * DROID-SLAM .npy trajectories, (T, 7) = trans + quat wxyz
    (egoego/data/ares_headpose_dataset.py:111-120)
  * RAFT optical-flow feature .npy files, (512,) per frame
  * min/max normalization stats pickles
    (amass_diffusion_dataset.py:233-239)
"""

from __future__ import annotations

import os

import joblib
import numpy as np
import jax.numpy as jnp

from egoego_release_tpu.diffusion.gaussian_diffusion import NormStats
from egoego_release_tpu.ops import rotations as rot


def load_motion_dict(path: str) -> dict:
    """Load a reference-format joblib motion pickle ({index: record})."""
    return joblib.load(path)


def load_norm_stats(path: str) -> NormStats:
    """Load min/max stats (e.g. cano_min_max_mean_std_data_window_120.p)."""
    d = joblib.load(path)
    r = lambda k: (
        jnp.asarray(np.asarray(d[k], np.float32).reshape(22, 3)) if k in d else None
    )
    return NormStats(
        jpos_min=r("global_jpos_min"),
        jpos_max=r("global_jpos_max"),
        jvel_min=r("global_jvel_min"),
        jvel_max=r("global_jvel_max"),
    )


def save_norm_stats(path: str, stats_dict: dict) -> None:
    joblib.dump(stats_dict, path)


def load_droidslam(path: str):
    """(T,7) npy -> (trans (T,3), rot_mat (T,3,3), quat_wxyz (T,4)) numpy,
    mirroring load_data_from_droidslam (ares_headpose_dataset.py:110-119)."""
    data = np.load(path)
    trans = data[:, :3].astype(np.float32)
    quat = data[:, 3:].astype(np.float32)
    mat = rot.quat_to_matrix_np(quat)
    return trans, mat, quat


def load_of_feats(of_files: list[str], rewrite: tuple[str, str] | None = None,
                  feat_dim: int = 512) -> np.ndarray:
    """Stack per-frame optical-flow feature npys -> (T, 512).  `rewrite`
    maps the absolute paths stored in the pickles onto the local data root
    (the reference hardcodes the authors' cluster paths —
    ares_headpose_dataset.py:163-166).

    Reads through the native multithreaded C++ loader when available
    (data/native_loader.py); numpy fallback otherwise."""
    from egoego_release_tpu.data.native_loader import load_npy_batch

    paths = []
    for f in of_files:
        if rewrite is not None:
            f = f.replace(rewrite[0], rewrite[1])
        paths.append(f.replace("raft_flows", "raft_of_feats"))
    return load_npy_batch(paths, feat_dim)


def load_raw_flows(of_files: list[str], rewrite: tuple[str, str] | None = None,
                   augment=None) -> np.ndarray:
    """Stack per-frame RAW optical-flow npys -> (T, H, W, 2) — the
    input_of_feats=False HeadNet path (ares_headpose_dataset.py:149-158
    load_of).  `augment` is an optional per-frame callable (the reference
    applies augment_flow to each frame when training)."""
    flows = []
    for f in of_files:
        if rewrite is not None:
            f = f.replace(rewrite[0], rewrite[1])
        flow = np.load(f)
        if augment is not None:
            flow = augment(flow)
        flows.append(flow)
    return np.stack(flows).astype(np.float32)


def find_slam_npy(slam_res_folder: str, seq_name: str) -> str | None:
    """seq_name 'scene-rest-of-name' -> {folder}/{scene}/{rest}.npy
    (ares_headpose_dataset.py:57-60)."""
    scene = seq_name.split("-")[0]
    npy_name = "-".join(seq_name.split("-")[1:])
    path = os.path.join(slam_res_folder, scene, npy_name + ".npy")
    return path if os.path.exists(path) else None
