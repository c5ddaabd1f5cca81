"""GravityNet training dataset: GT head trajectories with random rotation +
scale augmentation generating (augmented trajectory, floor normal) pairs.

Port of AMASSHeadPoseDataset (egoego/data/amass_headpose_dataset.py:11-165).
Supervision comes from the augmentation itself: rotate a gravity-aligned
trajectory by a random rotation R and the floor normal becomes R @ [0,0,1];
scale the translation diffs by s in [0.1, 10) and the GT inverse scale is
1/s.
"""

from __future__ import annotations

import random

import numpy as np
from scipy.spatial.transform import Rotation as sR

from egoego_release_tpu.ops import rotations as rot

TRAIN_DATASETS = (
    "CMU", "MPI_Limits", "TotalCapture", "Eyes_Japan_Dataset", "KIT",
    "BioMotionLab_NTroje", "BMLmovi", "EKUT", "ACCAD",
)


def augment_head_traj(head_pose: np.ndarray, rng: np.random.RandomState):
    """head_pose (T, 7) -> dict with the augmented trajectory + GT targets
    (augment_traj, amass_headpose_dataset.py:73-79)."""
    trans = head_pose[:, :3]
    quat = head_pose[:, 3:]
    rot_mat = rot.quat_to_matrix_np(quat)

    random_rot = sR.random(random_state=rng).as_matrix().astype(np.float32)
    aug_rot_mat = np.einsum("ij,tjk->tik", random_rot, rot_mat)
    centered = trans - trans[0:1]
    aug_trans = np.einsum("ij,tj->ti", random_rot, centered)
    floor_normal = random_rot @ np.asarray([0.0, 0.0, 1.0], np.float32)

    scale = rng.uniform(0.1, 10.0)
    diffs = (aug_trans[1:] - aug_trans[:-1]) * scale
    aug_trans = np.concatenate(
        [aug_trans[0:1], aug_trans[0:1] + np.cumsum(diffs, axis=0)]
    )

    return {
        "head_rot_mat": aug_rot_mat.astype(np.float32),
        "head_trans": aug_trans.astype(np.float32),
        "aligned_rot_mat": random_rot.T,   # recover rotation
        "aligned_scale": np.float32(1.0 / scale),
        "floor_normal": floor_normal.astype(np.float32),
    }


class AMASSHeadPoseDataset:
    """all_data_dict: {seq_name: {'head_pose': (T, 7), ...}}."""

    def __init__(self, all_data_dict: dict, train: bool, window: int = 120,
                 for_eval: bool = False, seed: int = 0):
        self.window = window
        self.train = train
        self.for_eval = for_eval
        self.all_data = all_data_dict
        self.rng = np.random.RandomState(seed)

        names = []
        for seq_name in all_data_dict:
            if all_data_dict[seq_name]["head_pose"].shape[0] > 30:
                is_train = seq_name.split("-")[0] in TRAIN_DATASETS
                if is_train == train:
                    names.append(seq_name)
        self.names = names

    def __len__(self):
        return len(self.names)

    def __getitem__(self, index: int) -> dict:
        seq_name = self.names[index]
        head_pose = np.asarray(self.all_data[seq_name]["head_pose"], np.float32)
        seq_len = head_pose.shape[0]

        if self.for_eval or seq_len - self.window - 1 <= 0:
            t0 = 0
            t1 = min(seq_len, self.window + 1)
        else:
            t0 = random.randint(0, seq_len - self.window - 2)
            t1 = t0 + self.window + 1
        window_pose = head_pose[t0:t1]

        aug = augment_head_traj(window_pose, self.rng)
        actual = window_pose.shape[0]
        if actual < self.window + 1:
            padn = self.window + 1 - actual
            window_pose = np.concatenate([window_pose, np.zeros((padn, 7), np.float32)])
            aug["head_rot_mat"] = np.concatenate(
                [aug["head_rot_mat"], np.zeros((padn, 3, 3), np.float32)]
            )
            aug["head_trans"] = np.concatenate(
                [aug["head_trans"], np.zeros((padn, 3), np.float32)]
            )

        return {
            "ori_head_pose": window_pose,
            "head_rot_mat": aug["head_rot_mat"],
            "head_trans": aug["head_trans"],
            "seq_len": actual,
            "seq_name": seq_name,
            "aligned_rot_mat": aug["aligned_rot_mat"],
            "aligned_scale": aug["aligned_scale"],
            "floor_normal": aug["floor_normal"],
        }

    def batch_iterator(self, batch_size: int, shuffle: bool = True):
        n = len(self)
        while True:
            idx = self.rng.permutation(n) if shuffle else np.arange(n)
            for i in range(0, n - batch_size + 1, batch_size):
                items = [self[j] for j in idx[i : i + batch_size]]
                yield {
                    k: np.stack([it[k] for it in items])
                    for k in items[0]
                    if k != "seq_name"
                }
