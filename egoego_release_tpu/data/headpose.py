"""Head-pose sequence datasets (stage-1 eval / training inputs).

One generic dataset covers the reference's ARES / GIMO / Kinpoly-RealWorld /
demo variants (egoego/data/{ares,gimo,realworld,ares_demo}_headpose_dataset.py
— they share the record schema and SLAM attachment logic; only paths and
split conventions differ).  Host-side numpy; device feeding happens in the
eval/training drivers.
"""

from __future__ import annotations

import os
import random

import numpy as np

from egoego_release_tpu.data import formats
from egoego_release_tpu.ops import alignment


def augment_flow(flow: np.ndarray, rng: np.random.RandomState,
                 crop_size: int = 224, scale_range: tuple[int, int] = (230, 384)) -> np.ndarray:
    """Raw-flow training augmentation: random rescale + crop + gaussian noise
    (ares_headpose_dataset.py:172-192).  Used by the input_of_feats=False
    HeadNet path; host-side numpy (nearest-neighbor resize, no cv2 dep)."""
    scale = rng.randint(*scale_range)
    h, w = flow.shape[:2]
    yi = np.linspace(0, h - 1, scale).astype(int)
    xi = np.linspace(0, w - 1, scale).astype(int)
    flow = flow[yi][:, xi]
    top = rng.randint(0, scale - crop_size)
    left = rng.randint(0, scale - crop_size)
    flow = flow[top : top + crop_size, left : left + crop_size]
    return flow + rng.normal(0.0, 1.0, flow.shape)


class HeadPoseSequenceDataset:
    """Sequences with head pose, OF features, and attached DROID-SLAM results.

    Parameters mirror the reference datasets:
      motion_path: joblib pickle of per-sequence records
      slam_res_folder: root of DROID-SLAM npy results (scene/name.npy)
      of_rewrite: (old_prefix, new_prefix) for of_files path rewriting
      window: crop length for training; eval uses whole sequences
    """

    def __init__(
        self,
        motion_path: str,
        slam_res_folder: str | None = None,
        of_rewrite: tuple[str, str] | None = None,
        window: int = 120,
        train: bool = False,
        for_eval: bool = True,
        min_len: int | None = None,
        require_of_match: bool = False,
        input_of_feats: bool = True,
        augment: bool = True,
        seed: int = 0,
    ):
        """input_of_feats=False switches 'of' from precomputed 512-d features
        to raw flow frames (T, 224, 224, 2) with augment_flow applied when
        training — the reference's opt.input_of_feats=False path
        (ares_headpose_dataset.py:149-158, trainer_head_estimation.py)."""
        self.window = window
        self.train = train
        self.for_eval = for_eval
        self.of_rewrite = of_rewrite
        self.input_of_feats = input_of_feats
        self.augment = augment
        self._rng = np.random.RandomState(seed)

        raw = formats.load_motion_dict(motion_path)
        # filter: long enough + OF files consistent (ares_headpose_dataset.py:93-102)
        kept = {}
        for k in raw:
            rec = raw[k]
            seq_len = rec["head_qpos"].shape[0]
            if min_len is not None and seq_len <= min_len:
                continue
            if require_of_match and seq_len - 1 != len(rec["of_files"]):
                continue
            kept[len(kept)] = rec

        # attach SLAM results (ares_headpose_dataset.py:54-89)
        self.data = {}
        missing_slam = 0
        for k in kept:
            rec = kept[k]
            if slam_res_folder is not None:
                npy = formats.find_slam_npy(slam_res_folder, rec["seq_name"])
                if npy is None:
                    missing_slam += 1
                    continue
                ori_trans, ori_mat, ori_quat = formats.load_droidslam(npy)
                a_trans, a_mat, a_quat = alignment.align_slam_to_first_frame_np(
                    ori_trans, ori_quat, rec["head_qpos"][0].astype(np.float32),
                )
                rec = dict(rec)
                rec["aligned_slam_trans"] = a_trans
                rec["aligned_slam_rot_mat"] = a_mat
                rec["aligned_slam_rot_quat"] = a_quat
                rec["ori_slam_trans"] = ori_trans
                rec["ori_slam_rot_mat"] = ori_mat
                rec["ori_slam_rot_quat"] = ori_quat
            self.data[len(self.data)] = rec
        self.missing_slam = missing_slam

    def __len__(self):
        return len(self.data)

    def __getitem__(self, index: int) -> dict:
        """Record dict matching the reference __getitem__
        (ares_headpose_dataset.py:270-333): head_pose (T+1,7),
        head_vels (T,6), of (T,512), seq_len, seq_name [+ slam fields]."""
        rec = self.data[index]
        seq_head_pose = rec["head_qpos"]
        seq_head_vels = rec["head_vels"][:-1]  # drop duplicated last vel
        of_files = rec["of_files"]
        seq_len = seq_head_vels.shape[0]

        if self.for_eval:
            t0, t1 = 0, seq_len
        else:
            t0 = random.randint(0, seq_len - self.window)
            t1 = t0 + self.window

        if self.input_of_feats:
            of = formats.load_of_feats(of_files[t0:t1], self.of_rewrite)
        else:
            aug = (
                (lambda f: augment_flow(f, self._rng))
                if (self.train and self.augment) else None
            )
            of = formats.load_raw_flows(of_files[t0:t1], self.of_rewrite, augment=aug)
        q = {
            "head_pose": seq_head_pose[t0 : t1 + 1].astype(np.float32),
            "head_vels": seq_head_vels[t0:t1].astype(np.float32),
            "of": of,
            "seq_name": rec["seq_name"],
            "seq_len": t1 - t0,
        }
        for key in (
            "aligned_slam_trans", "aligned_slam_rot_quat", "aligned_slam_rot_mat",
            "ori_slam_trans", "ori_slam_rot_quat", "ori_slam_rot_mat",
        ):
            if key in rec:
                q[key] = rec[key][t0 : t1 + 1].astype(np.float32)
        return q


def ARESDemoDataset(data_root_folder: str) -> HeadPoseSequenceDataset:
    """The bundled demo fixture (egoego/data/ares_demo_dataset.py:23-56);
    rewrites the authors' cluster paths onto test_data/ares."""
    return HeadPoseSequenceDataset(
        motion_path=os.path.join(data_root_folder, "demo_ares_data.p"),
        slam_res_folder=os.path.join(data_root_folder, "droid_slam_res"),
        of_rewrite=(
            "/viscam/u/jiamanli/datasets/egomotion_syn_dataset/habitat_rendering_replica_all",
            data_root_folder,
        ),
        for_eval=True,
    )


def ARESHeadPoseDataset(data_root_folder: str, train: bool, window: int = 120,
                        for_eval: bool = False) -> HeadPoseSequenceDataset:
    """ares_headpose_dataset.py:23-97 path conventions."""
    split = "train" if train else "test"
    return HeadPoseSequenceDataset(
        motion_path=os.path.join(
            data_root_folder, "ares_egoego_processed", f"{split}_ares_smplh_motion.p"
        ),
        slam_res_folder=os.path.join(data_root_folder, "ares", "droid_slam_res"),
        of_rewrite=("/viscam/u/jiamanli/datasets/egomotion_syn_dataset",
                    os.path.join(data_root_folder, "ares")),
        window=window,
        train=train,
        for_eval=for_eval,
        min_len=window,
        require_of_match=True,
    )


def GIMOHeadPoseDataset(data_root_folder: str, train: bool, window: int = 120,
                        for_eval: bool = False,
                        split_json: str | None = None) -> HeadPoseSequenceDataset:
    """GIMO variant (gimo_headpose_dataset.py:24,119-198): optional
    train/val split json {seq_name: "train"|"test"} filters the records."""
    split = "train" if train else "test"
    ds = HeadPoseSequenceDataset(
        motion_path=os.path.join(
            data_root_folder, "gimo_egoego_processed", f"{split}_gimo_motion.p"
        ),
        slam_res_folder=os.path.join(data_root_folder, "gimo", "droid_slam_res"),
        window=window,
        train=train,
        for_eval=for_eval,
        min_len=window,
    )
    split_json = split_json or os.path.join(
        data_root_folder, "gimo_egoego_processed", "train_test_split.json"
    )
    if os.path.exists(split_json):
        import json

        with open(split_json) as f:
            split_map = json.load(f)
        wanted = "train" if train else "test"
        kept = {
            i: rec
            for i, rec in enumerate(
                r for r in ds.data.values()
                if split_map.get(r["seq_name"], wanted) == wanted
            )
        }
        ds.data = kept
    return ds


def RealWorldHeadPoseDataset(data_root_folder: str, train: bool, window: int = 120,
                             for_eval: bool = False,
                             eval_on_kinpoly_mocap: bool = False) -> HeadPoseSequenceDataset:
    if eval_on_kinpoly_mocap:
        motion_path = os.path.join(data_root_folder, "kinpoly-mocap", "mocap_annotations.p")
    else:
        split = "train" if train else "test"
        motion_path = os.path.join(
            data_root_folder, "kinpoly_egoego_processed", f"{split}_kinpoly_motion.p"
        )
    return HeadPoseSequenceDataset(
        motion_path=motion_path,
        slam_res_folder=os.path.join(data_root_folder, "kinpoly", "droid_slam_res"),
        window=window,
        train=train,
        for_eval=for_eval,
        min_len=window,
    )
