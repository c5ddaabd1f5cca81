"""StateAR dataset + kinpoly YAML config."""

import joblib
import numpy as np

from egoego_release_tpu.data.kinpoly import StateARDataset
from egoego_release_tpu.utils.config import KinpolyConfig


def make_expert_pickle(tmp_path, t=40):
    rng = np.random.RandomState(0)
    rec = {
        "qpos": rng.randn(t, 76).astype(np.float32),
        "qvel": rng.randn(t - 1, 75).astype(np.float32),
        "head_pose": rng.randn(t, 7).astype(np.float32),
        "head_vels": rng.randn(t, 6).astype(np.float32),
        "obj_pose": rng.randn(t, 7).astype(np.float32),
        "obj_head_relative_poses": rng.randn(t, 7).astype(np.float32),
        "seq_name": "subj-take1",
    }
    path = str(tmp_path / "mocap_annotations.p")
    joblib.dump({"subj-take1": rec}, path)
    return path


def test_statear_dataset_windows(tmp_path):
    path = make_expert_pickle(tmp_path)
    ds = StateARDataset(path, fr_num=40, train=False)
    assert len(ds) == 1
    item = ds.sample_seq(0)
    assert item["qpos"].shape == (40, 76)
    assert item["qvel"].shape == (40, 75)  # padded duplicate last row
    np.testing.assert_array_equal(item["qvel"][-1], item["qvel"][-2])
    batch = next(ds.batch_iterator(2))
    assert batch["head_pose"].shape == (2, 40, 7)


def test_kinpoly_config(tmp_path):
    import yaml

    d = {"model_specs": {"rnn_hdim": 512, "mlp_hsize": [1024, 512]},
         "use_of": False, "fr_num": 90}
    path = str(tmp_path / "exp.yml")
    yaml.safe_dump(d, open(path, "w"))
    cfg = KinpolyConfig(path)
    assert cfg.model_specs["rnn_hdim"] == 512
    assert cfg.fr_num == 90
    assert cfg.get("missing", 7) == 7
