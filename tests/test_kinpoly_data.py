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


# ---------------------------------------------------------------------------
# statear experiment-matrix sweep (eval_pose_all.py-style multi-config eval)
# ---------------------------------------------------------------------------

def _make_sweep_fixture(tmp_path, takes=("s1-take1", "s1-take2", "s2-take1")):
    """Expert pickle with several takes + a meta YAML + two statear YAMLs."""
    import yaml

    rng = np.random.RandomState(1)
    t = 24
    data = {}
    for name in takes:
        qpos = np.zeros((t, 76), np.float32)
        qpos[:, 3] = 1.0
        qpos[:, :3] = np.cumsum(rng.uniform(-0.01, 0.01, (t, 3)), 0)
        qpos[:, 7:] = rng.uniform(-0.2, 0.2, (t, 69))
        data[name] = {
            "qpos": qpos,
            "qvel": rng.randn(t - 1, 75).astype(np.float32) * 0.01,
            "head_pose": np.concatenate(
                [rng.randn(t, 3) * 0.1, np.tile([1.0, 0, 0, 0], (t, 1))], -1
            ).astype(np.float32),
            "head_vels": rng.randn(t, 6).astype(np.float32) * 0.01,
            "obj_pose": rng.randn(t, 7).astype(np.float32),
            "obj_head_relative_poses": rng.randn(t, 7).astype(np.float32),
            "seq_name": name,
        }
    expert_path = str(tmp_path / "mocap_annotations.p")
    joblib.dump(data, expert_path)

    meta_dir = tmp_path / "meta"
    meta_dir.mkdir()
    meta = {
        "train": [takes[0]],
        "test": list(takes[1:]),
        "action_type": {name: "sit" for name in takes},
        "object": {"sit": "chair"},
    }
    yaml.safe_dump(meta, open(meta_dir / "mocap_meta.yml", "w"))

    cfg_paths = []
    for i, fr in enumerate((16, 20)):
        d = {
            "dataset_path": str(tmp_path),
            "meta_id": "mocap_meta",
            "data_file": "mocap_annotations",
            "fr_num": fr,
            "model_specs": {"rnn_hdim": 32},
            "policy_specs": {"reward_id": "dynamic_supervision_v3"},
        }
        path = str(tmp_path / f"exp_v{i}.yml")
        yaml.safe_dump(d, open(path, "w"))
        cfg_paths.append(path)
    return expert_path, cfg_paths


def test_kinpoly_config_meta_takes(tmp_path):
    expert_path, cfg_paths = _make_sweep_fixture(tmp_path)
    cfg = KinpolyConfig(cfg_paths[0])
    meta = cfg.load_meta(data_dir=str(tmp_path))
    takes = KinpolyConfig.resolve_takes(meta)
    assert [t["take"] for t in takes["test"]] == ["s1-take2", "s2-take1"]
    assert takes["test"][0]["action"] == "sit"
    assert cfg.data_file() == "mocap_annotations"
    assert cfg.policy_specs["reward_id"] == "dynamic_supervision_v3"


def test_statear_dataset_take_filter(tmp_path):
    expert_path, _ = _make_sweep_fixture(tmp_path)
    ds = StateARDataset(expert_path, fr_num=16, train=False,
                        takes=["s1-take2", "s2-take1"])
    assert sorted(ds.names) == ["s1-take2", "s2-take1"]


def test_eval_sweep_runs_both_configs(tmp_path):
    """Sweep over two statear YAMLs evaluates only the meta test takes per
    config and emits mean metrics per config (eval_pose_all.py:115-205)."""
    from egoego_release_tpu.eval.eval_sweep import eval_config

    expert_path, cfg_paths = _make_sweep_fixture(tmp_path)
    rng = np.random.RandomState(2)
    rest = rng.uniform(-0.2, 0.2, (22, 3)).astype(np.float32)
    rest[0] = 0.0

    results = {}
    for cfg_path in cfg_paths:
        res = eval_config(
            cfg_path, "{data_dir}/mocap_annotations.p", rest,
            data_dir=str(tmp_path), split="test", rnn_hdim=32, mlp_hsize=(16,),
        )
        results[res["config"]] = res
        assert res["num_takes"] == 2
        assert sorted(res["per_take"]) == ["s1-take2", "s2-take1"]
        for md in res["per_take"].values():
            assert md.get("diverged") == 1.0 or np.isfinite(md["mpjpe"])
    assert sorted(results) == ["exp_v0", "exp_v1"]


def test_all_reference_statear_yamls_load():
    """Config-surface compatibility: every one of the reference's 68 bundled
    statear experiment YAMLs loads through KinpolyConfig with the groups the
    trainers/eval read (model_specs / policy_specs / fr_num / data files)."""
    import glob

    paths = sorted(glob.glob("/root/reference/kinpoly/config/statear/*.yml"))
    assert len(paths) == 68
    for path in paths:
        cfg = KinpolyConfig(path)
        assert isinstance(cfg.model_specs, dict)
        assert isinstance(cfg.policy_specs, dict)
        assert cfg.get("fr_num", 90) > 0
        assert isinstance(cfg.data_file(), str)
        assert isinstance(cfg.data_file(wild=True), str)
        # the agent-training path reads these from policy_specs when present
        ps = cfg.policy_specs
        if "policy_hsize" in ps:
            assert all(int(h) > 0 for h in ps["policy_hsize"])
