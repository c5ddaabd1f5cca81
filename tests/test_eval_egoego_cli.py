"""End-to-end CLI test of the full-pipeline eval (eval_egoego) on a synthetic
kinpoly-mocap-layout fixture: stage 1 (HeadNet + GravityNet over real SLAM
attachment) -> qpos GT decode + FK + floor snap -> stage-2 sliding-window
sampling -> metric suite -> JSON + HTML vis."""

import json
import os

import joblib
import numpy as np
import pytest


def _make_kinpoly_fixture(tmp_path, n_seqs=1):
    rng = np.random.RandomState(0)
    t = 20
    root = tmp_path / "root"

    feat_dir = root / "feats"
    feat_dir.mkdir(parents=True)
    slam_dir = root / "kinpoly" / "droid_slam_res" / "subj"
    slam_dir.mkdir(parents=True)
    mocap_dir = root / "kinpoly-mocap"
    mocap_dir.mkdir()

    recs, gt = {}, {}
    seq_names = []
    for si in range(n_seqs):
        seq_name = f"subj-take{si + 1}"
        seq_names.append(seq_name)

        of_files = []
        for i in range(t):
            f = feat_dir / f"raft_of_feats_{seq_name}_{i}.npy"
            np.save(f, rng.randn(512).astype(np.float32))
            of_files.append(str(f))

        head_qpos = np.concatenate(
            [np.cumsum(rng.uniform(-0.02, 0.02, (t + 1, 3)), 0) + [0, 0, 1.5],
             np.tile([1.0, 0, 0, 0], (t + 1, 1))], -1
        ).astype(np.float32)
        recs[si] = {
            "seq_name": seq_name,
            "head_qpos": head_qpos,
            "head_vels": rng.randn(t + 1, 6).astype(np.float32) * 0.01,
            "of_files": of_files,
        }

        slam = np.concatenate(
            [np.cumsum(rng.uniform(-0.02, 0.02, (t + 1, 3)), 0),
             np.tile([1.0, 0, 0, 0], (t + 1, 1))], -1
        ).astype(np.float32)
        np.save(slam_dir / f"take{si + 1}.npy", slam)

        qpos = np.zeros((t, 76), np.float32)
        qpos[:, 2] = 0.92
        qpos[:, 3:7] = [0.7071, 0.7071, 0, 0]
        qpos[:, :2] = np.cumsum(rng.uniform(-0.01, 0.01, (t, 2)), 0)
        qpos[:, 7:] = rng.uniform(-0.2, 0.2, 69)
        gt[seq_name] = {"qpos": qpos, "head_pose": head_qpos[:t]}

    joblib.dump(recs, mocap_dir / "mocap_annotations.p")
    gt_path = tmp_path / "full_body_gt.p"
    joblib.dump(gt, gt_path)

    rest = np.concatenate(
        [np.zeros((1, 3)), rng.uniform(-0.2, 0.2, (21, 3))]
    ).astype(np.float32)
    rest_path = tmp_path / "rest.npy"
    np.save(rest_path, rest)

    return {
        "root": str(root),
        "gt_path": str(gt_path),
        "rest_path": str(rest_path),
        "stats_path": "/root/reference/test_data/ares/"
                      "cano_min_max_mean_std_data_window_120.p",
        "seq_name": seq_names[0],
        "seq_names": seq_names,
    }


@pytest.fixture()
def kinpoly_fixture(tmp_path):
    return _make_kinpoly_fixture(tmp_path, n_seqs=1)


def test_eval_egoego_cli_end_to_end(kinpoly_fixture, tmp_path):
    from egoego_release_tpu.eval.eval_egoego import parse_opt, run

    out_dir = str(tmp_path / "out")
    opt = parse_opt([
        "--data_root_folder", kinpoly_fixture["root"],
        "--full_body_gt_path", kinpoly_fixture["gt_path"],
        "--stats_path", kinpoly_fixture["stats_path"],
        "--rest_offsets", kinpoly_fixture["rest_path"],
        "--window", "16", "--headnet_window", "8", "--timesteps", "8",
        "--sample_bs", "1", "--save_html_vis", "--out_dir", out_dir,
    ])
    result = run(opt)

    assert result["num_seqs"] == 1
    entry = result["per_seq"][kinpoly_fixture["seq_name"]]
    for key in ("mpjpe", "head_dist", "root_dist", "s1_e_head", "s1_t_head"):
        assert np.isfinite(entry[key]), key

    res_json = os.path.join(out_dir, "egoego_pipeline_res_on_kinpoly.json")
    assert json.load(open(res_json))["num_seqs"] == 1
    html = os.path.join(out_dir, kinpoly_fixture["seq_name"] + ".html")
    assert os.path.exists(html)
    assert "<canvas" in open(html).read()


def test_eval_egoego_gt_head_debug_path(kinpoly_fixture, tmp_path):
    """--use_gt_head_pose isolates stage-2 error (eval_egoego.py:244-253):
    the GT-head-conditioned run must report (near-)zero stage-1 head error."""
    from egoego_release_tpu.eval.eval_egoego import parse_opt, run

    opt = parse_opt([
        "--data_root_folder", kinpoly_fixture["root"],
        "--full_body_gt_path", kinpoly_fixture["gt_path"],
        "--stats_path", kinpoly_fixture["stats_path"],
        "--rest_offsets", kinpoly_fixture["rest_path"],
        "--window", "16", "--headnet_window", "8", "--timesteps", "8",
        "--use_gt_head_pose", "--out_dir", str(tmp_path / "out_gt"),
    ])
    result = run(opt)
    entry = result["per_seq"][kinpoly_fixture["seq_name"]]
    assert entry["s1_t_head"] < 1e-3  # GT head in, so stage-1 trans err ~ 0


def test_eval_egoego_cli_batched_buckets(tmp_path):
    """--batch_seqs: same-length sequences bucket into pipelined chains
    (best-of-2 per sequence), reporting the same entry schema as the
    per-sequence path."""
    from egoego_release_tpu.eval.eval_egoego import parse_opt, run

    fx = _make_kinpoly_fixture(tmp_path, n_seqs=3)
    opt = parse_opt([
        "--data_root_folder", fx["root"],
        "--full_body_gt_path", fx["gt_path"],
        "--stats_path", fx["stats_path"],
        "--rest_offsets", fx["rest_path"],
        "--window", "16", "--headnet_window", "8", "--timesteps", "8",
        "--batch_seqs", "2", "--sample_bs", "2",
        "--out_dir", str(tmp_path / "out_batched"),
    ])
    result = run(opt)
    assert result["num_seqs"] == 3
    assert set(result["per_seq"]) == set(fx["seq_names"])
    for entry in result["per_seq"].values():
        for key in ("mpjpe", "head_dist", "root_dist",
                    "s1_e_head", "s1_t_head"):
            assert np.isfinite(entry[key]), key
