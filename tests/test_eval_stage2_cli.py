"""End-to-end CLI test of the stage-2 eval (eval_stage2) batched path: the
pipelined chunk driver + dp x tp sharding over the virtual mesh, through the
real argparse surface (the manual verify-skill drive, pinned)."""

import json
import os

import joblib
import numpy as np
import pytest


@pytest.fixture()
def amass_fixture(tmp_path):
    rng = np.random.RandomState(0)
    data = {}
    for i in range(6):
        t = 24
        data[i] = {
            "seq_name": f"Transitions_mocap-seq{i}",
            "trans": np.cumsum(rng.randn(t, 3).astype(np.float32) * 0.02, 0),
            "root_orient": (rng.randn(t, 3) * 0.2).astype(np.float32),
            "body_pose": (rng.randn(t, 63) * 0.2).astype(np.float32),
        }
    # one non-test-subset sequence that --filter (default) must drop
    data[len(data)] = {
        "seq_name": "CMU-train-seq",
        "trans": np.zeros((24, 3), np.float32),
        "root_orient": np.zeros((24, 3), np.float32),
        "body_pose": np.zeros((24, 63), np.float32),
    }
    data_path = tmp_path / "amass_test.p"
    joblib.dump(data, data_path)

    rest_path = tmp_path / "rest.npy"
    np.save(rest_path, np.concatenate(
        [np.zeros((1, 3)), rng.uniform(-0.2, 0.2, (21, 3))]
    ).astype(np.float32))
    return {
        "data_path": str(data_path),
        "rest_path": str(rest_path),
        "stats_path": "/root/reference/test_data/ares/"
                      "cano_min_max_mean_std_data_window_120.p",
    }


def test_eval_stage2_cli_batched_sharded(amass_fixture, tmp_path):
    from egoego_release_tpu.eval.eval_stage2 import parse_opt, run

    out_dir = str(tmp_path / "out")
    opt = parse_opt([
        "--test_data_path", amass_fixture["data_path"],
        "--stats_path", amass_fixture["stats_path"],
        "--rest_offsets", amass_fixture["rest_path"],
        "--window", "16", "--timesteps", "8",
        "--batch_seqs", "4",       # 6 eligible -> chunks of 4 + 2 (ragged)
        "--sample_bs", "2",        # best-of-2 candidates per sequence
        "--dp", "4", "--tp", "2",
        "--out_dir", out_dir,
    ])
    result = run(opt)

    assert result["num_seqs"] == 6  # the CMU- sequence was filtered out
    for name, entry in result["per_seq"].items():
        assert name.startswith("Transitions_mocap")
        for key in ("mpjpe", "head_dist", "root_dist"):
            assert np.isfinite(entry[key]), (name, key)
    res = json.load(open(os.path.join(
        out_dir, "stage2_diffusion_model_res_on_amass_test.json")))
    assert res["num_seqs"] == 6


def test_eval_stage2_cli_batched_empty(amass_fixture, tmp_path):
    """No eligible sequences (window longer than every sequence) must write
    the empty summary, not crash the pipelined driver (review finding:
    pending_chain unpack on empty batches)."""
    from egoego_release_tpu.eval.eval_stage2 import parse_opt, run

    opt = parse_opt([
        "--test_data_path", amass_fixture["data_path"],
        "--stats_path", amass_fixture["stats_path"],
        "--rest_offsets", amass_fixture["rest_path"],
        "--window", "500", "--timesteps", "8", "--batch_seqs", "4",
        "--out_dir", str(tmp_path / "out_empty"),
    ])
    result = run(opt)
    assert result["num_seqs"] == 0 and result["per_seq"] == {}
