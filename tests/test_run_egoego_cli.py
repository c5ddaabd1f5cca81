"""End-to-end CLI test of the demo driver (run_egoego) on the REAL bundled
reference fixture (test_data/ares DROID-SLAM result + demo record), with
random-init weights and a smoke-sized DDPM schedule."""

import os

import numpy as np
import pytest

FIXTURE = "/root/reference/test_data/ares"
STATS = os.path.join(FIXTURE, "cano_min_max_mean_std_data_window_120.p")


@pytest.mark.skipif(not os.path.exists(STATS), reason="reference fixture absent")
def test_run_egoego_cli_demo_fixture(tmp_path):
    from egoego_release_tpu.eval.run_egoego import parse_opt, run

    rng = np.random.RandomState(0)
    rest_path = tmp_path / "rest.npy"
    np.save(rest_path, np.concatenate(
        [np.zeros((1, 3)), rng.uniform(-0.2, 0.2, (21, 3))]
    ).astype(np.float32))

    out_dir = tmp_path / "demo_out"
    opt = parse_opt([
        "--data_root_folder", FIXTURE,
        "--stats_path", STATS,
        "--rest_offsets", str(rest_path),
        "--window", "16", "--timesteps", "8",
        "--save_html_vis",
        "--out_dir", str(out_dir),
    ])
    run(opt)

    npzs = [f for f in os.listdir(out_dir) if f.endswith(".npz")]
    assert npzs, "no output npz written"
    out = np.load(os.path.join(out_dir, npzs[0]))
    for k in ("local_aa", "root_pos", "head_pose", "pred_jpos"):
        assert np.isfinite(out[k]).all(), k
    assert out["local_aa"].shape[1:] == (22, 3)
    html = npzs[0].replace(".npz", ".html")
    assert os.path.exists(os.path.join(out_dir, html))
