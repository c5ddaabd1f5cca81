"""Data layer vs. the bundled reference fixture (test_data/ares)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from egoego_release_tpu.data.amass import AMASSWindowDataset
from egoego_release_tpu.data.formats import load_norm_stats
from egoego_release_tpu.data.headpose import ARESDemoDataset

FIXTURE = "/root/reference/test_data/ares"

needs_fixture = pytest.mark.skipif(
    not os.path.exists(os.path.join(FIXTURE, "demo_ares_data.p")),
    reason="reference demo fixture not available",
)


@needs_fixture
def test_demo_dataset_loads_fixture():
    ds = ARESDemoDataset(FIXTURE)
    assert len(ds) == 1
    q = ds[0]
    assert q["head_pose"].shape == (140, 7)
    assert q["head_vels"].shape == (139, 6)
    assert q["of"].shape == (139, 512)
    assert q["seq_len"] == 139
    # SLAM attached and first-frame aligned to GT head pose
    assert q["aligned_slam_trans"].shape == (140, 3)
    np.testing.assert_allclose(
        q["aligned_slam_trans"][0], q["head_pose"][0, :3], atol=1e-5
    )
    assert q["ori_slam_rot_mat"].shape == (140, 3, 3)


@needs_fixture
def test_norm_stats_fixture():
    stats = load_norm_stats(os.path.join(FIXTURE, "cano_min_max_mean_std_data_window_120.p"))
    assert stats.jpos_min.shape == (22, 3)
    assert np.all(np.asarray(stats.jpos_max) > np.asarray(stats.jpos_min))


@needs_fixture
def test_amass_window_dataset_on_demo_record():
    rng = np.random.RandomState(0)
    rest = rng.randn(22, 3).astype(np.float32) * 0.1
    rest[0] = 0.0
    ds = AMASSWindowDataset(
        os.path.join(FIXTURE, "demo_ares_data.p"),
        rest_offsets=rest,
        window=120,
        canonicalize_init_head=True,
    )
    # 140 frames, stride 60: windows [0:120), [60:140), [120:...] skipped (<30)
    assert len(ds) == 2
    item = ds[0]
    assert item["motion"].shape == (120, 198)
    assert item["seq_len"] == 120
    assert np.isfinite(item["motion"]).all()
    # normalized jpos within [-1, 1] (stats computed from this data)
    assert np.abs(item["motion"][:, :66]).max() <= 1.0 + 1e-5
    # second window is 80 frames + 40 zero padding (the last window start at
    # 120 gives only 20 frames and is skipped)
    item2 = ds[1]
    assert item2["seq_len"] == 80
    assert np.abs(item2["motion"][80:]).max() == 0.0

    # canonicalization: first-frame head xy is ~0
    jpos0 = item["motion"][0, :66].reshape(22, 3)
    # de-normalize
    mn, mx = np.asarray(ds.stats.jpos_min), np.asarray(ds.stats.jpos_max)
    de = (jpos0 + 1) * 0.5 * (mx - mn) + mn
    np.testing.assert_allclose(de[15, :2], 0.0, atol=1e-4)

    batch = next(ds.batch_iterator(2, jnp.asarray([0, 1], dtype=jnp.uint32)))
    assert batch["motion"].shape == (2, 120, 198)


def test_ares_extract_motion_windows(tmp_path):
    """The ARES extraction step (extract_amass_motion_for_ares.py:24-55):
    windows of processed-AMASS npz land in the rendered seq folders as
    ori_motion_seq.npz with per-frame keys sliced and scalars intact."""
    import pickle

    from egoego_release_tpu.preprocess.ares import extract_motion_for_renders

    rng = np.random.RandomState(0)
    t = 30
    amass_root = tmp_path / "amass"
    (amass_root / "CMU").mkdir(parents=True)
    np.savez(
        amass_root / "CMU" / "seq1.npz",
        fps=30, gender="male", floor_height=0.1,
        trans=rng.randn(t, 3).astype(np.float32),
        root_orient=rng.randn(t, 3).astype(np.float32),
        pose_body=rng.randn(t, 63).astype(np.float32),
        contacts=rng.randint(0, 2, (t, 22)).astype(np.float32),
        joints=rng.randn(t, 22, 3).astype(np.float32),
        betas=rng.randn(16).astype(np.float32),
    )
    index = {
        0: {"scene_name": "office_0", "seq_name": "seq1_w0",
            "path": "CMU/seq1.npz", "start_frame_idx": 5, "num_frames": 12},
        1: {"scene_name": "office_0", "seq_name": "seq1_w1",
            "path": "CMU/seq1.npz", "start_frame_idx": 10, "num_frames": 8},
    }
    idx_path = tmp_path / "index.pkl"
    with open(idx_path, "wb") as f:
        pickle.dump(index, f)

    render_root = tmp_path / "renders"
    n = extract_motion_for_renders(str(amass_root), str(render_root), str(idx_path))
    assert n == 2

    d = np.load(render_root / "office_0" / "seq1_w0" / "ori_motion_seq.npz")
    assert d["trans"].shape == (12, 3)
    assert d["pose_body"].shape == (12, 63)
    assert d["betas"].shape == (16,)  # scalar-ish keys pass through unsliced
    src = np.load(amass_root / "CMU" / "seq1.npz")
    np.testing.assert_array_equal(d["trans"], src["trans"][5:17])
