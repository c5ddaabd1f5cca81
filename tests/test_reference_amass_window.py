"""Golden parity of the AMASS window-processing pipeline against the
reference's OWN `AMASSDataset` class.

`cal_normalize_data_input` / `process_window_data` /
`extract_min_max_mean_std_from_data` / `__getitem__`
(egoego/data/amass_diffusion_dataset.py:316-538) are run on a synthetic
motion dict via tests/reforacle (parents patched to constants, `.cuda()`
identity-patched — torch here is CPU-only), and
`egoego_release_tpu.data.amass.AMASSWindowDataset` must reproduce windows,
canonicalization, min/max stats, and normalized+padded batch items.
"""

from types import SimpleNamespace

import joblib
import numpy as np
import pytest
import torch
import jax.numpy as jnp

import reforacle

from egoego_release_tpu.data.amass import AMASSWindowDataset

WINDOW = 36


def _synthetic_motion_dict(seed=0):
    """Two sequences: 80 frames (3 full windows, 2 skipped short segments)
    and 70 frames (2 full + 1 ragged 34-frame window exercising the
    reference's end_t_idx=num_steps clamp at :330-331 and getitem padding)."""
    rng = np.random.RandomState(seed)
    data = {}
    for i, t in enumerate((80, 70)):
        steps = rng.uniform(-0.04, 0.04, (t, 3)).astype(np.float32)
        data[i] = {
            "seq_name": f"synthetic_seq{i}",
            "trans": np.cumsum(steps, axis=0) + np.asarray([0.3, -0.2, 0.9], np.float32),
            "root_orient": rng.uniform(-0.8, 0.8, (t, 3)).astype(np.float32),
            "body_pose": rng.uniform(-0.5, 0.5, (t, 63)).astype(np.float32),
        }
    return data


def _ref_dataset(monkeypatch, data, rest_offsets, canonicalize):
    ds_mod = reforacle.patch_smpl_parents()
    # process_window_data calls .cuda() explicitly (:410-412); identity-patch
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    ref = ds_mod.AMASSDataset.__new__(ds_mod.AMASSDataset)
    ref.window = WINDOW
    ref.opt = SimpleNamespace(canonicalize_init_head=canonicalize)
    ref.rest_human_offsets = torch.from_numpy(rest_offsets).float()[None]
    ref.data_dict = data
    ref.cal_normalize_data_input()
    return ref


@pytest.mark.parametrize("canonicalize", [True, False])
def test_reference_amass_window_parity(monkeypatch, tmp_path, canonicalize):
    data = _synthetic_motion_dict()
    rng = np.random.RandomState(3)
    rest_offsets = rng.uniform(-0.25, 0.25, (22, 3)).astype(np.float32)
    rest_offsets[0] = 0.0

    ref = _ref_dataset(monkeypatch, data, rest_offsets, canonicalize)

    path = str(tmp_path / "motion.p")
    joblib.dump(data, path)
    ours = AMASSWindowDataset(
        path, rest_offsets, window=WINDOW, canonicalize_init_head=canonicalize
    )

    # same windowing decisions (stride window//2, skip <30, ragged clamp)
    assert len(ours) == len(ref.window_data_dict) == 6
    for i in range(len(ours)):
        w, rw = ours.windows[i], ref.window_data_dict[i]
        assert w["seq_name"] == rw["seq_name"]
        assert w["start_t_idx"] == rw["start_t_idx"]
        assert w["end_t_idx"] == rw["end_t_idx"]
        np.testing.assert_allclose(w["global_jpos"], rw["global_jpos"], atol=2e-5)
        np.testing.assert_allclose(w["global_jvel"], rw["global_jvel"], atol=2e-5)
        np.testing.assert_allclose(w["global_rot_6d"], rw["global_rot_6d"], atol=2e-5)

    # min/max stats bit-for-bit against the reference's own extraction
    ref_stats = ref.extract_min_max_mean_std_from_data()
    ours_stats = ours._stats_dict()
    for k in ("global_jpos_min", "global_jpos_max", "global_jvel_min", "global_jvel_max"):
        np.testing.assert_allclose(ours_stats[k], ref_stats[k], atol=2e-5)

    # __getitem__: normalization + ragged-window zero padding (:515-538)
    ref.global_jpos_min = torch.from_numpy(ref_stats["global_jpos_min"]).float().reshape(22, 3)[None]
    ref.global_jpos_max = torch.from_numpy(ref_stats["global_jpos_max"]).float().reshape(22, 3)[None]
    ours.stats = ours._compute_stats()  # from the same windows
    for i in range(len(ours)):
        ref_item = ref[i]
        our_item = ours[i]
        assert our_item["seq_len"] == int(ref_item["seq_len"])
        assert our_item["motion"].shape == tuple(ref_item["motion"].shape) == (WINDOW, 198)
        np.testing.assert_allclose(
            our_item["motion"], ref_item["motion"].numpy(), atol=3e-5
        )
    # the last window of seq1 really is ragged (padding exercised)
    assert ours[len(ours) - 1]["seq_len"] == 34


def test_reference_amass_window_stats_roundtrip(monkeypatch, tmp_path):
    """Stats written by the dataset load back into the same NormStats the
    reference's stats pickle produces (formats.load_norm_stats path)."""
    from egoego_release_tpu.data.formats import load_norm_stats

    data = _synthetic_motion_dict(seed=5)
    rng = np.random.RandomState(4)
    rest_offsets = rng.uniform(-0.25, 0.25, (22, 3)).astype(np.float32)
    rest_offsets[0] = 0.0
    path = str(tmp_path / "motion.p")
    joblib.dump(data, path)
    stats_path = str(tmp_path / "stats.p")
    ours = AMASSWindowDataset(path, rest_offsets, window=WINDOW, stats_path=stats_path)
    loaded = load_norm_stats(stats_path)
    np.testing.assert_allclose(
        np.asarray(loaded.jpos_min), np.asarray(ours.stats.jpos_min), atol=0
    )
    np.testing.assert_allclose(
        np.asarray(loaded.jpos_max), np.asarray(ours.stats.jpos_max), atol=0
    )
