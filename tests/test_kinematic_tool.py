"""Contract tests for the kinematic-capability tool's cross-take expert
conversion (tools/train_kinematic_tracking.py::neutral_expert_record).

The standing_neutral.pkl asset is kinpoly's reset-pose motion
(kinpoly/relive/envs/humanoid_ar_v1.py loads it for episode resets); the
tool converts it into a second expert take for the statear held-out-take
protocol (kinpoly/relive/data_loaders/statear_smpl_dataset.py:31).  The
oracle here is the pickle itself: frame count, the constant-root contract
(the pickle carries no translation track), and the expert-record schema
bc_pretrain/eval_tracking consume.
"""

import importlib.util
import os

import joblib
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NEUTRAL = "/root/reference/kinpoly/sample_data/standing_neutral.pkl"


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "train_kinematic_tracking",
        os.path.join(REPO, "tools", "train_kinematic_tracking.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(not os.path.exists(NEUTRAL),
                    reason="reference sample data not present")
def test_neutral_expert_record_schema_and_constant_root():
    tool = _load_tool()
    rng = np.random.RandomState(0)
    rest = np.concatenate(
        [np.zeros((1, 3)), rng.uniform(-0.2, 0.2, (21, 3))]
    ).astype(np.float32)

    rec = tool.neutral_expert_record(rest)
    raw = joblib.load(NEUTRAL)
    t = np.asarray(raw["pose_aa"]).shape[0]

    qpos = np.asarray(rec["qpos"])
    assert qpos.shape == (t, 76)
    assert np.isfinite(qpos).all()
    # no translation track in the pickle -> root position held at the rest
    # qpos's root for every frame (the tool's documented contract)
    np.testing.assert_allclose(
        qpos[:, :3], np.tile(np.asarray(raw["qpos"][:3]), (t, 1)), atol=1e-6
    )
    # root quaternion stays unit-norm through the smpl_to_qpos codec
    np.testing.assert_allclose(
        np.linalg.norm(qpos[:, 3:7], axis=-1), 1.0, atol=1e-5
    )

    qvel = np.asarray(rec["qvel"])
    assert qvel.shape == (t - 1, 75)
    assert np.isfinite(qvel).all()
    # constant root position -> zero root linear velocity
    np.testing.assert_allclose(qvel[:, :3], 0.0, atol=1e-5)

    head = np.asarray(rec["head_pose"])
    assert head.shape == (t, 7)
    assert np.isfinite(head).all()
    np.testing.assert_allclose(
        np.linalg.norm(head[:, 3:7], axis=-1), 1.0, atol=1e-5
    )
    # the take's content is joint-space sway: the head must actually MOVE
    # relative to the (fixed) root, else the cross-take eval is degenerate
    assert np.ptp(head[:, :3], axis=0).max() > 1e-3

    assert rec["seq_name"] == "standing_neutral"
