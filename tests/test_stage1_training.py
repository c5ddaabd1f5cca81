"""Stage-1 trainers + GravityNet dataset tests."""

import numpy as np
import jax
import jax.numpy as jnp

from egoego_release_tpu.data.amass_headpose import AMASSHeadPoseDataset, augment_head_traj
from egoego_release_tpu.models.gravitynet import HeadNormalFormer
from egoego_release_tpu.models.headnet import HeadFormer
from egoego_release_tpu.training.trainer_stage1 import (
    Stage1Trainer,
    gravitynet_loss_fn,
    headnet_loss_fn,
    make_optimizer,
)


def synth_head_data(n_seqs=4, t=40, seed=0):
    rng = np.random.RandomState(seed)
    data = {}
    names = ["CMU-a", "KIT-b", "HumanEva-c", "ACCAD-d"]
    for i in range(n_seqs):
        q = rng.randn(t, 4).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        pose = np.concatenate([np.cumsum(rng.randn(t, 3) * 0.02, 0), q], -1)
        data[names[i]] = {"head_pose": pose.astype(np.float32)}
    return data


def test_augmentation_supervision_consistency():
    rng = np.random.RandomState(1)
    data = synth_head_data()
    pose = data["CMU-a"]["head_pose"]
    aug = augment_head_traj(pose, rng)
    # recover rotation undoes the augmentation rotation on the floor normal
    n = aug["aligned_rot_mat"] @ aug["floor_normal"]
    np.testing.assert_allclose(n, [0, 0, 1], atol=1e-5)
    # scale: augmented diffs / original diffs == 1/aligned_scale
    d_aug = np.linalg.norm(np.diff(aug["head_trans"], axis=0), axis=1)
    d_ori = np.linalg.norm(np.diff(pose[:, :3], axis=0), axis=1)
    ratio = d_aug / np.maximum(d_ori, 1e-9)
    np.testing.assert_allclose(ratio, 1.0 / aug["aligned_scale"], rtol=1e-3)


def test_gravitynet_dataset_split_and_batches():
    data = synth_head_data()
    train = AMASSHeadPoseDataset(data, train=True, window=16)
    val = AMASSHeadPoseDataset(data, train=False, window=16)
    assert len(train) == 3 and len(val) == 1  # HumanEva goes to val
    item = train[0]
    assert item["ori_head_pose"].shape == (17, 7)
    assert item["head_rot_mat"].shape == (17, 3, 3)
    batch = next(train.batch_iterator(2))
    assert batch["head_trans"].shape == (2, 17, 3)


def test_gravitynet_training_reduces_loss():
    data = synth_head_data(seed=2)
    ds = AMASSHeadPoseDataset(data, train=True, window=16)
    model = HeadNormalFormer(d_model=32, n_layers=1, n_head=2, d_k=16, d_v=16,
                             window=16, mlp_hsize=(16,))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 18)), jnp.ones((1, 16)))
    trainer = Stage1Trainer(model, gravitynet_loss_fn, make_optimizer(1e-3, 2000))
    state = trainer.init_state(params)
    batch = next(ds.batch_iterator(2))  # fixed batch: the model must overfit it
    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(40):
        key, sk = jax.random.split(key)
        state, loss, _ = trainer.train_step(state, batch, sk)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_headnet_training_step_runs():
    model = HeadFormer(d_model=32, n_layers=1, n_head=2, d_k=16, d_v=16,
                       window=8, cnn_fdim=24, mlp_hsize=(16,))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 24)), jnp.ones((1, 8)))
    trainer = Stage1Trainer(model, headnet_loss_fn, make_optimizer(1e-4, 1000))
    state = trainer.init_state(params)
    rng = np.random.RandomState(3)
    q = rng.randn(2, 9, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    batch = {
        "of": rng.randn(2, 8, 24).astype(np.float32),
        "head_pose": np.concatenate([rng.randn(2, 9, 3).astype(np.float32), q], -1),
        "head_vels": rng.randn(2, 8, 6).astype(np.float32) * 0.1,
        "seq_len": np.asarray([8, 8], np.int32),
    }
    state, loss, aux = trainer.train_step(state, batch, jax.random.PRNGKey(4))
    assert np.isfinite(float(loss))
    assert set(aux) == {"orient", "va", "dist"}


# ---------------------------------------------------------------------------
# raw-flow (input_of_feats=False) HeadNet training path
# ---------------------------------------------------------------------------

def test_augment_flow_properties():
    from egoego_release_tpu.data.headpose import augment_flow

    rng = np.random.RandomState(0)
    flow = rng.randn(240, 240, 2).astype(np.float32)
    out1 = augment_flow(flow, np.random.RandomState(1))
    out2 = augment_flow(flow, np.random.RandomState(2))
    assert out1.shape == (224, 224, 2)
    assert np.isfinite(out1).all() and np.isfinite(out2).all()
    # different rng -> different crop/noise
    assert np.abs(out1 - out2).max() > 1e-3
    # noise is small: augmented values stay in a sane envelope
    assert np.abs(out1).max() < np.abs(flow).max() + 10.0


def test_raw_flow_dataset_pipeline(tmp_path):
    """HeadPoseSequenceDataset(input_of_feats=False) loads RAW flow frames
    and applies augment_flow when training (ares_headpose_dataset.py:149-158):
    augmentation changes samples but preserves shapes/finiteness."""
    import joblib

    from egoego_release_tpu.data.headpose import HeadPoseSequenceDataset

    rng = np.random.RandomState(0)
    t = 6
    flow_files = []
    for i in range(t):
        f = tmp_path / f"flow_{i}.npy"
        np.save(f, rng.randn(240, 240, 2).astype(np.float32))
        flow_files.append(str(f))
    rec = {
        "seq_name": "synthetic",
        "head_qpos": np.concatenate(
            [rng.randn(t + 1, 3), np.tile([1.0, 0, 0, 0], (t + 1, 1))], axis=-1
        ).astype(np.float32),
        "head_vels": rng.randn(t + 1, 6).astype(np.float32),
        "of_files": flow_files,
    }
    motion_path = tmp_path / "motion.p"
    joblib.dump({0: rec}, motion_path)

    ds = HeadPoseSequenceDataset(
        str(motion_path), window=3, train=True, for_eval=False,
        input_of_feats=False, augment=True, seed=0,
    )
    a = ds[0]["of"]
    b = ds[0]["of"]
    assert a.shape == (3, 224, 224, 2) and b.shape == (3, 224, 224, 2)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert np.abs(a - b).max() > 1e-3  # augmentation (and crop) varies

    # eval mode: whole sequence, no augmentation, original resolution
    ds_eval = HeadPoseSequenceDataset(
        str(motion_path), window=3, train=False, for_eval=True,
        input_of_feats=False,
    )
    e1 = ds_eval[0]["of"]
    e2 = ds_eval[0]["of"]
    assert e1.shape == (t, 240, 240, 2)
    np.testing.assert_array_equal(e1, e2)


def test_raw_flow_training_step():
    """One HeadFormerWithCNN training step through headnet_cnn_loss_fn:
    finite loss, parameters move (augment_flow finally has a trainer)."""
    from egoego_release_tpu.models.headnet import HeadFormer, HeadFormerWithCNN
    from egoego_release_tpu.training.trainer_stage1 import (
        Stage1Trainer,
        freeze_subtrees,
        headnet_cnn_loss_fn,
        make_optimizer,
    )

    hf = HeadFormer(d_model=16, n_layers=1, n_head=2, d_k=8, d_v=8, window=3,
                    cnn_fdim=32, mlp_hsize=(8,))
    model = HeadFormerWithCNN(headformer=hf, freeze_cnn=True)
    rng = np.random.RandomState(0)
    flow = rng.randn(2, 3, 32, 32, 2).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(flow), jnp.ones((2, 3)))

    batch = {
        "of": flow,
        "head_pose": np.concatenate(
            [rng.randn(2, 4, 3), np.tile([1.0, 0, 0, 0], (2, 4, 1))], axis=-1
        ).astype(np.float32),
        "head_vels": rng.randn(2, 3, 6).astype(np.float32),
        "seq_len": np.asarray([3, 3], np.int32),
    }
    trainer = Stage1Trainer(
        model, headnet_cnn_loss_fn,
        freeze_subtrees(make_optimizer(1e-3, 1000), ("cnn", "batch_stats")),
    )
    state = trainer.init_state(params)
    # copy BEFORE the step: train_step donates the input state's buffers
    before = np.asarray(state.params["params"]["headformer"]["action_va_fc"]["kernel"])
    cnn_before = np.asarray(state.params["params"]["cnn"]["conv1"]["kernel"])
    new_state, loss, aux = trainer.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    # transformer params must move; frozen CNN params must NOT
    after = np.asarray(new_state.params["params"]["headformer"]["action_va_fc"]["kernel"])
    assert np.abs(before - after).max() > 0
    cnn_after = np.asarray(new_state.params["params"]["cnn"]["conv1"]["kernel"])
    np.testing.assert_array_equal(cnn_before, cnn_after)
