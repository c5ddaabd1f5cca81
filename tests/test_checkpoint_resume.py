"""Orbax checkpoint save/load roundtrip (preemption-safe exact resume)."""

import numpy as np
import jax

from egoego_release_tpu.diffusion.gaussian_diffusion import (
    CondGaussianDiffusion,
    DiffusionConfig,
)
from egoego_release_tpu.training.trainer_diffusion import (
    DiffusionTrainer,
    load_checkpoint,
    restore_state,
    save_checkpoint,
)

CFG = DiffusionConfig(
    d_feats=198, d_model=32, n_head=2, n_dec_layers=2, d_k=16, d_v=16,
    window=12, timesteps=8,
)


def test_save_load_exact_resume(tmp_path):
    diff = CondGaussianDiffusion(CFG)
    trainer = DiffusionTrainer(diff, lr=1e-3)
    state = trainer.init_state(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    batch = {
        "motion": rng.uniform(-1, 1, (4, 12, 198)).astype(np.float32),
        "seq_len": np.full((4,), 12, np.int32),
    }
    for i in range(3):
        state, _ = trainer.train_step(state, batch, jax.random.PRNGKey(i))

    path = save_checkpoint(str(tmp_path), state)
    ckpt = load_checkpoint(path)
    assert int(ckpt["step"]) == 3
    for a, b in zip(jax.tree.leaves(ckpt["model"]), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # uninterrupted continuation (this donates `state`)
    s_cont, l_cont = trainer.train_step(state, batch, jax.random.PRNGKey(9))
    # resumed continuation from disk: identical loss AND identical params
    resumed = restore_state(path, trainer)
    s_res, l_res = trainer.train_step(resumed, batch, jax.random.PRNGKey(9))
    np.testing.assert_allclose(float(l_cont), float(l_res), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s_cont.params), jax.tree.leaves(s_res.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    assert int(s_res.step) == 4


def test_train_diffusion_cli_auto_resume(tmp_path):
    """train_diffusion resumes from the newest model-<step> checkpoint in
    the run's weights dir (preemption recovery: SIGTERM checkpoints, the
    next launch with the same exp_name continues from the saved step)."""
    import joblib

    from egoego_release_tpu.training.train_diffusion import latest_checkpoint, run
    from egoego_release_tpu.utils.config import load_config

    rng = np.random.RandomState(0)
    t = 50
    rec = {
        "trans": np.cumsum(rng.uniform(-0.01, 0.01, (t, 3)), 0).astype(np.float32),
        "root_orient": (rng.uniform(-0.1, 0.1, (t, 3))).astype(np.float32),
        "body_pose": rng.uniform(-0.2, 0.2, (t, 63)).astype(np.float32),
        "seq_name": "s",
    }
    data_path = str(tmp_path / "train.p")
    joblib.dump({0: rec}, data_path)
    rest = np.concatenate([np.zeros((1, 3)), rng.uniform(-0.2, 0.2, (21, 3))])
    rest_path = str(tmp_path / "rest.npy")
    np.save(rest_path, rest.astype(np.float32))

    overrides = [
        "stage2.d_model=16", "stage2.n_dec_layers=1", "stage2.d_k=8",
        "stage2.d_v=8", "stage2.timesteps=4", "data.window=40",
        "data.batch_size=2", "data.prefetch=0", "train.num_steps=3",
        "train.grad_accum=1", "train.save_every=3", "train.ema_step_start=0",
        f"data.rest_offsets={rest_path}",
        f"logging.save_dir={tmp_path / 'runs'}", "logging.exp_name=resume",
        "logging.log_every=10",
    ]
    run(load_config(overrides=overrides), data_path)
    weights = str(tmp_path / "runs" / "resume" / "weights")
    first = latest_checkpoint(weights)
    assert first and first.endswith("model-3")

    # second launch: must resume at step 3 and continue to step 6
    run(load_config(overrides=overrides), data_path)
    second = latest_checkpoint(weights)
    assert second and second.endswith("model-6")


def test_stage1_orbax_ckpt_loads_into_eval_pipeline(tmp_path):
    """Stage-1 checkpoints written by training/train_stage1.py (orbax epoch
    dirs) must load through eval/build.py's stage-1 loader — the user-facing
    train-here -> eval-here loop (the torch .pt branch covers the reference's
    released checkpoints; tests/test_torch_ckpt.py)."""
    import jax.numpy as jnp

    from egoego_release_tpu.eval.build import _load_stage1_params
    from egoego_release_tpu.models.headnet import HeadFormer
    from egoego_release_tpu.training.train_stage1 import _save_stage1_ckpt
    from egoego_release_tpu.training.trainer_stage1 import Stage1State

    model = HeadFormer(d_model=16, n_layers=1, n_head=2, d_k=8, d_v=8, window=6)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 6, 512)), jnp.ones((1, 6)))
    state = Stage1State(params=params, opt_state=None,
                        epoch=jnp.zeros((), jnp.int32))
    path = _save_stage1_ckpt(str(tmp_path / "ck"), state, epoch=3)

    loaded = _load_stage1_params(path, "headnet", 1, d_model=16, n_head=2,
                                 d_k=8, d_v=8)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(loaded))
    assert len(flat_a) == len(flat_b)
    for p, v in flat_a:
        np.testing.assert_array_equal(np.asarray(v), np.asarray(flat_b[p]))


def test_device_resident_step_matches_host_path_on_same_batch():
    """fit_device's on-device gather + step must equal the host train_step
    given the identical gathered batch (the device path changes WHERE the
    batch is assembled, not the math)."""
    import jax.numpy as jnp

    diff = CondGaussianDiffusion(CFG)
    trainer = DiffusionTrainer(diff, lr=1e-3)
    rng = np.random.RandomState(1)
    data = rng.uniform(-1, 1, (10, 12, 198)).astype(np.float32)
    seq_lens = np.full((10,), 12, np.int32)

    key = jax.random.PRNGKey(5)
    state_d, loss_d = trainer._train_step_device(
        trainer.init_state(jax.random.PRNGKey(0)),
        jnp.asarray(data), jnp.asarray(seq_lens), key, 4,
    )

    # reproduce the gather host-side with the same key-splitting structure
    k_idx, k_step = jax.random.split(key)
    idx = np.asarray(jax.random.randint(k_idx, (4,), 0, data.shape[0]))
    state_h, loss_h = trainer.train_step(
        trainer.init_state(jax.random.PRNGKey(0)),
        {"motion": data[idx], "seq_len": seq_lens[idx]}, k_step,
    )
    np.testing.assert_allclose(float(loss_d), float(loss_h), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(state_d.params), jax.tree.leaves(state_h.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_fit_device_runs_and_logs(tmp_path, capsys):
    diff = CondGaussianDiffusion(CFG)
    trainer = DiffusionTrainer(diff, lr=1e-3)
    rng = np.random.RandomState(2)
    data = rng.uniform(-1, 1, (6, 12, 198)).astype(np.float32)
    state, losses = trainer.fit_device(
        trainer.init_state(jax.random.PRNGKey(0)), data, np.full((6,), 12),
        num_steps=4, batch_size=2, key=jax.random.PRNGKey(1), log_every=2,
        ckpt_dir=str(tmp_path), save_every=4,
    )
    assert int(state.step) == 4 and len(losses) == 2
    assert np.isfinite(losses).all()
    import os as _os
    assert any(n.startswith("model-") for n in _os.listdir(tmp_path))
