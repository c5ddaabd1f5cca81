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
