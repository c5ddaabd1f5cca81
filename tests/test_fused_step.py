"""Fused denoise-STEP (ops/fused_step.py) vs the XLA sampling loops.

Interpreter mode on CPU with f32 compute, so the fused loop must reproduce
CondGaussianDiffusion.p_sample_loop / p_sample_loop_ddim (themselves
golden-tested against the reference's own sampler) to matmul
re-association tolerance: the key-splitting structure and noise-draw shapes
are identical by construction.  TPU throughput: BASELINE.md round-3
fused-step section.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egoego_release_tpu.diffusion import CondGaussianDiffusion, DiffusionConfig

CFG = DiffusionConfig(
    d_feats=12, d_model=64, n_head=2, n_dec_layers=3, d_k=32, d_v=32,
    window=24, timesteps=6,
)


@pytest.fixture(scope="module")
def setup():
    diff = CondGaussianDiffusion(CFG)
    fused = CondGaussianDiffusion(dataclasses.replace(CFG, fused_step=True))
    params = diff.init_params(jax.random.PRNGKey(0), bs=1)
    return diff, fused, params


def _inputs(t, bs=5, d=12):
    x_start = jax.random.normal(jax.random.PRNGKey(1), (bs, t, d))
    cond_mask = (
        jax.random.uniform(jax.random.PRNGKey(2), (bs, t, d)) > 0.3
    ).astype(jnp.float32)
    return x_start, cond_mask


def test_fused_step_ddpm_matches_xla_loop(setup):
    diff, fused, params = setup
    x_start, cond_mask = _inputs(t=CFG.window)
    key = jax.random.PRNGKey(3)
    ref = diff.p_sample_loop(params, key, x_start, cond_mask)
    out = fused.p_sample_loop(params, key, x_start, cond_mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_fused_step_ragged_window_with_inpaint(setup):
    """Ragged (non-tile) frame counts — the chain's tail windows — with the
    per-step overlap inpainting hook active (:392-397 semantics)."""
    diff, fused, params = setup
    t = 13  # pads to 16 frames / 24 tokens in the kernels
    x_start, cond_mask = _inputs(t=t)
    ipv = jax.random.normal(jax.random.PRNGKey(4), x_start.shape)
    ipm = jnp.zeros((x_start.shape[0], t, 1)).at[:, :4].set(1.0)
    key = jax.random.PRNGKey(5)
    ref = diff.p_sample_loop(
        params, key, x_start, cond_mask, inpaint_value=ipv, inpaint_mask=ipm
    )
    out = fused.p_sample_loop(
        params, key, x_start, cond_mask, inpaint_value=ipv, inpaint_mask=ipm
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)
    # the inpainted frames carry the forced values exactly
    np.testing.assert_allclose(
        np.asarray(out[:, :4]), np.asarray(ipv[:, :4]), atol=1e-6
    )


def test_fused_step_act_bf16_close_to_f32(setup):
    """bf16 inter-layer activations (fused_step_act_bf16): bounded drift vs
    the f32 fused path — LN/softmax stats and the scan carry stay f32, so the
    only error source is bf16 rounding of the (B, Tp, dm) tensors handed
    between the per-layer kernels (~3 decimal digits; the per-step x0 clip
    keeps it from compounding)."""
    diff, fused, params = setup
    bf16 = CondGaussianDiffusion(
        dataclasses.replace(CFG, fused_step=True, fused_step_act_bf16=True)
    )
    x_start, cond_mask = _inputs(t=CFG.window)
    key = jax.random.PRNGKey(8)
    ref = fused.p_sample_loop(params, key, x_start, cond_mask)
    out = bf16.p_sample_loop(params, key, x_start, cond_mask)
    assert out.shape == ref.shape
    drift = float(jnp.abs(out - ref).max())
    assert drift < 0.08, f"bf16-act drift {drift} vs f32 fused path"
    # and it still lands near the XLA loop end-to-end
    xla = diff.p_sample_loop(params, key, x_start, cond_mask)
    assert float(jnp.abs(out - xla).max()) < 0.08


def test_fused_step_ddim_matches_xla_loop(setup):
    diff, fused, params = setup
    x_start, cond_mask = _inputs(t=CFG.window)
    key = jax.random.PRNGKey(6)
    ref = diff.p_sample_loop_ddim(params, key, x_start, cond_mask, num_steps=3)
    out = fused.p_sample_loop_ddim(params, key, x_start, cond_mask, num_steps=3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_fused_step_respects_padding_mask(setup):
    """Ragged-window padding: masked frames must not influence real ones."""
    diff, fused, params = setup
    t = CFG.window
    x_start, cond_mask = _inputs(t=t)
    real = 17
    pm = jnp.zeros((x_start.shape[0], 1, t + 1)).at[:, :, : real + 1].set(1.0)
    key = jax.random.PRNGKey(7)
    ref = diff.p_sample_loop(params, key, x_start, cond_mask, padding_mask=pm)
    out = fused.p_sample_loop(params, key, x_start, cond_mask, padding_mask=pm)
    np.testing.assert_allclose(
        np.asarray(out[:, :real]), np.asarray(ref[:, :real]), atol=5e-5
    )
