"""Fused Pallas decoder-layer kernel vs the flax reference-semantics modules.

Runs in interpreter mode on CPU with f32 compute so the comparison against
models/transformer.DecoderLayer (itself parity-tested against the reference's
torch Decoder) is tight; TPU throughput is measured separately (BASELINE.md).
"""

import jax
import jax.numpy as jnp
import numpy as np

from egoego_release_tpu.diffusion import CondGaussianDiffusion, DiffusionConfig
from egoego_release_tpu.models.transformer import DecoderLayer
from egoego_release_tpu.ops.fused_layer import (
    fused_decoder_layer,
    fused_denoiser_apply,
    layer_params_from_flax,
)

CFG = DiffusionConfig(
    d_feats=12, d_model=64, n_head=2, n_dec_layers=2, d_k=32, d_v=32,
    window=24, timesteps=8,
)


def _layer_fixture(t=25, bs=6, seed=0):
    layer = DecoderLayer(d_model=CFG.d_model, n_head=CFG.n_head,
                         d_k=CFG.d_k, d_v=CFG.d_v, attention_impl="einsum")
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    x = jax.random.normal(k1, (bs, t, CFG.d_model), jnp.float32)
    mask = jnp.ones((bs, t), jnp.float32)
    variables = layer.init(k2, x, None, mask)
    return layer, variables, x, mask


def test_fused_layer_matches_flax():
    layer, variables, x, mask = _layer_fixture()
    ref, _ = layer.apply(variables, x, None, mask, deterministic=True)
    params = layer_params_from_flax(variables["params"], dtype=jnp.float32)
    out = fused_decoder_layer(
        x, mask, params, n_head=CFG.n_head, d_k=CFG.d_k, d_v=CFG.d_v,
        batch_tile=4, interpret=True, compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_layer_padding_mask_semantics():
    """Real-but-masked tokens must participate as zeroed keys (reference
    semantics), while pad-to-tile tokens must be invisible."""
    layer, variables, x, mask = _layer_fixture(t=19, bs=4, seed=1)
    mask = mask.at[:, 15:].set(0.0)
    ref, _ = layer.apply(variables, x, None, mask, deterministic=True)
    params = layer_params_from_flax(variables["params"], dtype=jnp.float32)
    out = fused_decoder_layer(
        x, mask, params, n_head=CFG.n_head, d_k=CFG.d_k, d_v=CFG.d_v,
        batch_tile=4, interpret=True, compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_denoiser_apply_matches_flax():
    diff = CondGaussianDiffusion(CFG)
    key = jax.random.PRNGKey(2)
    params = diff.init_params(key, bs=1)
    bs = 5
    src = jax.random.normal(key, (bs, CFG.window, 2 * CFG.d_feats), jnp.float32)
    t = jnp.arange(bs, dtype=jnp.int32)

    ref = diff.denoiser.apply(params, src, t)
    out = fused_denoiser_apply(
        params, src, t, None, cfg=CFG,
        batch_tile=4, interpret=True, compute_dtype=jnp.float32,
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_fused_denoiser_apply_with_padding():
    diff = CondGaussianDiffusion(CFG)
    key = jax.random.PRNGKey(3)
    params = diff.init_params(key, bs=1)
    bs = 3
    src = jax.random.normal(key, (bs, CFG.window, 2 * CFG.d_feats), jnp.float32)
    t = jnp.zeros((bs,), jnp.int32)
    pm = jnp.ones((bs, 1, CFG.window + 1), jnp.float32)
    pm = pm.at[:, 0, 12:].set(0.0)

    ref = diff.denoiser.apply(params, src, t, pm)
    out = fused_denoiser_apply(
        params, src, t, pm, cfg=CFG,
        batch_tile=2, interpret=True, compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_fused_sampler_end_to_end():
    """cfg.fused_transformer routes the whole p_sample_loop through the
    kernel; samples must match the default path closely (bf16 vs f32 matmul
    inputs are the only difference on CPU interpret = none, so tight)."""
    import dataclasses

    from egoego_release_tpu.diffusion.gaussian_diffusion import head_condition_mask

    key = jax.random.PRNGKey(4)
    diff_a = CondGaussianDiffusion(CFG)
    diff_b = CondGaussianDiffusion(dataclasses.replace(CFG, fused_transformer=True))
    params = diff_a.init_params(key, bs=1)

    bs = 2
    x_start = jax.random.uniform(key, (bs, CFG.window, CFG.d_feats), minval=-1, maxval=1)
    cond_mask = head_condition_mask(bs, CFG.window, joint_idx=1)[..., : CFG.d_feats]

    sa = diff_a.p_sample_loop(params, key, x_start, cond_mask)
    sb = diff_b.p_sample_loop(params, key, x_start, cond_mask)
    assert sa.shape == sb.shape
    # bf16 matmul inputs in the kernel vs f32 on CPU accumulate small drift
    # over the chain; the trajectories must stay close
    np.testing.assert_allclose(np.asarray(sa), np.asarray(sb), atol=0.08)
    assert np.median(np.abs(np.asarray(sa) - np.asarray(sb))) < 0.02
