"""Pallas fused attention vs. einsum oracle (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from egoego_release_tpu.ops.attention import fused_attention, reference_attention


def rand_qkv(b=2, h=4, t=121, dk=32, dv=32, seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(b, h, t, dk).astype(np.float32)
    k = rng.randn(b, h, t, dk).astype(np.float32)
    v = rng.randn(b, h, t, dv).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


def test_fused_attention_matches_einsum():
    q, k, v = rand_qkv()
    ours = fused_attention(q, k, v, interpret=True)
    oracle = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(oracle), atol=2e-5)


def test_fused_attention_non_tile_sizes():
    # T=7 (heavy padding), odd head dims
    q, k, v = rand_qkv(b=1, h=2, t=7, dk=16, dv=24, seed=1)
    ours = fused_attention(q, k, v, interpret=True)
    oracle = reference_attention(q, k, v)
    assert ours.shape == oracle.shape == (1, 2, 7, 24)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(oracle), atol=2e-5)


def test_fused_attention_t128_exact_tile():
    q, k, v = rand_qkv(b=1, h=1, t=128, dk=128, dv=128, seed=2)
    ours = fused_attention(q, k, v, interpret=True)
    oracle = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(oracle), atol=2e-5)


def test_decoder_pallas_impl_matches_einsum_impl():
    """The flax Decoder produces identical outputs under both impls
    (pallas in interpret mode via monkeypatched default)."""
    import egoego_release_tpu.ops.attention as attn_mod
    from egoego_release_tpu.models.transformer import Decoder, make_pos_idx

    cfg = dict(d_feats=12, d_model=16, n_layers=2, n_head=2, d_k=8, d_v=8,
               max_timesteps=9)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 8, 12).astype(np.float32))
    pm = jnp.ones((2, 8))
    pos = make_pos_idx(2, 8)

    dec_e = Decoder(**cfg, attention_impl="einsum")
    params = dec_e.init(jax.random.PRNGKey(0), x, pm, pos)
    out_e, _ = dec_e.apply(params, x, pm, pos)

    orig = attn_mod.fused_attention
    try:
        # force interpret mode so 'pallas' runs on CPU
        attn_mod.fused_attention = lambda q, k, v: orig(q, k, v, interpret=True)
        import egoego_release_tpu.models.transformer as tr
        dec_p = Decoder(**cfg, attention_impl="pallas")
        out_p, _ = dec_p.apply(params, x, pm, pos)
    finally:
        attn_mod.fused_attention = orig

    np.testing.assert_allclose(np.asarray(out_e), np.asarray(out_p), atol=2e-5)
