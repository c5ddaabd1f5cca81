"""Decoder forward parity vs. an independent numpy oracle.

The oracle implements the documented reference semantics
(post-LN, unmasked full attention, padding-mask output zeroing, 1-based
sinusoid table lookup) directly in numpy from the extracted flax params.
"""

import numpy as np
import jax
import jax.numpy as jnp

from egoego_release_tpu.models.transformer import (
    Decoder,
    make_pos_idx,
    sinusoid_position_table,
)
from egoego_release_tpu.models.denoiser import TransformerDiffusionModel


def np_layer_norm(x, scale, bias, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * scale + bias


def np_softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def np_decoder_forward(params, x, padding_mask, pos_idx, obj_emb, cfg):
    p = params["params"]
    emb = x @ np.asarray(p["start_conv"]["kernel"]) + np.asarray(p["start_conv"]["bias"])
    if obj_emb is not None:
        emb = np.concatenate([obj_emb, emb], axis=1)
    table = sinusoid_position_table(cfg["max_timesteps"] + 1, cfg["d_model"])
    out = emb + table[pos_idx]

    b, t_total, _ = out.shape
    h, dk, dv = cfg["n_head"], cfg["d_k"], cfg["d_v"]
    for li in range(cfg["n_layers"]):
        lp = p[f"layer_{li}"]
        ap = lp["self_attn"]
        residual = out
        q = out @ np.asarray(ap["w_q"]["kernel"]) + np.asarray(ap["w_q"]["bias"])
        k = out @ np.asarray(ap["w_k"]["kernel"]) + np.asarray(ap["w_k"]["bias"])
        v = out @ np.asarray(ap["w_v"]["kernel"]) + np.asarray(ap["w_v"]["bias"])
        q = q.reshape(b, t_total, h, dk)
        k = k.reshape(b, t_total, h, dk)
        v = v.reshape(b, t_total, h, dv)
        attn = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(dk)
        attn = np_softmax(attn)
        av = np.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, t_total, h * dv)
        av = av @ np.asarray(ap["fc"]["kernel"]) + np.asarray(ap["fc"]["bias"])
        out = np_layer_norm(
            av + residual,
            np.asarray(ap["layer_norm"]["scale"]),
            np.asarray(ap["layer_norm"]["bias"]),
        )
        out = out * padding_mask[..., None]

        fp = lp["pos_ffn"]
        residual = out
        hdd = np.maximum(out @ np.asarray(fp["w_1"]["kernel"]) + np.asarray(fp["w_1"]["bias"]), 0)
        hdd = hdd @ np.asarray(fp["w_2"]["kernel"]) + np.asarray(fp["w_2"]["bias"])
        out = np_layer_norm(
            hdd + residual,
            np.asarray(fp["layer_norm"]["scale"]),
            np.asarray(fp["layer_norm"]["bias"]),
        )
        out = out * padding_mask[..., None]
    return out


CFG = dict(d_feats=12, d_model=16, n_layers=2, n_head=2, d_k=8, d_v=8, max_timesteps=9)


def test_decoder_matches_numpy_oracle():
    model = Decoder(**CFG, use_full_attention=True)
    b, t = 3, 8
    rng = np.random.RandomState(0)
    x = rng.randn(b, t, CFG["d_feats"]).astype(np.float32)
    obj = rng.randn(b, 1, CFG["d_model"]).astype(np.float32)
    t_total = t + 1
    padding_mask = np.ones((b, t_total), dtype=np.float32)
    padding_mask[1, 6:] = 0.0  # one padded sequence
    pos_idx = np.asarray(make_pos_idx(b, t_total))

    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(x),
        jnp.asarray(padding_mask),
        jnp.asarray(pos_idx),
        obj_embedding=jnp.asarray(obj),
    )
    out, _ = model.apply(
        params,
        jnp.asarray(x),
        jnp.asarray(padding_mask),
        jnp.asarray(pos_idx),
        obj_embedding=jnp.asarray(obj),
    )
    oracle = np_decoder_forward(
        jax.tree.map(np.asarray, params), x, padding_mask, pos_idx, obj, CFG
    )
    np.testing.assert_allclose(np.asarray(out), oracle, atol=2e-5)
    # padded positions are zeroed in the output
    assert np.abs(np.asarray(out)[1, 6:]).max() == 0.0


def test_sinusoid_table_formula():
    table = sinusoid_position_table(10, 8)
    assert np.allclose(table[0], 0.0)  # padding row
    pos, i = 3, 4
    angle = pos / np.power(10000, 2 * (i // 2) / 8)
    assert np.isclose(table[pos, i], np.sin(angle), atol=1e-6)
    assert np.isclose(table[pos, i + 1], np.cos(pos / np.power(10000, 2 * ((i + 1) // 2) / 8)), atol=1e-6)


def test_denoiser_shapes_and_noise_token():
    d_feats, t, b = 10, 6, 2
    model = TransformerDiffusionModel(
        d_feats=d_feats, d_model=16, n_dec_layers=2, n_head=2, d_k=8, d_v=8,
        max_timesteps=t + 1,
    )
    rng = np.random.RandomState(1)
    src = jnp.asarray(rng.randn(b, t, 2 * d_feats).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), src, jnp.zeros((b,), jnp.int32))
    out0 = model.apply(params, src, jnp.asarray([0, 0]))
    out9 = model.apply(params, src, jnp.asarray([900, 900]))
    assert out0.shape == (b, t, d_feats)
    # the noise token must influence the outputs
    assert np.abs(np.asarray(out0) - np.asarray(out9)).max() > 1e-4
