"""Fused transformer decoder layer as a single Pallas TPU kernel.

SURVEY §7.5's flagship kernel for the stage-2 denoiser hot loop
(transformer_cond_diffusion_model.py:392-397 runs 1000 sequential denoiser
forwards): one `pallas_call` per DecoderLayer computes

    QKV projection -> per-head attention (softmax f32) -> output projection
    -> +residual -> LayerNorm -> padding-mask multiply
    -> FFN (Dense-ReLU-Dense) -> +residual -> LayerNorm -> mask multiply

entirely in VMEM, so none of the (B,T,3*H*dk) projection / score / context
intermediates ever round-trip through HBM (the XLA path materialises several
of them per layer).  Weights are cast to bf16 once on the host side —
matching XLA's default TPU matmul precision (bf16 inputs, f32 accumulation)
— and their BlockSpecs use constant index maps, so Mosaic keeps them
VMEM-resident across the batch grid instead of re-fetching per program.

Semantics match `models/transformer.DecoderLayer` exactly (post-LN, eps
1e-5, LN statistics in f32, unmasked full attention over the real tokens,
padding-mask multiplying the block outputs — transformer_module.py:135,139);
tokens introduced by padding T up to the 128-lane tile are -inf-masked as
keys and zeroed by the extended padding mask, so they are invisible to the
real tokens.  Parity with the flax layer: tests/test_fused_layer.py;
measured throughput vs the XLA path: BASELINE.md.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Array = jax.Array


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _layer_body(
    x, mask,
    wq, bq, wk, bk, wv, bv,
    wfc, bfc, ln1s, ln1b,
    w1, b1, w2, b2, ln2s, ln2b,
    *,
    n_head: int,
    d_k: int,
    d_v: int,
    t_real: int,
    scale: float,
    cdt,                      # matmul-input dtype (bf16 on TPU, f32 in tests)
):
    """One DecoderLayer on VMEM-resident *values*: x (Bt, Tp, dm) f32, mask
    (Bt*Tp, 1) f32, weights as loaded arrays.  Shared by the standalone
    fused-layer kernel below and the fused denoise-step kernels
    (ops/fused_step.py) that prepend/append extra work in the same
    pallas_call."""
    bt, tp, dm = x.shape
    xm = x.reshape(bt * tp, dm).astype(cdt)

    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    q = (dot(xm, wq) + bq).astype(cdt)               # (Bt*Tp, H*dk)
    k = (dot(xm, wk) + bk).astype(cdt)
    v = (dot(xm, wv) + bv).astype(cdt)
    q3 = q.reshape(bt, tp, n_head * d_k)
    k3 = k.reshape(bt, tp, n_head * d_k)
    v3 = v.reshape(bt, tp, n_head * d_v)

    col = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 1)
    key_pad = col >= t_real                          # pad-to-tile keys only

    ctx_rows = []
    for b in range(bt):
        heads = []
        for h in range(n_head):
            qh = q3[b, :, h * d_k:(h + 1) * d_k]     # (Tp, dk) cdt
            kh = k3[b, :, h * d_k:(h + 1) * d_k]
            vh = v3[b, :, h * d_v:(h + 1) * d_v]
            s = jax.lax.dot_general(
                qh, kh,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale                                # (Tp, Tp) f32
            s = jnp.where(key_pad, -jnp.inf, s)
            p = jax.nn.softmax(s, axis=-1).astype(cdt)
            heads.append(jnp.dot(p, vh, preferred_element_type=jnp.float32))
        ctx_rows.append(jnp.concatenate(heads, axis=-1))  # (Tp, H*dv)
    ctx = jnp.stack(ctx_rows).reshape(bt * tp, n_head * d_v)

    attn = dot(ctx.astype(cdt), wfc) + bfc           # (Bt*Tp, dm)

    def layer_norm(y, scale_row, bias_row):
        mu = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean((y - mu) ** 2, axis=-1, keepdims=True)
        return (y - mu) * jax.lax.rsqrt(var + 1e-5) * scale_row + bias_row

    h0 = layer_norm(attn + x.reshape(bt * tp, dm), ln1s, ln1b)
    h0 = h0 * mask

    h1 = jnp.maximum(dot(h0.astype(cdt), w1) + b1, 0.0)
    h2 = dot(h1.astype(cdt), w2) + b2
    out = layer_norm(h2 + h0, ln2s, ln2b) * mask
    return out.reshape(bt, tp, dm)


def _layer_kernel(
    # inputs
    x_ref, mask_ref,
    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
    wfc_ref, bfc_ref, ln1s_ref, ln1b_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, ln2s_ref, ln2b_ref,
    # output
    o_ref,
    *,
    n_head: int,
    d_k: int,
    d_v: int,
    t_real: int,
    scale: float,
    cdt,
):
    o_ref[:] = _layer_body(
        x_ref[:], mask_ref[:, 0:1],
        wq_ref[:], bq_ref[:], wk_ref[:], bk_ref[:], wv_ref[:], bv_ref[:],
        wfc_ref[:], bfc_ref[:], ln1s_ref[:], ln1b_ref[:],
        w1_ref[:], b1_ref[:], w2_ref[:], b2_ref[:], ln2s_ref[:], ln2b_ref[:],
        n_head=n_head, d_k=d_k, d_v=d_v, t_real=t_real, scale=scale, cdt=cdt,
    ).astype(o_ref.dtype)


def layer_params_from_flax(layer: dict, dtype=jnp.bfloat16) -> dict:
    """Extract one DecoderLayer's params (models/transformer.py pytree) into
    the kernel's flat dict: weight matrices in the matmul-input dtype (bf16
    default), biases/LN rows f32 (1, N)."""
    sa, ff = layer["self_attn"], layer["pos_ffn"]
    w = lambda p: jnp.asarray(p, dtype)
    f = lambda p: jnp.asarray(p, jnp.float32).reshape(1, -1)
    return {
        "wq": w(sa["w_q"]["kernel"]), "bq": f(sa["w_q"]["bias"]),
        "wk": w(sa["w_k"]["kernel"]), "bk": f(sa["w_k"]["bias"]),
        "wv": w(sa["w_v"]["kernel"]), "bv": f(sa["w_v"]["bias"]),
        "wfc": w(sa["fc"]["kernel"]), "bfc": f(sa["fc"]["bias"]),
        "ln1s": f(sa["layer_norm"]["scale"]), "ln1b": f(sa["layer_norm"]["bias"]),
        "w1": w(ff["w_1"]["kernel"]), "b1": f(ff["w_1"]["bias"]),
        "w2": w(ff["w_2"]["kernel"]), "b2": f(ff["w_2"]["bias"]),
        "ln2s": f(ff["layer_norm"]["scale"]), "ln2b": f(ff["layer_norm"]["bias"]),
    }


_PARAM_ORDER = (
    "wq", "bq", "wk", "bk", "wv", "bv", "wfc", "bfc", "ln1s", "ln1b",
    "w1", "b1", "w2", "b2", "ln2s", "ln2b",
)


def _const_index_map(ndim: int):
    return lambda i: (0,) * ndim


@functools.partial(
    jax.jit,
    static_argnames=("n_head", "d_k", "d_v", "batch_tile", "interpret",
                     "compute_dtype"),
)
def fused_decoder_layer(
    x: Array,                 # (B, T, d_model) f32
    padding_mask: Array,      # (B, T) 1 = real
    params: dict[str, Any],
    *,
    n_head: int,
    d_k: int,
    d_v: int,
    batch_tile: int = 4,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
) -> Array:
    b, t, dm = x.shape
    tp = _round_up(t, 128)
    bt = batch_tile
    bp = _round_up(b, bt)
    xp = jnp.pad(x.astype(jnp.float32), ((0, bp - b), (0, tp - t), (0, 0)))
    mp = jnp.pad(padding_mask.astype(jnp.float32), ((0, bp - b), (0, tp - t)))
    mp = jnp.broadcast_to(mp.reshape(bp * tp, 1), (bp * tp, 128))

    weight_specs = [
        pl.BlockSpec(params[name].shape, _const_index_map(params[name].ndim))
        for name in _PARAM_ORDER
    ]
    kernel = functools.partial(
        _layer_kernel,
        n_head=n_head, d_k=d_k, d_v=d_v, t_real=t,
        scale=1.0 / (d_k ** 0.5), cdt=compute_dtype,
    )
    flops = (
        2 * bp * tp * dm * 3 * n_head * d_k          # QKV projections
        + 2 * bp * n_head * tp * tp * (d_k + d_v)    # attention matmuls
        + 2 * bp * tp * n_head * d_v * dm            # output projection
        + 4 * bp * tp * dm * dm                      # FFN
    )
    out = pl.pallas_call(
        kernel,
        grid=(bp // bt,),
        in_specs=[
            pl.BlockSpec((bt, tp, dm), lambda i: (i, 0, 0)),
            # mask arrives lane-expanded as (B*Tp, 128) so its blocks satisfy
            # the (8, 128) tiling rule; the kernel uses column 0
            pl.BlockSpec((bt * tp, 128), lambda i: (i, 0)),
            *weight_specs,
        ],
        out_specs=pl.BlockSpec((bt, tp, dm), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, tp, dm), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * 4 * bp * tp * dm,
            transcendentals=bp * n_head * tp * tp,
        ),
    )(xp, mp, *[params[name] for name in _PARAM_ORDER])
    return out[:b, :t, :]


def fused_denoiser_apply(
    params,                    # the flax variables of TransformerDiffusionModel
    src: Array,                # (B, T, 2*d_feats)
    noise_t: Array,            # (B,)
    padding_mask: Array | None,  # (B, 1, T+1) 1 = real, or None
    *,
    cfg,                       # DiffusionConfig (n_head/d_k/d_v/n_dec_layers/...)
    batch_tile: int = 4,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
) -> Array:
    """The full denoiser forward (models/denoiser.py semantics) with every
    DecoderLayer running through the fused Pallas kernel.  Consumes the SAME
    params pytree as `TransformerDiffusionModel.apply`, so trained/converted
    checkpoints work unchanged; stem / position table / noise-token MLP /
    output projection stay in jnp (XLA already fuses those)."""
    import math

    from egoego_release_tpu.models.transformer import sinusoid_position_table

    p = params["params"]
    bs, t, _ = src.shape

    # noise-level embedding (denoiser.py:57-64)
    dim = 64
    half = dim // 2
    freq = jnp.exp(jnp.arange(half, dtype=jnp.float32) * (-math.log(10000.0) / (half - 1)))
    ang = noise_t.astype(jnp.float32)[:, None] * freq[None, :]
    emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    emb = emb @ p["time_mlp_1"]["kernel"] + p["time_mlp_1"]["bias"]
    emb = jax.nn.gelu(emb, approximate=False)
    emb = emb @ p["time_mlp_2"]["kernel"] + p["time_mlp_2"]["bias"]

    mt = p["motion_transformer"]
    x = src @ mt["start_conv"]["kernel"] + mt["start_conv"]["bias"]  # (B,T,dm)
    x = jnp.concatenate([emb[:, None, :], x], axis=1)                # (B,T+1,dm)

    num_steps = t + 1
    table = jnp.asarray(sinusoid_position_table(cfg.window + 2, x.shape[-1]))
    pos = jnp.arange(1, num_steps + 1, dtype=jnp.int32)
    x = x + table[pos][None]

    if padding_mask is None:
        mask = jnp.ones((bs, num_steps), jnp.float32)
    else:
        mask = padding_mask[:, 0, :].astype(jnp.float32)

    for i in range(cfg.n_dec_layers):
        layer_p = layer_params_from_flax(mt[f"layer_{i}"], dtype=compute_dtype)
        x = fused_decoder_layer(
            x, mask, layer_p,
            n_head=cfg.n_head, d_k=cfg.d_k, d_v=cfg.d_v,
            batch_tile=batch_tile, interpret=interpret,
            compute_dtype=compute_dtype,
        )
    feat = x[:, 1:].astype(jnp.float32)
    return feat @ p["linear_out"]["kernel"] + p["linear_out"]["bias"]
