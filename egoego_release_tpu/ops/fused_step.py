"""True fused denoise-STEP: the whole DDPM/DDIM reverse step in Pallas.

BASELINE.md round-3 measured that the per-layer fused kernel
(ops/fused_layer.py) LOSES ~15% to XLA inside the canonical sliding-window
chain.  The measured root cause (after disproving a fusion-barrier theory —
see BASELINE.md "fused denoise-STEP" section): fused_decoder_layer pads
every window to the 128-lane tile, so the chain's RAGGED tail windows (a
140-frame sequence ends with a 30-frame window = 31 tokens) pay 4x the MXU
work XLA spends on a T=31 shape.  Here frames pad only to the f32 SUBLANE
tile (8); ragged windows run right-sized kernels and the chain win follows
(39.8 vs XLA's 32.9 seqs/sec at bs=256).

Additionally, the sampler's elementwise work — input stem, noise-token
prepend, positional add, output projection, x0 clip, posterior FMA, noise
injection, overlap inpainting
(transformer_cond_diffusion_model.py:231-256 p_mean_variance, :248-256
p_sample, :392-397 per-step window inpainting) — is folded INTO the
first/last layer kernels, so one reverse step is exactly `n_dec_layers`
pallas_calls and nothing else touches the (B, T, D) tensors (measured
throughput-neutral, but it removes the need for sample_microbatch chunking:
a three-pallas-call graph has no XLA composed-graph cliff to dodge):

  kernel 1   stem (split concat-matmul: x @ Wx + x_cond @ Wc + b), the
             noise-level token prepended at slot 0, the sinusoidal position
             add, then DecoderLayer 0  (fused_layer._layer_body)
  kernels    DecoderLayer i on the already-padded (Bp, Tp, dm) activations
  2..L-1     (fused_layer._layer_kernel with explicit t_real)
  kernel L   DecoderLayer L-1, then: drop the noise-token slot, linear_out
             projection, x0 = clip(out, -1, 1), and the generalized update
                 x_next = a1 * x0 + a2 * x_t + a3 * noise
             plus optional overlap inpainting
                 x_next = where(inpaint_mask, inpaint_value, x_next).

Both samplers reduce to that update:
  DDPM  (:244-256)  a1 = posterior_mean_coef1[t], a2 = posterior_mean_coef2[t],
                    a3 = [t>0] * exp(0.5 * posterior_log_variance_clipped[t])
  DDIM              a2 = sqrt(max(1-ac_prev-sigma^2, 0)) / sqrt(1-ac_t),
                    a1 = sqrt(ac_prev) - a2 * sqrt(ac_t),  a3 = sigma
(the DDIM form follows from eps = (x - sqrt(ac_t) x0)/sqrt(1-ac_t)).

The scan carry stays lane-padded (B, T, Dp=round128(d_feats)) for the whole
loop, so no per-step pad/slice ops exist either; per-step XLA work is only
the (1,)-sized noise-level MLP, the three schedule scalars (SMEM operand),
and the (B, T, d)-sized normal draw (kept at the UNPADDED width and padded
in the same XLA fusion, so the noise stream matches p_sample_loop's exactly
— with f32 compute the fused loop reproduces the XLA loop to matmul
re-association tolerance).

Weight residency matches ops/fused_layer.py: every weight operand has a
constant index map, so Mosaic keeps it VMEM-resident across the batch grid
(~5 MB/layer bf16 at release dims, well under the ~16 MB VMEM).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from egoego_release_tpu.models.transformer import sinusoid_position_table
from egoego_release_tpu.ops.fused_layer import (
    _PARAM_ORDER,
    _const_index_map,
    _layer_body,
    _layer_kernel,
    _round_up,
    layer_params_from_flax,
)

Array = jax.Array


# -- parameter preparation (once per traced call, outside the scan) --------


def prepare_step_params(params, cfg, compute_dtype, d_pad: int):
    """Flatten the denoiser pytree (models/denoiser.py) into kernel operands:
    per-layer dicts (fused_layer.layer_params_from_flax), the stem weight
    split into its x / x_cond halves zero-padded to the lane-padded feature
    width, the zero-col-padded output projection, the noise-level MLP
    weights, and the position table."""
    p = params["params"]
    mt = p["motion_transformer"]
    d = cfg.d_feats
    w = lambda a: jnp.asarray(a, compute_dtype)
    f32 = lambda a: jnp.asarray(a, jnp.float32)

    stem = f32(mt["start_conv"]["kernel"])            # (2d, dm)
    dm = stem.shape[1]
    pad_rows = lambda a: jnp.pad(a, ((0, d_pad - d), (0, 0)))
    lw = f32(p["linear_out"]["kernel"])               # (dm, d)
    return {
        "layers": tuple(
            layer_params_from_flax(mt[f"layer_{i}"], dtype=compute_dtype)
            for i in range(cfg.n_dec_layers)
        ),
        "wsx": pad_rows(stem[:d]).astype(compute_dtype),   # (Dp, dm)
        "wsc": pad_rows(stem[d:]).astype(compute_dtype),   # (Dp, dm)
        "bst": f32(mt["start_conv"]["bias"]).reshape(1, dm),
        "lw": jnp.pad(lw, ((0, 0), (0, d_pad - d))).astype(compute_dtype),
        "lb": jnp.pad(f32(p["linear_out"]["bias"]), (0, d_pad - d)).reshape(1, d_pad),
        "tw1": f32(p["time_mlp_1"]["kernel"]), "tb1": f32(p["time_mlp_1"]["bias"]),
        "tw2": f32(p["time_mlp_2"]["kernel"]), "tb2": f32(p["time_mlp_2"]["bias"]),
        "pos_table": jnp.asarray(sinusoid_position_table(cfg.window + 2, dm)),
    }


def _noise_level_embedding(t_scalar, prep) -> Array:
    """(1, d_model) noise-level token (denoiser.py:58-65; dim=64 fixed)."""
    half = 32
    freq = jnp.exp(jnp.arange(half, dtype=jnp.float32) * (-math.log(10000.0) / (half - 1)))
    ang = t_scalar.astype(jnp.float32) * freq
    e = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)])[None, :]  # (1, 64)
    e = e @ prep["tw1"] + prep["tb1"]
    e = jax.nn.gelu(e, approximate=False)
    return e @ prep["tw2"] + prep["tb2"]


# -- kernels ---------------------------------------------------------------


def _stem_layer_kernel(
    x_ref, xc_ref, emb_ref, pos_ref, mask_ref,
    wsx_ref, wsc_ref, bst_ref,
    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
    wfc_ref, bfc_ref, ln1s_ref, ln1b_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, ln2s_ref, ln2b_ref,
    o_ref,
    *, n_head, d_k, d_v, t_tokens, scale, cdt,
):
    bt, t_data, dp = x_ref.shape
    tp, dm = pos_ref.shape
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    xm = x_ref[:].astype(cdt).reshape(bt * t_data, dp)
    xcm = xc_ref[:].astype(cdt).reshape(bt * t_data, dp)
    stem = dot(xm, wsx_ref[:]) + dot(xcm, wsc_ref[:]) + bst_ref[:]
    stem = stem.reshape(bt, t_data, dm)

    tok0 = jnp.broadcast_to(emb_ref[:].reshape(1, 1, dm), (bt, 1, dm))
    tail = jnp.zeros((bt, tp - t_data - 1, dm), jnp.float32)
    h = jnp.concatenate([tok0, stem, tail], axis=1) + pos_ref[:][None]

    o_ref[:] = _layer_body(
        h, mask_ref[:, 0:1],
        wq_ref[:], bq_ref[:], wk_ref[:], bk_ref[:], wv_ref[:], bv_ref[:],
        wfc_ref[:], bfc_ref[:], ln1s_ref[:], ln1b_ref[:],
        w1_ref[:], b1_ref[:], w2_ref[:], b2_ref[:], ln2s_ref[:], ln2b_ref[:],
        n_head=n_head, d_k=d_k, d_v=d_v, t_real=t_tokens, scale=scale, cdt=cdt,
    ).astype(o_ref.dtype)


def _layer_epilogue_kernel(
    h_ref, mask_ref, x_ref, noise_ref, scal_ref, ipv_ref, ipm_ref,
    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
    wfc_ref, bfc_ref, ln1s_ref, ln1b_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, ln2s_ref, ln2b_ref,
    lw_ref, lb_ref,
    o_ref,
    *, n_head, d_k, d_v, t_tokens, scale, cdt, has_inpaint,
):
    h = _layer_body(
        h_ref[:], mask_ref[:, 0:1],
        wq_ref[:], bq_ref[:], wk_ref[:], bk_ref[:], wv_ref[:], bv_ref[:],
        wfc_ref[:], bfc_ref[:], ln1s_ref[:], ln1b_ref[:],
        w1_ref[:], b1_ref[:], w2_ref[:], b2_ref[:], ln2s_ref[:], ln2b_ref[:],
        n_head=n_head, d_k=d_k, d_v=d_v, t_real=t_tokens, scale=scale, cdt=cdt,
    )
    bt, t_data, dp = x_ref.shape
    dm = h.shape[-1]
    # drop the noise-token slot (denoiser.py:92 feat[:, 1:]) and project
    feat = h[:, 1 : t_data + 1, :].astype(cdt).reshape(bt * t_data, dm)
    out = jax.lax.dot_general(
        feat, lw_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + lb_ref[:]
    x0 = jnp.clip(out, -1.0, 1.0).reshape(bt, t_data, dp)

    a1, a2, a3 = scal_ref[0], scal_ref[1], scal_ref[2]
    xn = a1 * x0 + a2 * x_ref[:] + a3 * noise_ref[:]
    if has_inpaint:
        m = ipm_ref[:]
        xn = xn + m * (ipv_ref[:] - xn)
    o_ref[:] = xn


# -- pallas_call wrappers --------------------------------------------------


def _weight_specs(lp):
    return [
        pl.BlockSpec(lp[name].shape, _const_index_map(lp[name].ndim))
        for name in _PARAM_ORDER
    ]


def _layer_cost(bp, tp, dm, n_head, d_k, d_v):
    return pl.CostEstimate(
        flops=(
            2 * bp * tp * dm * 3 * n_head * d_k
            + 2 * bp * n_head * tp * tp * (d_k + d_v)
            + 2 * bp * tp * n_head * d_v * dm
            + 4 * bp * tp * dm * dm
        ),
        bytes_accessed=2 * 4 * bp * tp * dm,
        transcendentals=bp * n_head * tp * tp,
    )


def _call_stem_layer(x, xc, emb, pos, mask_lanes, prep, *, n_head, d_k, d_v,
                     t_tokens, bt, interpret, cdt, adt=jnp.float32):
    bp, t_data, dp = x.shape
    tp, dm = pos.shape
    lp = prep["layers"][0]
    kernel = functools.partial(
        _stem_layer_kernel, n_head=n_head, d_k=d_k, d_v=d_v,
        t_tokens=t_tokens, scale=1.0 / (d_k ** 0.5), cdt=cdt,
    )
    return pl.pallas_call(
        kernel,
        grid=(bp // bt,),
        in_specs=[
            pl.BlockSpec((bt, t_data, dp), lambda i: (i, 0, 0)),
            pl.BlockSpec((bt, t_data, dp), lambda i: (i, 0, 0)),
            pl.BlockSpec(emb.shape, _const_index_map(2)),
            pl.BlockSpec(pos.shape, _const_index_map(2)),
            pl.BlockSpec((bt * tp, 128), lambda i: (i, 0)),
            pl.BlockSpec(prep["wsx"].shape, _const_index_map(2)),
            pl.BlockSpec(prep["wsc"].shape, _const_index_map(2)),
            pl.BlockSpec(prep["bst"].shape, _const_index_map(2)),
            *_weight_specs(lp),
        ],
        out_specs=pl.BlockSpec((bt, tp, dm), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, tp, dm), adt),
        interpret=interpret,
        cost_estimate=_layer_cost(bp, tp, dm, n_head, d_k, d_v),
    )(x, xc, emb, pos, mask_lanes,
      prep["wsx"], prep["wsc"], prep["bst"],
      *[lp[name] for name in _PARAM_ORDER])


def _call_mid_layer(h, mask_lanes, lp, *, n_head, d_k, d_v, t_tokens, bt,
                    interpret, cdt, adt=jnp.float32):
    bp, tp, dm = h.shape
    kernel = functools.partial(
        _layer_kernel, n_head=n_head, d_k=d_k, d_v=d_v,
        t_real=t_tokens, scale=1.0 / (d_k ** 0.5), cdt=cdt,
    )
    return pl.pallas_call(
        kernel,
        grid=(bp // bt,),
        in_specs=[
            pl.BlockSpec((bt, tp, dm), lambda i: (i, 0, 0)),
            pl.BlockSpec((bt * tp, 128), lambda i: (i, 0)),
            *_weight_specs(lp),
        ],
        out_specs=pl.BlockSpec((bt, tp, dm), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, tp, dm), adt),
        interpret=interpret,
        cost_estimate=_layer_cost(bp, tp, dm, n_head, d_k, d_v),
    )(h, mask_lanes, *[lp[name] for name in _PARAM_ORDER])


def _call_epilogue_layer(h, mask_lanes, x, noise, scal, ipv, ipm, prep, *,
                         n_head, d_k, d_v, t_tokens, bt, interpret, cdt):
    bp, tp, dm = h.shape
    _, t_data, dp = x.shape
    lp = prep["layers"][-1]
    has_inpaint = ipv is not None
    kernel = functools.partial(
        _layer_epilogue_kernel, n_head=n_head, d_k=d_k, d_v=d_v,
        t_tokens=t_tokens, scale=1.0 / (d_k ** 0.5), cdt=cdt,
        has_inpaint=has_inpaint,
    )
    if not has_inpaint:  # zero-sized dummies keep one kernel signature
        ipv = jnp.zeros((bp, 8, 128), jnp.float32)
        ipm = jnp.zeros((bp, 8, 128), jnp.float32)
    ip_spec = pl.BlockSpec(
        (bt,) + ipv.shape[1:], lambda i: (i, 0, 0)
    )
    return pl.pallas_call(
        kernel,
        grid=(bp // bt,),
        in_specs=[
            pl.BlockSpec((bt, tp, dm), lambda i: (i, 0, 0)),
            pl.BlockSpec((bt * tp, 128), lambda i: (i, 0)),
            pl.BlockSpec((bt, t_data, dp), lambda i: (i, 0, 0)),
            pl.BlockSpec((bt, t_data, dp), lambda i: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            ip_spec,
            ip_spec,
            *_weight_specs(lp),
            pl.BlockSpec(prep["lw"].shape, _const_index_map(2)),
            pl.BlockSpec(prep["lb"].shape, _const_index_map(2)),
        ],
        out_specs=pl.BlockSpec((bt, t_data, dp), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, t_data, dp), jnp.float32),
        interpret=interpret,
        cost_estimate=_layer_cost(bp, tp, dm, n_head, d_k, d_v),
    )(h, mask_lanes, x, noise, scal, ipv, ipm,
      *[lp[name] for name in _PARAM_ORDER], prep["lw"], prep["lb"])


def fused_denoise_step(x, xc, emb, pos, mask_lanes, noise, scal, ipv, ipm,
                       prep, *, n_head, d_k, d_v, t_tokens, bt, interpret,
                       cdt, adt=jnp.float32):
    """One full reverse step on lane/batch-padded arrays:
    x/xc/noise (Bp, T, Dp) f32, emb (1, dm), pos (Tp, dm),
    mask_lanes (Bp*Tp, 128), scal (3,) f32 = (a1, a2, a3),
    ipv/ipm (Bp, T, Dp) or None.  Returns x_next (Bp, T, Dp).

    `adt` is the INTER-LAYER activation dtype: the (Bp, Tp, dm) tensors
    handed between the n_dec_layers pallas_calls (the only HBM round-trips
    left in a step).  bf16 halves that traffic; in-kernel LN/softmax stats
    stay f32 regardless (the residual add promotes), and the scan carry /
    posterior update stay f32 either way."""
    kw = dict(n_head=n_head, d_k=d_k, d_v=d_v, t_tokens=t_tokens, bt=bt,
              interpret=interpret, cdt=cdt)
    h = _call_stem_layer(x, xc, emb, pos, mask_lanes, prep, adt=adt, **kw)
    for lp in prep["layers"][1:-1]:
        h = _call_mid_layer(h, mask_lanes, lp, adt=adt, **kw)
    return _call_epilogue_layer(h, mask_lanes, x, noise, scal, ipv, ipm,
                                prep, **kw)


# -- sampling loops --------------------------------------------------------


def fused_p_sample_loop(
    diff,                       # CondGaussianDiffusion
    params,
    key,
    x_start: Array,             # (B, T, D)
    cond_mask: Array,
    padding_mask: Array | None = None,   # (B, 1, T+1)
    inpaint_value: Array | None = None,  # (B, T, D)
    inpaint_mask: Array | None = None,   # (B, T, 1)
    *,
    ddim_steps: int | None = None,       # None = DDPM over all timesteps
    eta: float = 0.0,
    batch_tile: int = 4,
    interpret: bool = False,
    compute_dtype=None,
    act_dtype=None,                      # inter-layer activation dtype (f32)
) -> Array:
    """Drop-in replacement for CondGaussianDiffusion.p_sample_loop /
    p_sample_loop_ddim built on fused_denoise_step.  Key-splitting structure
    and noise-draw shapes match the XLA loops exactly, so with f32 compute
    the result matches to kernel re-association tolerance."""
    cfg, c = diff.cfg, diff.consts
    if cfg.n_dec_layers < 2:
        raise ValueError("fused step path needs n_dec_layers >= 2")
    if compute_dtype is None:
        compute_dtype = jnp.float32 if interpret else jnp.bfloat16
    if act_dtype is None:
        act_dtype = jnp.float32
    bs, t_data, d = x_start.shape
    t_tokens = t_data + 1
    # Frames pad to the f32 SUBLANE tile (8), not the lane tile (128):
    # ragged chain windows (e.g. the 30-frame tail of a 140-frame sequence)
    # would otherwise run 128-token attention/matmuls — 4x wasted MXU work,
    # the real reason the per-layer fused path lost to XLA inside the chain
    # (the (Tp, Tp) score matrix still pads its lanes internally; that waste
    # is VPU-only and small).
    td_p = _round_up(t_data, 8)
    tp = _round_up(td_p + 1, 8)
    dp = _round_up(d, 128)
    bt = batch_tile
    bp = _round_up(bs, bt)
    prep = prepare_step_params(params, cfg, compute_dtype, dp)
    dm = prep["pos_table"].shape[1]

    pad3 = lambda a: jnp.pad(
        a, ((0, bp - bs), (0, td_p - a.shape[1]), (0, dp - a.shape[2]))
    )

    k_init, k_cond, k_loop = jax.random.split(key, 3)
    x0i = jax.random.normal(k_init, x_start.shape, x_start.dtype)
    x_cond = x_start * (1.0 - cond_mask) + cond_mask * jax.random.normal(
        k_cond, x_start.shape, x_start.dtype
    )
    xp = pad3(x0i)
    xcp = pad3(x_cond)
    if inpaint_value is not None:
        ipv = pad3(inpaint_value.astype(jnp.float32))
        ipm = pad3(jnp.broadcast_to(
            inpaint_mask.astype(jnp.float32), inpaint_mask.shape[:2] + (d,)
        ))
    else:
        ipv = ipm = None

    if padding_mask is None:
        m = jnp.ones((bs, t_tokens), jnp.float32)
    else:
        m = padding_mask[:, 0, :].astype(jnp.float32)
    m = jnp.pad(m, ((0, bp - bs), (0, tp - t_tokens)))
    mask_lanes = jnp.broadcast_to(m.reshape(bp * tp, 1), (bp * tp, 128))

    # token j reads table row j+1 (make_pos_idx 1-based; transformer.py:213)
    pos = jnp.zeros((tp, dm), jnp.float32).at[:t_tokens].set(
        prep["pos_table"][1 : t_tokens + 1]
    )

    step_kw = dict(n_head=cfg.n_head, d_k=cfg.d_k, d_v=cfg.d_v,
                   t_tokens=t_tokens, bt=bt, interpret=interpret,
                   cdt=compute_dtype, adt=act_dtype)

    def body(x, k, t, scal):
        k, sk = jax.random.split(k)
        noise = pad3(jax.random.normal(sk, (bs, t_data, d), jnp.float32))
        emb = _noise_level_embedding(t, prep)
        x = fused_denoise_step(x, xcp, emb, pos, mask_lanes, noise, scal,
                               ipv, ipm, prep, **step_kw)
        return x, k

    if ddim_steps is None:
        def step(carry, i):
            x, k = carry
            a1 = c.posterior_mean_coef1[i]
            a2 = c.posterior_mean_coef2[i]
            a3 = (i != 0) * jnp.exp(0.5 * c.posterior_log_variance_clipped[i])
            x, k = body(x, k, i, jnp.stack([a1, a2, a3]))
            return (x, k), None

        ts = jnp.arange(cfg.timesteps - 1, -1, -1)
        (xp, _), _ = jax.lax.scan(step, (xp, k_loop), ts, unroll=4)
    else:
        ts = jnp.linspace(0, cfg.timesteps - 1, ddim_steps).astype(jnp.int32)[::-1]
        ts_prev = jnp.concatenate([ts[1:], jnp.asarray([-1])])

        def step(carry, tt):
            x, k = carry
            t, t_prev = tt
            ac_t = c.alphas_cumprod[t]
            ac_prev = jnp.where(t_prev >= 0, c.alphas_cumprod[t_prev], 1.0)
            sigma = (
                eta
                * jnp.sqrt((1.0 - ac_prev) / (1.0 - ac_t))
                * jnp.sqrt(1.0 - ac_t / ac_prev)
            )
            a2 = jnp.sqrt(jnp.maximum(1.0 - ac_prev - sigma**2, 0.0)) / jnp.sqrt(1.0 - ac_t)
            a1 = jnp.sqrt(ac_prev) - a2 * jnp.sqrt(ac_t)
            x, k = body(x, k, t, jnp.stack([a1, a2, sigma]))
            return (x, k), None

        (xp, _), _ = jax.lax.scan(step, (xp, k_loop), (ts, ts_prev))

    return xp[:bs, :t_data, :d]
