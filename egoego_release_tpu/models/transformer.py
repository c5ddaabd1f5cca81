"""The shared transformer decoder, TPU-native.

Re-implements the reference's `Decoder` stack
(egoego/model/transformer_module.py) in flax with *exact* forward semantics so
released torch checkpoints convert losslessly:

  * post-LN residual blocks: LayerNorm(dropout(fc(attn)) + residual)
  * the Conv1d(k=1) input stem == a Dense over features
  * frozen sinusoidal position table of size (max_timesteps+1, d_model) with a
    zero row at index 0, indexed by position+1 (transformer_module.py:180-181,
    and pos_vec construction in transformer_cond_diffusion_model.py:133-134)
  * FFN hidden width == d_model (PositionwiseFeedForward(d_model, d_model))
  * the padding mask multiplies layer *outputs* only; with full attention the
    attention itself is unmasked (transformer_module.py:135,139,210-213) —
    padded tokens still participate as (zeroed) keys, which we reproduce
  * optional prepended conditioning token (the diffusion noise-level
    embedding), sliced off by the caller

Attention itself is a single fused einsum chain that XLA maps onto the MXU;
for long sequences `egoego_release_tpu.ops.attention` provides a Pallas
fused kernel with identical math (select via the `attention_impl` attribute).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

Array = jax.Array


def sinusoid_position_table(n_position: int, d_hid: int, padding_idx: int | None = 0) -> np.ndarray:
    """Sinusoid table matching get_sinusoid_encoding_table
    (transformer_module.py:6-24): angle = pos / 10000^(2*(i//2)/d),
    sin on even dims, cos on odd dims, zero row at padding_idx."""
    position = np.arange(n_position)[:, None].astype(np.float64)
    hid = np.arange(d_hid)[None, :]
    angle = position / np.power(10000.0, 2.0 * (hid // 2) / d_hid)
    table = np.zeros((n_position, d_hid), dtype=np.float64)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    if padding_idx is not None:
        table[padding_idx] = 0.0
    return table.astype(np.float32)


def default_attention_impl() -> str:
    """'pallas' on TPU backends, 'einsum' elsewhere (CPU tests, GPUs)."""
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:
        platform = "cpu"
    return "pallas" if platform in ("tpu", "axon") else "einsum"


class MultiHeadAttention(nn.Module):
    """Post-LN multi-head self/cross attention (transformer_module.py:36-95).

    attention_impl: 'auto' (pallas fused kernel on TPU for the
    deterministic unmasked path, einsum otherwise), 'pallas', or 'einsum'.
    """

    n_head: int
    d_model: int
    d_k: int
    d_v: int
    dropout_rate: float = 0.1
    attention_impl: str = "auto"
    dtype: object = jnp.float32   # computation dtype (bf16 for throughput)

    @nn.compact
    def __call__(self, q, k, v, mask=None, deterministic: bool = True):
        # q/k/v: (B, T, d_model); mask: (B, Tq, Tk) True = masked out
        bs, n_q, _ = q.shape
        n_k = k.shape[1]
        residual = q

        wq = nn.Dense(self.n_head * self.d_k, dtype=self.dtype, name="w_q")(q)
        wk = nn.Dense(self.n_head * self.d_k, dtype=self.dtype, name="w_k")(k)
        wv = nn.Dense(self.n_head * self.d_v, dtype=self.dtype, name="w_v")(v)

        wq = wq.reshape(bs, n_q, self.n_head, self.d_k)
        wk = wk.reshape(bs, n_k, self.n_head, self.d_k)
        wv = wv.reshape(bs, n_k, self.n_head, self.d_v)

        impl = self.attention_impl
        if impl == "auto":
            # Measured on v5e: at EgoEgo's scale (T<=121) XLA's fused einsum
            # is dispatch-bound and the per-(b,h) pallas grid serializes on
            # the TensorCore, so the kernel only wins for longer sequences.
            impl = default_attention_impl() if n_q >= 256 else "einsum"
        use_pallas = (
            impl == "pallas" and mask is None
            and (deterministic or self.dropout_rate == 0.0)
        )

        if use_pallas:
            from egoego_release_tpu.ops.attention import fused_attention

            out = fused_attention(
                wq.transpose(0, 2, 1, 3), wk.transpose(0, 2, 1, 3),
                wv.transpose(0, 2, 1, 3),
            ).transpose(0, 2, 1, 3)
            attn = None
            out = out.reshape(bs, n_q, -1)
        else:
            attn = jnp.einsum("bqhd,bkhd->bhqk", wq, wk) / np.sqrt(self.d_k)
            if mask is not None:
                attn = jnp.where(mask[:, None, :, :], -jnp.inf, attn)
            # softmax in f32 regardless of compute dtype (numerical safety)
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
            attn = nn.Dropout(self.dropout_rate, name="attn_dropout")(
                attn, deterministic=deterministic
            )
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, wv).reshape(bs, n_q, -1)

        out = nn.Dense(self.d_model, dtype=self.dtype, name="fc")(out)
        out = nn.Dropout(self.dropout_rate, name="dropout")(out, deterministic=deterministic)
        # LayerNorm statistics in f32
        out = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="layer_norm")(
            (out + residual).astype(jnp.float32)
        ).astype(self.dtype)
        return out, attn


class PositionwiseFeedForward(nn.Module):
    """Dense-relu-Dense with post-LN (transformer_module.py:98-116).
    Hidden width equals d_in in every reference instantiation."""

    d_in: int
    d_hid: int
    dropout_rate: float = 0.1
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        residual = x
        out = nn.Dense(self.d_hid, dtype=self.dtype, name="w_1")(x)
        out = nn.relu(out)
        out = nn.Dense(self.d_in, dtype=self.dtype, name="w_2")(out)
        out = nn.Dropout(self.dropout_rate, name="dropout")(out, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="layer_norm")(
            (out + residual).astype(jnp.float32)
        ).astype(self.dtype)


class DecoderLayer(nn.Module):
    d_model: int
    n_head: int
    d_k: int
    d_v: int
    attention_impl: str = "auto"
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, time_mask, padding_mask, deterministic: bool = True):
        # padding_mask: (B, T) — 1 at real positions, 0 at padding; multiplies
        # the block outputs (transformer_module.py:135,139).
        out, attn = MultiHeadAttention(
            self.n_head, self.d_model, self.d_k, self.d_v,
            attention_impl=self.attention_impl, dtype=self.dtype, name="self_attn"
        )(x, x, x, mask=time_mask, deterministic=deterministic)
        out = out * padding_mask[..., None].astype(out.dtype)
        out = PositionwiseFeedForward(self.d_model, self.d_model, dtype=self.dtype,
                                      name="pos_ffn")(
            out, deterministic=deterministic
        )
        out = out * padding_mask[..., None].astype(out.dtype)
        return out, attn


class Decoder(nn.Module):
    """Transformer decoder stack (transformer_module.py:172-226).

    Call with decoder_input (B, T, d_feats) — NOTE: feature-last, unlike the
    reference's (B, D, T); the Conv1d(k=1) stem is the `start_conv` Dense.
    """

    d_feats: int
    d_model: int
    n_layers: int
    n_head: int
    d_k: int
    d_v: int
    max_timesteps: int
    use_full_attention: bool = True
    attention_impl: str = "auto"
    dtype: object = jnp.float32
    # rematerialize each DecoderLayer in the backward pass (jax.checkpoint):
    # trades ~33% more FLOPs for O(n_layers x B x T x d_model) less HBO temp
    # memory — lets the release config train at micro-batch 256 where the
    # default OOMs at 18.8G (BASELINE.md round-3).  Param tree unchanged.
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        decoder_input: Array,          # (B, T, d_feats)
        padding_mask: Array,           # (B, T_total) 1=real, 0=pad
        pos_idx: Array,                # (B, T_total) int positions (1-based)
        obj_embedding: Array | None = None,  # (B, 1, d_model) prepended token
        deterministic: bool = True,
    ):
        emb = nn.Dense(self.d_model, dtype=self.dtype, name="start_conv")(decoder_input)
        if obj_embedding is not None:
            emb = jnp.concatenate([obj_embedding, emb], axis=1)

        table = jnp.asarray(
            sinusoid_position_table(self.max_timesteps + 1, self.d_model)
        )
        pos_emb = table[pos_idx]  # (B, T_total, d_model)

        if self.use_full_attention:
            time_mask = None
        else:
            t_total = emb.shape[1]
            time_mask = jnp.triu(
                jnp.ones((t_total, t_total), dtype=bool), k=1
            )[None].repeat(emb.shape[0], axis=0)

        out = (emb + pos_emb.astype(emb.dtype))
        # static_argnums: `deterministic` is python control flow (Dropout
        # branches on it) and must not be traced by the remat wrapper
        layer_cls = (nn.remat(DecoderLayer, static_argnums=(4,))
                     if self.remat else DecoderLayer)
        attns = []
        for i in range(self.n_layers):
            out, attn = layer_cls(
                self.d_model, self.n_head, self.d_k, self.d_v,
                attention_impl=self.attention_impl, dtype=self.dtype,
                name=f"layer_{i}"
            )(out, time_mask, padding_mask, deterministic)
            attns.append(attn)
        return out, attns


def make_pos_idx(bs: int, t_total: int) -> Array:
    """1-based position indices, matching `torch.arange(num_steps)+1`."""
    return jnp.broadcast_to(jnp.arange(1, t_total + 1, dtype=jnp.int32), (bs, t_total))
