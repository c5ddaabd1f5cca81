"""The stage-2 diffusion denoiser network.

Re-implements `TransformerDiffusionModel`
(egoego/model/transformer_cond_diffusion_model.py:75-141): the Decoder over
concat(noisy_x, condition) with the DDPM noise-level t embedded through a
sinusoidal-Fourier MLP and prepended as an extra token, whose output slot is
sliced off before the final linear projection.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import flax.linen as nn

from egoego_release_tpu.models.transformer import Decoder, make_pos_idx

Array = jax.Array


class SinusoidalPosEmb(nn.Module):
    """Noise-level Fourier features (transformer_cond_diffusion_model.py:61-73)."""

    dim: int

    def __call__(self, t: Array) -> Array:  # t: (B,) float/int
        half = self.dim // 2
        freq = jnp.exp(
            jnp.arange(half, dtype=jnp.float32) * (-math.log(10000.0) / (half - 1))
        )
        ang = t.astype(jnp.float32)[:, None] * freq[None, :]
        return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class TransformerDiffusionModel(nn.Module):
    d_feats: int          # per-frame motion dim (22*3 + 22*6 = 198)
    d_model: int
    n_dec_layers: int
    n_head: int
    d_k: int
    d_v: int
    max_timesteps: int    # window + 1
    dtype: object = jnp.float32   # transformer computation dtype
    remat: bool = False   # per-layer rematerialization (training memory)

    @nn.compact
    def __call__(
        self,
        src: Array,                    # (B, T, 2*d_feats) = concat(x, x_cond)
        noise_t: Array,                # (B,) diffusion step indices
        padding_mask: Array | None = None,  # (B, 1, T+1) 1=real
        deterministic: bool = True,
    ) -> Array:
        bs, t, _ = src.shape

        # noise-level embedding: SinusoidalPosEmb(64) -> Dense(256) -> GELU
        # (exact erf form, torch nn.GELU default) -> Dense(d_model)
        dim = 64
        emb = SinusoidalPosEmb(dim)(noise_t)
        emb = nn.Dense(dim * 4, name="time_mlp_1")(emb)
        emb = nn.gelu(emb, approximate=False)
        emb = nn.Dense(self.d_model, name="time_mlp_2")(emb)
        noise_t_embed = emb[:, None, :]  # (B, 1, d_model)

        num_steps = t + 1
        if padding_mask is None:
            padding_mask = jnp.ones((bs, 1, num_steps), dtype=bool)
        pos_idx = make_pos_idx(bs, num_steps)

        feat, _ = Decoder(
            d_feats=self.d_feats * 2,
            d_model=self.d_model,
            n_layers=self.n_dec_layers,
            n_head=self.n_head,
            d_k=self.d_k,
            d_v=self.d_v,
            max_timesteps=self.max_timesteps,
            use_full_attention=True,
            dtype=self.dtype,
            remat=self.remat,
            name="motion_transformer",
        )(
            src,
            padding_mask[:, 0, :],
            pos_idx,
            obj_embedding=noise_t_embed,
            deterministic=deterministic,
        )
        # Drop the noise-token slot, project back to motion dims (f32 output)
        return nn.Dense(self.d_feats, name="linear_out")(feat[:, 1:].astype(jnp.float32))
