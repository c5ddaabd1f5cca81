"""Head-pose-conditioned Gaussian diffusion (stage 2), TPU-native.

Re-implements `CondGaussianDiffusion`
(egoego/model/transformer_cond_diffusion_model.py:143-625) with the entire
sampling loop living on device:

  * the reference runs 1000 sequential python `p_sample` calls with a host
    sync per step (:392-397); here the loop is one `jax.lax.scan` inside a
    single jit, so the whole 1000-step reverse process is one XLA program.
  * per-window canonicalization, inpainting, de-normalization, IK, and the
    FK re-projection that builds the next window's condition
    (:330-467, :469-525) are all pure jnp — no CPU/numpy round trips.
  * randomness is explicit jax PRNG keys (the reference relies on global
    torch RNG state).

The window chain itself stays a (short) host loop: windows have a strict
sequential dependency through the inpainted overlap (SURVEY §5), and the
per-window jitted program already contains the 1000-step scan, so host
overhead is one dispatch per ~110 frames.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from egoego_release_tpu.diffusion.schedule import DiffusionConstants, make_diffusion_constants
from egoego_release_tpu.models.denoiser import TransformerDiffusionModel
from egoego_release_tpu.ops import fk as fk_mod
from egoego_release_tpu.ops import heading
from egoego_release_tpu.ops import rotations as rot

Array = jax.Array

NUM_JOINTS = fk_mod.NUM_JOINTS
HEAD_IDX = fk_mod.HEAD_IDX
JPOS_DIM = NUM_JOINTS * 3          # 66
ROT_DIM = NUM_JOINTS * 6           # 132
D_FEATS = JPOS_DIM + ROT_DIM       # 198


@dataclass(frozen=True)
class DiffusionConfig:
    """Matches the reference stage-2 run config (scripts/*.sh +
    trainer_amass_cond_motion_diffusion.py:399-403)."""

    d_feats: int = D_FEATS
    d_model: int = 512
    n_head: int = 4
    n_dec_layers: int = 4
    d_k: int = 256
    d_v: int = 256
    window: int = 120
    timesteps: int = 1000
    objective: str = "pred_x0"
    beta_schedule: str = "cosine"
    loss_type: str = "l1"
    p2_loss_weight_gamma: float = 0.0
    p2_loss_weight_k: float = 1.0
    overlap_frames: int = 10       # sliding-window overlap (:351)
    compute_dtype: str = "float32"  # "bfloat16" = faster sampling (small drift)
    sampler: str = "ddpm"          # "ddim" = fast strided sampler (deviation)
    ddim_steps: int = 50
    # Route inference denoiser forwards through the fused Pallas decoder-layer
    # kernel (ops/fused_layer.py).  Round-3 status (BASELINE.md): WINS the
    # bare-sampler large-batch regime (21.5 vs 33.1 us/sample at bs=256;
    # parity at bs<=64 where both paths are MXU-bound) — but SUPERSEDED by
    # fused_step below, which matches it bare and beats it (and XLA) inside
    # the canonical chain.  bf16-rounding-level drift vs the flax path;
    # golden/parity tests always use flax.  Training (p_losses) always uses
    # the flax path (dropout + gradients).
    fused_transformer: bool = False
    # True fused denoise-STEP (ops/fused_step.py): the sampling loops run
    # each reverse step as exactly n_dec_layers pallas_calls with the stem /
    # posterior-update / overlap-inpaint elementwise work folded into the
    # first/last kernels and frames padded to the sublane tile (8) instead
    # of 128 — so ragged chain windows stop paying 128-token kernels (the
    # REAL cause of fused_transformer losing in-chain; BASELINE.md).  The
    # fastest mode for both the bare sampler (54.3 samples/sec at bs=256,
    # no microbatch needed) and the canonical chain (39.8 vs XLA's 32.9
    # seqs/sec).  Inference-only; training and parity/golden tests stay on
    # the flax path.  Requires n_dec_layers >= 2.
    fused_step: bool = False
    # With fused_step: store the INTER-LAYER activations (the only HBM
    # round-trips left in a reverse step) in bf16 instead of f32 — halves
    # that traffic; LN/softmax statistics and the scan carry / posterior
    # update stay f32.  Measured effect on the canonical chain: BASELINE.md
    # round-4 "VPU residual" note.  Off by default (parity stays f32/flax).
    fused_step_act_bf16: bool = False
    # Large-batch cliff fix (BASELINE.md round-3): XLA's per-sample
    # throughput on the COMPOSED denoiser degrades ~45% from bs=64 to
    # bs=256 (isolated matmul/attention/FFN ops all scale fine — the
    # regression is fusion/layout interplay in the full graph).  With
    # sample_microbatch=N>0, p_sample_loop* run batches larger than N as
    # sequential N-sized chunks via lax.map inside the same jit, holding
    # per-sample throughput at the bs=N optimum.  0 = off.  Do not combine
    # with a dp-sharded batch (chunking would serialize across shards).
    sample_microbatch: int = 0
    # Rematerialize decoder layers in the backward pass (jax.checkpoint on
    # each DecoderLayer): the release config OOMs HBM at training
    # micro-batch 256 (18.8G needed) without it.  ~33% extra forward FLOPs
    # during training only; inference paths are unaffected.
    remat: bool = False


class NormStats(NamedTuple):
    """Min/max normalization stats (amass_diffusion_dataset.py:379-407).
    jvel stats are optional (only the jpos path is exercised at inference)."""

    jpos_min: Array  # (22, 3)
    jpos_max: Array  # (22, 3)
    jvel_min: Array | None = None  # (22, 3)
    jvel_max: Array | None = None  # (22, 3)


def normalize_jpos(jpos: Array, stats: NormStats) -> Array:
    """[min,max] -> [-1,1]; jpos (..., 22, 3)."""
    return (jpos - stats.jpos_min) / (stats.jpos_max - stats.jpos_min) * 2.0 - 1.0


def de_normalize_jpos(n: Array, stats: NormStats) -> Array:
    return (n + 1.0) * 0.5 * (stats.jpos_max - stats.jpos_min) + stats.jpos_min


def normalize_jvel(jvel: Array, stats: NormStats) -> Array:
    """(amass_diffusion_dataset.py:394-400)."""
    return (jvel - stats.jvel_min) / (stats.jvel_max - stats.jvel_min) * 2.0 - 1.0


def de_normalize_jvel(n: Array, stats: NormStats) -> Array:
    return (n + 1.0) * 0.5 * (stats.jvel_max - stats.jvel_min) + stats.jvel_min


def head_condition_mask(bs: int, t: int, joint_idx: int = HEAD_IDX) -> Array:
    """1 = missing (to generate), 0 = conditioned — the head pos+rot dims
    (trainer_amass_cond_motion_diffusion.py:210-221)."""
    mask = jnp.ones((bs, t, D_FEATS), dtype=jnp.float32)
    p = joint_idx * 3
    r = JPOS_DIM + joint_idx * 6
    mask = mask.at[:, :, p : p + 3].set(0.0)
    mask = mask.at[:, :, r : r + 6].set(0.0)
    return mask


class CondGaussianDiffusion:
    """Functional wrapper: holds the flax denoiser + schedule constants; all
    methods are pure in (params, key, data) and jit-compatible."""

    def __init__(self, cfg: DiffusionConfig = DiffusionConfig()):
        self.cfg = cfg
        self.consts: DiffusionConstants = make_diffusion_constants(
            cfg.timesteps, cfg.beta_schedule, cfg.p2_loss_weight_gamma, cfg.p2_loss_weight_k
        )
        self.denoiser = TransformerDiffusionModel(
            d_feats=cfg.d_feats,
            d_model=cfg.d_model,
            n_dec_layers=cfg.n_dec_layers,
            n_head=cfg.n_head,
            d_k=cfg.d_k,
            d_v=cfg.d_v,
            max_timesteps=cfg.window + 1,
            dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32,
            remat=cfg.remat,
        )

    # -- setup ------------------------------------------------------------

    def init_params(self, key, bs: int = 1, t: int | None = None):
        t = t if t is not None else self.cfg.window
        src = jnp.zeros((bs, t, 2 * self.cfg.d_feats), jnp.float32)
        return self.denoiser.init(key, src, jnp.zeros((bs,), jnp.int32))

    # -- forward process / training ---------------------------------------

    def q_sample(self, x_start: Array, t: Array, noise: Array) -> Array:
        c = self.consts
        shape = (-1,) + (1,) * (x_start.ndim - 1)
        return (
            c.sqrt_alphas_cumprod[t].reshape(shape) * x_start
            + c.sqrt_one_minus_alphas_cumprod[t].reshape(shape) * noise
        )

    def p_losses(
        self,
        params,
        key,
        x_start: Array,          # (B, T, D) in [-1, 1]
        cond_mask: Array,        # (B, T, D) 1 = missing
        padding_mask: Array | None = None,  # (B, 1, T+1)
        train: bool = False,
    ) -> Array:
        """Training loss (transformer_cond_diffusion_model.py:574-605,617-625)."""
        bs = x_start.shape[0]
        k_t, k_n, k_c, k_drop = jax.random.split(key, 4)
        t = jax.random.randint(k_t, (bs,), 0, self.cfg.timesteps)
        noise = jax.random.normal(k_n, x_start.shape, x_start.dtype)
        x = self.q_sample(x_start, t, noise)

        cond_noise = jax.random.normal(k_c, x_start.shape, x_start.dtype)
        x_cond = x_start * (1.0 - cond_mask) + cond_mask * cond_noise

        x_all = jnp.concatenate([x, x_cond], axis=-1)
        model_out = self.denoiser.apply(
            params, x_all, t, padding_mask,
            deterministic=not train,
            rngs={"dropout": k_drop} if train else None,
        )

        if self.cfg.objective == "pred_x0":
            target = x_start
        elif self.cfg.objective == "pred_noise":
            target = noise
        else:
            raise ValueError(self.cfg.objective)

        if self.cfg.loss_type == "l1":
            loss = jnp.abs(model_out - target)
        else:
            loss = (model_out - target) ** 2
        if padding_mask is not None:
            loss = loss * padding_mask[:, 0, 1:][:, :, None]
        loss = loss.reshape(bs, -1).mean(axis=-1)
        loss = loss * self.consts.p2_loss_weight[t]
        return loss.mean()

    # -- reverse process ---------------------------------------------------

    def _denoiser_apply(self, params, x_all, t, padding_mask):
        """Inference denoiser forward: flax/XLA by default, or the fused
        Pallas decoder-layer kernel (cfg.fused_transformer)."""
        if self.cfg.fused_transformer:
            from egoego_release_tpu.ops.fused_layer import fused_denoiser_apply

            return fused_denoiser_apply(
                params, x_all, t, padding_mask, cfg=self.cfg,
                interpret=jax.default_backend() == "cpu",
            )
        return self.denoiser.apply(params, x_all, t, padding_mask)

    def _p_mean_variance(self, params, x, t, x_cond, padding_mask):
        x_all = jnp.concatenate([x, x_cond], axis=-1)
        model_output = self._denoiser_apply(params, x_all, t, padding_mask)
        if self.cfg.objective == "pred_x0":
            x_start = model_output
        else:
            shape = (-1,) + (1,) * (x.ndim - 1)
            x_start = (
                self.consts.sqrt_recip_alphas_cumprod[t].reshape(shape) * x
                - self.consts.sqrt_recipm1_alphas_cumprod[t].reshape(shape) * model_output
            )
        x_start = jnp.clip(x_start, -1.0, 1.0)

        c = self.consts
        shape = (-1,) + (1,) * (x.ndim - 1)
        mean = (
            c.posterior_mean_coef1[t].reshape(shape) * x_start
            + c.posterior_mean_coef2[t].reshape(shape) * x
        )
        log_var = c.posterior_log_variance_clipped[t].reshape(shape)
        return mean, log_var

    def p_sample(self, params, key, x, t, x_cond, padding_mask=None):
        """One reverse step (:248-256)."""
        mean, log_var = self._p_mean_variance(params, x, t, x_cond, padding_mask)
        noise = jax.random.normal(key, x.shape, x.dtype)
        nonzero = (t[0] != 0).astype(x.dtype)
        return mean + nonzero * jnp.exp(0.5 * log_var) * noise

    def _microbatched(self, fn, key, arrays: dict) -> Array | None:
        """Run `fn(key, chunk_dict)` over sample_microbatch-sized chunks of
        the batch via lax.map (one jit, sequential chunks).  Returns None if
        microbatching does not apply (mb unset, or bs <= mb).

        A batch that is not a multiple of sample_microbatch is PADDED up to
        one (repeating the last row — rows are independent through the
        denoiser) and the result sliced back, so setting mb always takes
        effect (ADVICE r3: the old behavior silently fell back to the
        full-batch path the user was trying to avoid, e.g. mb=64 bs=96)."""
        mb = self.cfg.sample_microbatch
        bs = arrays["x_start"].shape[0]
        if not mb or bs <= mb:
            return None
        pad = (-bs) % mb
        if pad:
            arrays = {
                name: (None if a is None
                       else jnp.concatenate(
                           [a, jnp.repeat(a[-1:], pad, axis=0)], axis=0))
                for name, a in arrays.items()
            }
        k = (bs + pad) // mb
        chunked = {
            name: a.reshape(k, mb, *a.shape[1:])
            for name, a in arrays.items()
            if a is not None
        }
        chunked["key"] = jax.random.split(key, k)
        out = jax.lax.map(
            lambda c: fn(c["key"], {n: v for n, v in c.items() if n != "key"}),
            chunked,
        )
        out = out.reshape(k * mb, *out.shape[2:])
        return out[:bs] if pad else out

    def p_sample_loop(
        self,
        params,
        key,
        x_start: Array,
        cond_mask: Array,
        padding_mask: Array | None = None,
        inpaint_value: Array | None = None,  # (B, T, D) values forced in
        inpaint_mask: Array | None = None,   # (B, T, 1) 1 = force
    ) -> Array:
        """Full reverse chain as a lax.scan (replaces the python loop at
        :258-270 and the per-step window inpainting at :392-397)."""
        chunked = self._microbatched(
            lambda k, c: self.p_sample_loop(
                params, k, c["x_start"], c["cond_mask"], c.get("padding_mask"),
                c.get("inpaint_value"), c.get("inpaint_mask"),
            ),
            key,
            {"x_start": x_start, "cond_mask": cond_mask,
             "padding_mask": padding_mask, "inpaint_value": inpaint_value,
             "inpaint_mask": inpaint_mask},
        )
        if chunked is not None:
            return chunked
        if self.cfg.fused_step:
            from egoego_release_tpu.ops.fused_step import fused_p_sample_loop

            return fused_p_sample_loop(
                self, params, key, x_start, cond_mask, padding_mask,
                inpaint_value, inpaint_mask,
                interpret=jax.default_backend() == "cpu",
                act_dtype=jnp.bfloat16 if self.cfg.fused_step_act_bf16 else None,
            )
        bs = x_start.shape[0]
        k_init, k_cond, k_loop = jax.random.split(key, 3)
        x = jax.random.normal(k_init, x_start.shape, x_start.dtype)
        x_cond = x_start * (1.0 - cond_mask) + cond_mask * jax.random.normal(
            k_cond, x_start.shape, x_start.dtype
        )

        def step(carry, i):
            x, k = carry
            k, sk = jax.random.split(k)
            t = jnp.full((bs,), i, dtype=jnp.int32)
            x = self.p_sample(params, sk, x, t, x_cond, padding_mask)
            if inpaint_value is not None:
                x = jnp.where(inpaint_mask > 0, inpaint_value, x)
            return (x, k), None

        ts = jnp.arange(self.cfg.timesteps - 1, -1, -1)
        # unroll amortizes scan bookkeeping; +~4% measured on v5e at bs=64
        (x, _), _ = jax.lax.scan(step, (x, k_loop), ts, unroll=4)
        return x

    def p_sample_loop_ddim(
        self,
        params,
        key,
        x_start: Array,
        cond_mask: Array,
        num_steps: int = 50,
        eta: float = 0.0,
        padding_mask: Array | None = None,
        inpaint_value: Array | None = None,  # (B, T, D) values forced in
        inpaint_mask: Array | None = None,   # (B, T, 1) 1 = force
    ) -> Array:
        """DDIM sampling (Song et al. 2021) — an OPTIONAL fast sampler the
        reference does not have: the same trained pred-x0 denoiser driven
        over a strided subset of the 1000 timesteps.  num_steps=50 is ~20x
        fewer denoiser calls than the reference's DDPM chain; eta=0 is the
        deterministic variant.  Supports the same per-step overlap
        inpainting hook as the DDPM chain (the window-chain semantics of
        transformer_cond_diffusion_model.py:395-397 applied to the strided
        schedule)."""
        chunked = self._microbatched(
            lambda k, c: self.p_sample_loop_ddim(
                params, k, c["x_start"], c["cond_mask"], num_steps, eta,
                c.get("padding_mask"), c.get("inpaint_value"),
                c.get("inpaint_mask"),
            ),
            key,
            {"x_start": x_start, "cond_mask": cond_mask,
             "padding_mask": padding_mask, "inpaint_value": inpaint_value,
             "inpaint_mask": inpaint_mask},
        )
        if chunked is not None:
            return chunked
        if self.cfg.fused_step:
            from egoego_release_tpu.ops.fused_step import fused_p_sample_loop

            return fused_p_sample_loop(
                self, params, key, x_start, cond_mask, padding_mask,
                inpaint_value, inpaint_mask, ddim_steps=num_steps, eta=eta,
                interpret=jax.default_backend() == "cpu",
                act_dtype=jnp.bfloat16 if self.cfg.fused_step_act_bf16 else None,
            )
        bs = x_start.shape[0]
        c = self.consts
        k_init, k_cond, k_loop = jax.random.split(key, 3)
        x = jax.random.normal(k_init, x_start.shape, x_start.dtype)
        x_cond = x_start * (1.0 - cond_mask) + cond_mask * jax.random.normal(
            k_cond, x_start.shape, x_start.dtype
        )

        ts = jnp.linspace(0, self.cfg.timesteps - 1, num_steps).astype(jnp.int32)[::-1]
        ts_prev = jnp.concatenate([ts[1:], jnp.asarray([-1])])

        def step(carry, tt):
            x, k = carry
            t, t_prev = tt
            k, sk = jax.random.split(k)
            tb = jnp.full((bs,), t, dtype=jnp.int32)
            x_all = jnp.concatenate([x, x_cond], axis=-1)
            model_out = self._denoiser_apply(params, x_all, tb, padding_mask)
            x0 = jnp.clip(model_out, -1.0, 1.0)

            ac_t = c.alphas_cumprod[t]
            ac_prev = jnp.where(t_prev >= 0, c.alphas_cumprod[t_prev], 1.0)
            eps = (x - jnp.sqrt(ac_t) * x0) / jnp.sqrt(1.0 - ac_t)
            sigma = (
                eta
                * jnp.sqrt((1.0 - ac_prev) / (1.0 - ac_t))
                * jnp.sqrt(1.0 - ac_t / ac_prev)
            )
            dir_xt = jnp.sqrt(jnp.maximum(1.0 - ac_prev - sigma**2, 0.0)) * eps
            noise = jax.random.normal(sk, x.shape, x.dtype)
            x = jnp.sqrt(ac_prev) * x0 + dir_xt + sigma * noise
            if inpaint_value is not None:
                x = jnp.where(inpaint_mask > 0, inpaint_value, x)
            return (x, k), None

        (x, _), _ = jax.lax.scan(step, (x, k_loop), (ts, ts_prev))
        return x

    # -- canonical sliding-window sampling ---------------------------------

    def _canonicalize_window(self, head_jpos, head_jquat, stats: NormStats):
        """Window canonicalization + condition construction (:359-390)."""
        aligned_trans, aligned_quat, recover_rot_quat = heading.rotate_at_frame(
            head_jpos, head_jquat, cano_t_idx=0
        )
        move0 = aligned_trans[:, 0:1, :] * jnp.asarray([1.0, 1.0, 0.0])
        aligned_trans = aligned_trans - move0
        rot6d = rot.matrix_to_rot6d(rot.quat_to_matrix(aligned_quat))

        bs, t = aligned_trans.shape[:2]
        x_start = jnp.zeros((bs, t, D_FEATS), jnp.float32)
        p = HEAD_IDX * 3
        r = JPOS_DIM + HEAD_IDX * 6
        x_start = x_start.at[:, :, p : p + 3].set(aligned_trans)
        x_start = x_start.at[:, :, r : r + 6].set(rot6d)
        njpos = normalize_jpos(x_start[:, :, :JPOS_DIM].reshape(bs, t, NUM_JOINTS, 3), stats)
        x_start = x_start.at[:, :, :JPOS_DIM].set(njpos.reshape(bs, t, JPOS_DIM))
        return x_start, recover_rot_quat

    def convert_model_res_to_data(self, res, recover_rot_quat, stats: NormStats):
        """Model output -> (local_aa (B,T,22,3), root_pos (B,T,3),
        head_pos (B,T,3)) in the original (un-canonicalized) frame (:469-525)."""
        bs, t, _ = res.shape
        njpos = res[:, :, :JPOS_DIM].reshape(bs, t, NUM_JOINTS, 3)
        global_jpos = de_normalize_jpos(njpos, stats)
        rot6d = res[:, :, JPOS_DIM:].reshape(bs, t, NUM_JOINTS, 6)

        global_mat = rot.rot6d_to_matrix(rot6d)
        global_quat = rot.matrix_to_quat(global_mat)
        # recover_rot_quat: (B, 1, 1, 4) broadcasts over (T, J)
        ori_global_quat = rot.quat_multiply(recover_rot_quat, global_quat)
        rq = recover_rot_quat[:, :, 0, :]  # (B, 1, 4) broadcast over T
        ori_root_jpos = rot.quat_apply(rq, global_jpos[:, :, 0, :])
        ori_head_jpos = rot.quat_apply(rq, global_jpos[:, :, HEAD_IDX, :])

        ori_global_mat = rot.quat_to_matrix(ori_global_quat)
        local_mat = rot.quat_to_matrix(fk_mod.ik_to_local_quat(rot.matrix_to_quat(ori_global_mat)))
        local_aa = rot.matrix_to_axis_angle(local_mat)
        return local_aa, ori_root_jpos, ori_head_jpos

    def _next_window_inpaint(self, root_pos, local_aa, rest_offsets, stats: NormStats):
        """FK re-projection of the last `overlap` predicted frames into the
        next window's canonical frame (:422-464). Returns (B, overlap, D)."""
        bs, t = root_pos.shape[:2]
        ov = self.cfg.overlap_frames
        gq, gp = fk_mod.fk_smpl(
            root_pos.reshape(-1, 3), local_aa.reshape(-1, NUM_JOINTS, 3), rest_offsets
        )
        gq = gq.reshape(bs, t, NUM_JOINTS, 4)[:, -ov:]
        gp = gp.reshape(bs, t, NUM_JOINTS, 3)[:, -ov:]

        head_quat = gq[:, :, HEAD_IDX, :]
        head_jpos = gp[:, :, HEAD_IDX, :]
        aligned_trans, _, recover = heading.rotate_at_frame(head_jpos, head_quat, cano_t_idx=0)
        move0 = aligned_trans[:, 0:1, :] * jnp.asarray([1.0, 1.0, 0.0])

        inv = rot.quat_invert(recover)  # (B, 1, 1, 4)
        jpos = rot.quat_apply(inv, gp) - move0[:, :, None, :]
        jpos_n = normalize_jpos(jpos, stats)

        quat = rot.quat_multiply(inv, gq)
        rot6d = rot.matrix_to_rot6d(rot.quat_to_matrix(quat))
        return jnp.concatenate(
            [jpos_n.reshape(bs, ov, JPOS_DIM), rot6d.reshape(bs, ov, ROT_DIM)], axis=-1
        )

    @functools.partial(jax.jit, static_argnums=(0, 6))
    def _sample_window_jit(
        self, params, key, head_jpos, head_jquat, stats_and_offsets, use_inpaint,
        inpaint_value=None,
    ):
        """One canonical window: canonicalize -> 1000-step scan (with optional
        overlap inpainting) -> decode -> next-window inpaint values."""
        stats, rest_offsets = stats_and_offsets
        bs, t = head_jpos.shape[:2]
        x_start, recover = self._canonicalize_window(head_jpos, head_jquat, stats)
        cond_mask = head_condition_mask(bs, t)

        if use_inpaint:
            ov = self.cfg.overlap_frames
            mask = jnp.zeros((bs, t, 1), jnp.float32).at[:, :ov].set(1.0)
            value = jnp.zeros((bs, t, D_FEATS), jnp.float32).at[:, :ov].set(inpaint_value)
        else:
            mask = value = None

        if self.cfg.sampler == "ddim":
            # fast mode (documented deviation: strided schedule, same
            # per-step overlap inpainting as the DDPM chain)
            x = self.p_sample_loop_ddim(
                params, key, x_start, cond_mask, num_steps=self.cfg.ddim_steps,
                inpaint_value=value, inpaint_mask=mask,
            )
        elif use_inpaint:
            x = self.p_sample_loop(
                params, key, x_start, cond_mask, inpaint_value=value, inpaint_mask=mask
            )
        else:
            x = self.p_sample_loop(params, key, x_start, cond_mask)

        local_aa, root_pos, head_pos = self.convert_model_res_to_data(x, recover, stats)
        return local_aa, root_pos, head_pos

    @functools.partial(jax.jit, static_argnums=(0,))
    def _next_inpaint_jit(self, root_pos, local_aa, rest_offsets, stats):
        return self._next_window_inpaint(root_pos, local_aa, rest_offsets, stats)

    def sample_sliding_window_parallel_jit(
        self, params, key, head_jpos, head_jquat, stats, rest_offsets
    ):
        """The parallel-window chain as one jitted program (same rationale
        as sample_sliding_window_w_canonical_jit)."""
        if not hasattr(self, "_par_chain_jit"):
            self._par_chain_jit = jax.jit(
                lambda p, k, jp, jq, st, ro:
                self.sample_sliding_window_parallel(p, k, jp, jq, st, ro)
            )
        return self._par_chain_jit(params, key, head_jpos, head_jquat, stats,
                                   rest_offsets)

    def sample_sliding_window_parallel(
        self,
        params,
        key,
        head_jpos: Array,      # (B, T, 3)
        head_jquat: Array,     # (B, T, 4)
        stats: NormStats,
        rest_offsets: Array,
        mesh=None,             # dp-shard the stacked (windows x B) batch
    ):
        """Throughput mode (documented DEVIATION from the reference): all
        windows of all sequences are canonicalized and denoised as ONE batch
        — no inter-window inpainting chain — then stitched by head-position
        continuity with a linear crossfade over the overlap.

        The reference's chain (p_sample_loop_sliding_window_w_canonical)
        serializes windows because each window inpaints the previous
        window's last `overlap` frames every DDPM step (SURVEY §5).  Dropping
        that dependency trades a possible seam (smoothed by the crossfade)
        for sampling every window concurrently: a W-window sequence costs
        one 1000-step scan instead of W.

        Returns (local_aa (B, T', 22, 3), root_pos (B, T', 3)).
        """
        cfg = self.cfg
        bsz, num_steps = head_jpos.shape[:2]
        stride = cfg.window - cfg.overlap_frames
        ov = cfg.overlap_frames

        starts = [t for t in range(0, num_steps, stride)
                  if min(cfg.window, num_steps - t) > ov]
        full = [t for t in starts if num_steps - t >= cfg.window]
        ragged = [t for t in starts if num_steps - t < cfg.window]

        results: dict[int, tuple] = {}
        if full:
            w_jpos = jnp.stack([head_jpos[:, t : t + cfg.window] for t in full], 0)
            w_jquat = jnp.stack([head_jquat[:, t : t + cfg.window] for t in full], 0)
            w_jpos = w_jpos.reshape(-1, cfg.window, 3)
            w_jquat = w_jquat.reshape(-1, cfg.window, 4)
            if mesh is not None:
                # SURVEY §2.4: long sequences shard BY WINDOWS — after the
                # per-window canonicalization the windows are independent,
                # so the stacked (n_windows*B) batch fans dp-wise across
                # chips (pad to dp, slice back below)
                from egoego_release_tpu.parallel.mesh import pad_to_dp, shard_batch

                n_stack = w_jpos.shape[0]
                w_jpos, _ = pad_to_dp(w_jpos, mesh)
                w_jquat, _ = pad_to_dp(w_jquat, mesh)
                w_jpos = shard_batch(w_jpos, mesh)
                w_jquat = shard_batch(w_jquat, mesh)
            key, kw = jax.random.split(key)
            aa, root, headp = self._sample_window_jit(
                params, kw, w_jpos, w_jquat, (stats, rest_offsets), False
            )
            if mesh is not None:
                aa, root, headp = aa[:n_stack], root[:n_stack], headp[:n_stack]
            aa = aa.reshape(len(full), bsz, cfg.window, NUM_JOINTS, 3)
            root = root.reshape(len(full), bsz, cfg.window, 3)
            headp = headp.reshape(len(full), bsz, cfg.window, 3)
            for i, t in enumerate(full):
                results[t] = (aa[i], root[i], headp[i])
        for t in ragged:
            tw = num_steps - t
            key, kw = jax.random.split(key)
            results[t] = self._sample_window_jit(
                params, kw, head_jpos[:, t : t + tw], head_jquat[:, t : t + tw],
                (stats, rest_offsets), False,
            )

        # stitch: head-position continuity + linear crossfade on root over
        # the overlap (rotations switch at the seam)
        whole_aa = whole_root = whole_head = None
        fade = jnp.linspace(0.0, 1.0, ov)[None, :, None]
        for t in starts:
            aa, root, headp = results[t]
            if whole_aa is None:
                whole_aa, whole_root, whole_head = aa, root, headp
                continue
            move = whole_head[:, -1:, :] - headp[:, ov - 1 : ov, :]
            root = root + move
            headp = headp + move
            blended = whole_root[:, -ov:] * (1 - fade) + root[:, :ov] * fade
            whole_root = jnp.concatenate(
                [whole_root[:, :-ov], blended, root[:, ov:]], axis=1
            )
            whole_aa = jnp.concatenate([whole_aa, aa[:, ov:]], axis=1)
            whole_head = jnp.concatenate([whole_head, headp[:, ov:]], axis=1)
        return whole_aa, whole_root

    def sample_sliding_window_w_canonical_jit(
        self, params, key, head_jpos, head_jquat, stats, rest_offsets
    ):
        """The ENTIRE window chain as one jit: the per-window python loop
        unrolls at trace time (window count is static given T), so the
        per-window dispatch + stitching round trips disappear.  Measured on
        v5e (140 frames, bs=16): chained DDIM-50 645 vs ~100-340 seqs/sec
        unjitted (host-dispatch-bound), chained DDPM-1000 32.9 vs 30.5.
        Numerics identical to the unjitted chain (same ops, one program)."""
        if not hasattr(self, "_chain_jit"):
            self._chain_jit = jax.jit(
                lambda p, k, jp, jq, st, ro:
                self.sample_sliding_window_w_canonical(p, k, jp, jq, st, ro)
            )
        return self._chain_jit(params, key, head_jpos, head_jquat, stats,
                               rest_offsets)

    def sample_sliding_window_w_canonical(
        self,
        params,
        key,
        head_jpos: Array,      # (B, T, 3) global head positions
        head_jquat: Array,     # (B, T, 4) global head orientations, wxyz
        stats: NormStats,
        rest_offsets: Array,   # (22, 3)
    ):
        """Long-sequence sampling with per-window canonicalization, overlap
        inpainting, and head-continuity stitching (:330-467).

        Returns (local_aa (B, T', 22, 3), root_pos (B, T', 3)).
        """
        cfg = self.cfg
        num_steps = head_jpos.shape[1]
        stride = cfg.window - cfg.overlap_frames
        ov = cfg.overlap_frames

        whole_aa = whole_root = whole_head = None
        inpaint_value = None

        for t_idx in range(0, num_steps, stride):
            tw = min(cfg.window, num_steps - t_idx)
            if tw <= ov:
                break
            key, k_win = jax.random.split(key)
            w_jpos = head_jpos[:, t_idx : t_idx + tw]
            w_jquat = head_jquat[:, t_idx : t_idx + tw]

            if t_idx == 0:
                aa, root, headp = self._sample_window_jit(
                    params, k_win, w_jpos, w_jquat, (stats, rest_offsets), False
                )
                whole_aa, whole_root, whole_head = aa, root, headp
            else:
                aa, root, headp = self._sample_window_jit(
                    params, k_win, w_jpos, w_jquat, (stats, rest_offsets), True,
                    inpaint_value,
                )
                # stitch on head-position continuity (:407-420)
                move = whole_head[:, -1:, :] - headp[:, ov - 1 : ov, :]
                root = root + move
                headp = headp + move
                whole_aa = jnp.concatenate([whole_aa, aa[:, ov:]], axis=1)
                whole_root = jnp.concatenate([whole_root, root[:, ov:]], axis=1)
                whole_head = jnp.concatenate([whole_head, headp[:, ov:]], axis=1)

            inpaint_value = self._next_inpaint_jit(root, aa, rest_offsets, stats)

        return whole_aa, whole_root
