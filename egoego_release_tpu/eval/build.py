"""Construct an EgoEgoPipeline from checkpoints / model files (shared by the
CLI drivers, mirroring the ckpt-loading preamble of eval_egoego.py:118-191)."""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from egoego_release_tpu.data.formats import load_norm_stats
from egoego_release_tpu.diffusion.gaussian_diffusion import (
    CondGaussianDiffusion,
    DiffusionConfig,
)
from egoego_release_tpu.eval.pipeline import EgoEgoPipeline
from egoego_release_tpu.models.gravitynet import HeadNormalFormer
from egoego_release_tpu.models.headnet import HeadFormer
from egoego_release_tpu.utils import torch_ckpt


def load_rest_offsets(smplh_path: str | None, rest_offsets_path: str | None):
    """Rest bone offsets: from the SMPL-H npz (preferred, exactly like the
    reference) or a pre-extracted (22,3) npy."""
    if rest_offsets_path and os.path.exists(rest_offsets_path):
        return jnp.asarray(np.load(rest_offsets_path).astype(np.float32))
    if smplh_path and os.path.exists(os.path.join(smplh_path, "male", "model.npz")):
        from egoego_release_tpu.ops.smpl import load_smpl_npz, rest_offsets_22

        return rest_offsets_22(load_smpl_npz(os.path.join(smplh_path, "male", "model.npz")))
    raise FileNotFoundError(
        "Need SMPL-H model npz (--smplh_path, same files the reference uses) "
        "or a pre-extracted rest-offsets npy (--rest_offsets)."
    )


def _load_stage1_params(path: str, kind: str, n_layers: int, *,
                        d_model: int, n_head: int, d_k: int, d_v: int):
    """Stage-1 params from either an orbax epoch dir written by
    training/train_stage1.py (`{"epoch", "params"}` pytree) or the
    reference's torch .pt file."""
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        tree = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
        return jax.tree.map(jnp.asarray, tree.get("params", tree))
    return torch_ckpt.load_stage1_ckpt(
        path, kind, n_layers, d_model=d_model, n_head=n_head, d_k=d_k, d_v=d_v,
    )


def build_pipeline(
    *,
    stats_path: str,
    smplh_path: str | None = None,
    rest_offsets_path: str | None = None,
    diffusion_ckpt: str | None = None,
    headnet_ckpt: str | None = None,
    gravitynet_ckpt: str | None = None,
    window: int = 120,
    headnet_window: int = 60,
    headnet_d_model: int = 256,
    headnet_layers: int = 2,
    gravitynet_window: int = 120,
    gravitynet_d_model: int = 256,
    gravitynet_layers: int = 2,
    n_head: int = 4,
    d_k: int = 256,
    d_v: int = 256,
    seed: int = 0,
    sampler: str = "ddpm",
    ddim_steps: int = 50,
    timesteps: int = 1000,   # reference value; lower ONLY for smoke runs
    fused_transformer: bool = False,   # round-3 large-batch modes (BASELINE.md)
    fused_step: bool = False,          # fused denoise-step kernels (chain best)
    sample_microbatch: int = 0,
    of_bf16: bool = False,             # bf16 OF upload (EgoEgoPipeline.of_bf16)
    of_int8: bool = False,             # int8 OF upload (EgoEgoPipeline.of_int8)
) -> EgoEgoPipeline:
    stats = load_norm_stats(stats_path)
    rest_offsets = load_rest_offsets(smplh_path, rest_offsets_path)

    diffusion = CondGaussianDiffusion(
        DiffusionConfig(window=window, sampler=sampler, ddim_steps=ddim_steps,
                        timesteps=timesteps, fused_transformer=fused_transformer,
                        fused_step=fused_step,
                        sample_microbatch=sample_microbatch)
    )
    if diffusion_ckpt and os.path.isdir(diffusion_ckpt):
        # orbax checkpoint produced by training.trainer_diffusion (EMA weights)
        from egoego_release_tpu.training.trainer_diffusion import load_checkpoint

        ckpt = load_checkpoint(diffusion_ckpt)
        params = jax.tree.map(jnp.asarray, ckpt.get("ema", ckpt.get("model")))
    elif diffusion_ckpt and os.path.exists(diffusion_ckpt):
        params, _ = torch_ckpt.load_stage2_diffusion_ckpt(diffusion_ckpt)
    else:
        print("WARNING: no stage-2 checkpoint; using random init")
        params = diffusion.init_params(jax.random.PRNGKey(seed))

    headnet = HeadFormer(
        d_model=headnet_d_model, n_layers=headnet_layers, n_head=n_head,
        d_k=d_k, d_v=d_v, window=headnet_window,
    )
    if headnet_ckpt and os.path.exists(headnet_ckpt):
        headnet_params = _load_stage1_params(
            headnet_ckpt, "headnet", headnet_layers,
            d_model=headnet_d_model, n_head=n_head, d_k=d_k, d_v=d_v,
        )
    else:
        print("WARNING: no HeadNet checkpoint; using random init")
        headnet_params = headnet.init(
            jax.random.PRNGKey(seed + 1),
            jnp.zeros((1, headnet_window, 512)), jnp.ones((1, headnet_window)),
        )

    gravitynet = HeadNormalFormer(
        d_model=gravitynet_d_model, n_layers=gravitynet_layers, n_head=n_head,
        d_k=d_k, d_v=d_v, window=gravitynet_window,
    )
    if gravitynet_ckpt and os.path.exists(gravitynet_ckpt):
        gravitynet_params = _load_stage1_params(
            gravitynet_ckpt, "gravitynet", gravitynet_layers,
            d_model=gravitynet_d_model, n_head=n_head, d_k=d_k, d_v=d_v,
        )
    else:
        print("WARNING: no GravityNet checkpoint; using random init")
        gravitynet_params = gravitynet.init(
            jax.random.PRNGKey(seed + 2),
            jnp.zeros((1, gravitynet_window, 18)), jnp.ones((1, gravitynet_window)),
        )

    return EgoEgoPipeline(
        diffusion=diffusion,
        diffusion_params=params,
        stats=stats,
        rest_offsets=rest_offsets,
        headnet=headnet,
        headnet_params=headnet_params,
        gravitynet=gravitynet,
        gravitynet_params=gravitynet_params,
        of_bf16=of_bf16,
        of_int8=of_int8,
    )
