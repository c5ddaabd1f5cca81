"""EgoEgo-TPU: a TPU-native (JAX/XLA/Pallas) framework for egocentric-video ->
full-body human-motion estimation, with the capabilities of the EgoEgo
reference (lijiaman/egoego_release, CVPR 2023).

Layering (bottom-up):
  ops/       pure-JAX geometry: rotations, heading canonicalization, SMPL FK/IK,
             LBS, trajectory alignment, Pallas attention kernels
  models/    HeadNet / GravityNet / diffusion-denoiser transformers (flax)
  diffusion/ DDPM schedules + jit-compiled samplers (lax.scan over timesteps)
  data/      pickle/npy loaders compatible with the reference's dataset formats
  training/  trainers (Adam/AdamW + EMA + grad-accum + NaN guards), orbax ckpts
  eval/      metric suite + eval drivers mirroring eval_stage2/eval_egoego
  parallel/  jax.sharding meshes + sharded train/eval steps (dp x tp)
  utils/     configs, torch-checkpoint converter
"""

__version__ = "0.1.0"
