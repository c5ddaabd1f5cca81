"""Stage-2 diffusion training CLI.

Mirror of trainer_amass_cond_motion_diffusion.py run_train (:384-421):
AMASS window dataset -> DiffusionTrainer (Adam 1e-4, grad-accum 2, EMA,
NaN-skip) with orbax checkpoints, optional dp x tp mesh, JSONL/wandb logging,
and opt.yaml run-settings dump.

  python -m egoego_release_tpu.training.train_diffusion \
      --config cfg.yaml [--set train.num_steps=10000 ...]
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp

from egoego_release_tpu.data.amass import AMASSWindowDataset
from egoego_release_tpu.diffusion.gaussian_diffusion import (
    CondGaussianDiffusion,
    DiffusionConfig,
)
from egoego_release_tpu.eval.build import load_rest_offsets
from egoego_release_tpu.training.trainer_diffusion import DiffusionTrainer, save_checkpoint
from egoego_release_tpu.utils.config import load_config
from egoego_release_tpu.utils.logging import MetricLogger, profile_trace, save_run_config


def latest_checkpoint(ckpt_dir: str) -> str | None:
    """Newest model-<step> checkpoint in a weights dir, by step number."""
    if not os.path.isdir(ckpt_dir):
        return None
    best = None
    for name in os.listdir(ckpt_dir):
        if name.startswith("model-"):
            try:
                step = int(name.split("-", 1)[1])
            except ValueError:
                continue
            if best is None or step > best[0]:
                best = (step, os.path.join(ckpt_dir, name))
    return best[1] if best else None


def run(cfg, train_data_path: str):
    save_dir = os.path.join(cfg.logging.save_dir, cfg.logging.exp_name)
    save_run_config(cfg, save_dir)
    logger = MetricLogger(save_dir, cfg.logging.use_wandb,
                          cfg.logging.wandb_project, cfg.logging.exp_name)

    rest = load_rest_offsets(cfg.data.smplh_path or None, cfg.data.rest_offsets or None)
    ds = AMASSWindowDataset(
        train_data_path, rest, window=cfg.data.window,
        canonicalize_init_head=cfg.data.canonicalize_init_head,
        stats_path=cfg.data.stats_path or None,
    )
    print(f"training windows: {len(ds)}")

    mesh = None
    if cfg.parallel.tp > 1 or cfg.parallel.dp > 1:
        from egoego_release_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(dp=cfg.parallel.dp or None, tp=cfg.parallel.tp)
        print(f"mesh: {dict(mesh.shape)}")

    s2 = cfg.stage2
    diffusion = CondGaussianDiffusion(DiffusionConfig(
        d_model=s2.d_model, n_dec_layers=s2.n_dec_layers, n_head=s2.n_head,
        d_k=s2.d_k, d_v=s2.d_v, window=s2.window, timesteps=s2.timesteps,
        objective=s2.objective, beta_schedule=s2.beta_schedule,
        loss_type=s2.loss_type, remat=s2.remat,
    ))
    trainer = DiffusionTrainer(
        diffusion, lr=cfg.train.learning_rate, grad_accum=cfg.train.grad_accum,
        ema_decay=cfg.train.ema_decay, ema_update_every=cfg.train.ema_update_every,
        ema_step_start=cfg.train.ema_step_start, mesh=mesh,
    )
    key = jax.random.PRNGKey(cfg.train.seed)
    key, k_init, k_data = jax.random.split(key, 3)
    ckpt_dir_resume = os.path.join(save_dir, "weights")
    latest = latest_checkpoint(ckpt_dir_resume)
    if getattr(cfg.train, "resume", True) and latest:
        # pick the newest model-<step> like the reference's latest-by-ctime
        # selection (trainer_amass_cond_motion_diffusion.py:233-242)
        from egoego_release_tpu.training.trainer_diffusion import restore_state

        state = restore_state(latest, trainer)
        print(f"resumed from {latest} at step {int(state.step)}")
    else:
        state = trainer.init_state(k_init)
    if mesh is not None:
        from egoego_release_tpu.parallel.mesh import shard_params

        state = state._replace(params=shard_params(state.params, mesh))

    device_data = None
    if getattr(cfg.data, "device_resident", True):
        # TPU-native default: the window set lives in HBM (replicated across
        # the mesh when one is set), batches gather on device inside the
        # train-step jit (~10x the host iterator path) and shard over dp
        device_data = ds.materialize_windows()
        batches = None
    else:
        batches = ds.batch_iterator(cfg.data.batch_size * cfg.train.grad_accum,
                                    k_data)
        if cfg.data.prefetch > 0:
            # DataLoader-workers analog: background thread + device_put so the
            # host->HBM transfer overlaps the previous step's compute
            from egoego_release_tpu.data.prefetch import prefetch_to_device
            from egoego_release_tpu.parallel.mesh import batch_sharding

            sharding = batch_sharding(mesh) if mesh is not None else None
            batches = prefetch_to_device(batches, prefetch=cfg.data.prefetch,
                                         sharding=sharding)
    ckpt_dir = os.path.join(save_dir, "weights")

    # preemption safety: SIGTERM/SIGINT checkpoint-and-exit (the reference
    # has no preemption handling — SURVEY §5 failure detection)
    import signal

    stop = {"flag": False}

    def _handler(signum, frame):
        print(f"signal {signum}: checkpointing and stopping")
        stop["flag"] = True

    signal.signal(signal.SIGTERM, _handler)
    signal.signal(signal.SIGINT, _handler)

    with profile_trace(cfg.logging.profile_dir or None):
        if device_data is not None:
            if mesh is not None:
                # replicate the bank; the in-jit gather dp-shards each batch
                from egoego_release_tpu.parallel.mesh import replicated

                dp = mesh.shape["dp"]
                if cfg.data.batch_size % dp != 0:
                    raise ValueError(
                        f"data.batch_size {cfg.data.batch_size} must be"
                        f" divisible by dp={dp}")
                sharding = replicated(mesh)
                data_dev = jax.device_put(jnp.asarray(device_data[0]), sharding)
                slen_dev = jax.device_put(
                    jnp.asarray(device_data[1], jnp.int32), sharding)
            else:
                data_dev = jax.device_put(jnp.asarray(device_data[0]))
                slen_dev = jax.device_put(jnp.asarray(device_data[1], jnp.int32))
            n_batch = cfg.data.batch_size * cfg.train.grad_accum
        # host-side step counter: int(state.step) per iteration would force
        # a device sync every step, serializing the dispatch pipeline
        step0 = int(state.step)
        for i in range(cfg.train.num_steps):
            key, sk = jax.random.split(key)
            if device_data is not None:
                state, loss = trainer._train_step_device(
                    state, data_dev, slen_dev, sk, n_batch
                )
            else:
                state, loss = trainer.train_step(state, next(batches), sk)
            step_i = step0 + i + 1
            if (i + 1) % cfg.logging.log_every == 0:
                logger.log(step_i, loss=float(loss),
                           nan_count=int(state.nan_count))
                print(f"step {step_i}: loss {float(loss):.5f}")
            if step_i % cfg.train.save_every == 0 or stop["flag"]:
                path = save_checkpoint(ckpt_dir, state)
                print("checkpoint:", path)
            if stop["flag"]:
                break
    save_checkpoint(ckpt_dir, state)
    logger.close()
    return state


def run_sample(cfg, ckpt_path: str | None = None, num_samples: int = 4):
    """Sampling mode: load the latest checkpoint and generate conditioned
    samples (the reference Trainer's cond_sample_res path,
    trainer_amass_cond_motion_diffusion.py:232-260, which picks the latest
    ckpt by ctime and samples with the EMA weights)."""
    import glob

    import numpy as np

    from egoego_release_tpu.diffusion.gaussian_diffusion import head_condition_mask
    from egoego_release_tpu.training.trainer_diffusion import load_checkpoint

    save_dir = os.path.join(cfg.logging.save_dir, cfg.logging.exp_name)
    if ckpt_path is None:
        cands = glob.glob(os.path.join(save_dir, "weights", "model-*"))
        if not cands:
            raise FileNotFoundError(f"no checkpoints under {save_dir}/weights")
        ckpt_path = max(cands, key=os.path.getctime)
    print("sampling from:", ckpt_path)
    ckpt = load_checkpoint(ckpt_path)

    s2 = cfg.stage2
    diffusion = CondGaussianDiffusion(DiffusionConfig(
        d_model=s2.d_model, n_dec_layers=s2.n_dec_layers, n_head=s2.n_head,
        d_k=s2.d_k, d_v=s2.d_v, window=s2.window, timesteps=s2.timesteps,
    ))
    import jax.numpy as jnp

    params = jax.tree.map(jnp.asarray, ckpt.get("ema", ckpt.get("model")))
    x_start = jnp.zeros((num_samples, s2.window, diffusion.cfg.d_feats))
    cond_mask = head_condition_mask(num_samples, s2.window)
    out = diffusion.p_sample_loop(params, jax.random.PRNGKey(cfg.train.seed),
                                  x_start, cond_mask)
    out_path = os.path.join(save_dir, "samples.npz")
    np.savez(out_path, samples=np.asarray(out), step=int(ckpt["step"]))
    print(f"saved {num_samples} samples -> {out_path}")
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None)
    p.add_argument("--train_data_path", default=None)
    p.add_argument("--sample", action="store_true",
                   help="sampling mode: load the latest checkpoint and generate")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--set", nargs="*", default=[], help="dotted overrides a.b=c")
    args = p.parse_args(argv)
    cfg = load_config(args.config, overrides=args.set)
    if args.sample:
        run_sample(cfg, args.ckpt)
    else:
        if not args.train_data_path:
            p.error("--train_data_path is required for training mode")
        run(cfg, args.train_data_path)


if __name__ == "__main__":
    main()
