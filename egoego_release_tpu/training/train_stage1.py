"""Stage-1 training CLIs (HeadNet and GravityNet).

Mirrors trainer_head_estimation.py / trainer_amass_head_gravity_normal_estimation.py:
epoch loop, AdamW + StepLR(step_size, 0.3), grad clip 1.0, per-epoch
checkpointing.

  python -m egoego_release_tpu.training.train_stage1 headnet \
      --dataset ares --data_root_folder <root> [--set ...]
  python -m egoego_release_tpu.training.train_stage1 gravitynet \
      --motion_path <amass pickle converted to expert records> [--set ...]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax

from egoego_release_tpu.utils.config import load_config
from egoego_release_tpu.utils.logging import MetricLogger, save_run_config


def _save_stage1_ckpt(save_dir: str, state, epoch: int):
    import orbax.checkpoint as ocp

    path = os.path.join(os.path.abspath(save_dir), f"epoch-{epoch}")
    ocp.PyTreeCheckpointer().save(
        path, {"epoch": np.asarray(epoch),
               "params": jax.tree.map(np.asarray, state.params)},
        force=True,
    )
    return path


def run_headnet(cfg, dataset_name: str, data_root_folder: str, num_epochs: int,
                input_of_feats: bool = True):
    """input_of_feats=False trains from RAW flow frames with crop/noise
    augmentation through an inline ResNet-18 (the reference's
    opt.input_of_feats=False path — trainer_head_estimation.py +
    ares_headpose_dataset.py:149-158)."""
    from egoego_release_tpu.data.headpose import (
        ARESHeadPoseDataset,
        GIMOHeadPoseDataset,
        RealWorldHeadPoseDataset,
    )
    from egoego_release_tpu.models.headnet import HeadFormer, HeadFormerWithCNN
    from egoego_release_tpu.training.trainer_stage1 import (
        Stage1Trainer,
        freeze_subtrees,
        headnet_cnn_loss_fn,
        headnet_loss_fn,
        make_optimizer,
    )

    mk = {"ares": ARESHeadPoseDataset, "gimo": GIMOHeadPoseDataset,
          "kinpoly": RealWorldHeadPoseDataset}[dataset_name]
    ds = mk(data_root_folder, train=True, window=cfg.headnet.window)
    if not input_of_feats:
        # switch the dataset to raw flow loading + augmentation
        ds.input_of_feats = False
        ds.augment = True

    m = cfg.headnet
    headformer = HeadFormer(d_model=m.d_model, n_layers=m.n_dec_layers, n_head=m.n_head,
                            d_k=m.d_k, d_v=m.d_v, window=m.window)
    import jax.numpy as jnp

    if input_of_feats:
        model = headformer
        loss_fn = headnet_loss_fn
        params = model.init(jax.random.PRNGKey(cfg.train.seed),
                            jnp.zeros((1, m.window, 512)), jnp.ones((1, m.window)))
    else:
        model = HeadFormerWithCNN(headformer=headformer,
                                  freeze_cnn=getattr(m, "freeze_of_cnn", True))
        loss_fn = headnet_cnn_loss_fn
        params = model.init(jax.random.PRNGKey(cfg.train.seed),
                            jnp.zeros((1, m.window, 224, 224, 2)),
                            jnp.ones((1, m.window)))
    optimizer = make_optimizer(cfg.train.learning_rate, cfg.train.lr_step_size,
                               cfg.train.lr_gamma,
                               max(1, len(ds) // cfg.data.batch_size))
    if not input_of_feats:
        frozen = ("cnn", "batch_stats") if model.freeze_cnn else ("batch_stats",)
        optimizer = freeze_subtrees(optimizer, frozen)
    trainer = Stage1Trainer(model, loss_fn, optimizer)
    state = trainer.init_state(params)

    save_dir = os.path.join(cfg.logging.save_dir, cfg.logging.exp_name)
    save_run_config(cfg, save_dir)
    logger = MetricLogger(save_dir, cfg.logging.use_wandb)

    rng = np.random.RandomState(cfg.train.seed)
    key = jax.random.PRNGKey(cfg.train.seed)
    steps_per_epoch = max(1, len(ds) // cfg.data.batch_size)

    def epoch_batches():
        """One epoch of host batches; OF-file loading happens here, so the
        prefetch thread overlaps it with the train step."""
        order = rng.permutation(len(ds))
        for s in range(steps_per_epoch):
            items = [ds[int(j)] for j in
                     order[s * cfg.data.batch_size:(s + 1) * cfg.data.batch_size]]
            yield {
                "of": np.stack([it["of"] for it in items]),
                "head_pose": np.stack([it["head_pose"] for it in items]),
                "head_vels": np.stack([it["head_vels"] for it in items]),
                "seq_len": np.asarray([it["seq_len"] for it in items], np.int32),
            }

    step = 0
    for epoch in range(num_epochs):
        batches = epoch_batches()
        if cfg.data.prefetch > 0:
            from egoego_release_tpu.data.prefetch import prefetch_to_device

            batches = prefetch_to_device(batches, prefetch=cfg.data.prefetch)
        for batch in batches:
            key, sk = jax.random.split(key)
            state, loss, aux = trainer.train_step(state, batch, sk)
            step += 1
            if step % cfg.logging.log_every == 0:
                logger.log(step, loss=float(loss), **{k: float(v) for k, v in aux.items()})
        print(f"epoch {epoch}: loss {float(loss):.5f}")
        _save_stage1_ckpt(os.path.join(save_dir, "weights"), state, epoch)
    logger.close()
    return state


def run_gravitynet(cfg, motion_path: str, num_epochs: int):
    from egoego_release_tpu.data.amass_headpose import AMASSHeadPoseDataset
    from egoego_release_tpu.data.formats import load_motion_dict
    from egoego_release_tpu.models.gravitynet import HeadNormalFormer
    from egoego_release_tpu.training.trainer_stage1 import (
        Stage1Trainer,
        gravitynet_loss_fn,
        make_optimizer,
    )
    import jax.numpy as jnp

    all_data = load_motion_dict(motion_path)
    ds = AMASSHeadPoseDataset(all_data, train=True, window=cfg.gravitynet.window,
                              seed=cfg.train.seed)
    m = cfg.gravitynet
    model = HeadNormalFormer(d_model=m.d_model, n_layers=m.n_dec_layers,
                             n_head=m.n_head, d_k=m.d_k, d_v=m.d_v, window=m.window)
    params = model.init(jax.random.PRNGKey(cfg.train.seed),
                        jnp.zeros((1, m.window, 18)), jnp.ones((1, m.window)))
    steps_per_epoch = max(1, len(ds) // cfg.data.batch_size)
    trainer = Stage1Trainer(model, gravitynet_loss_fn,
                            make_optimizer(cfg.train.learning_rate, 2000,
                                           cfg.train.lr_gamma, steps_per_epoch))
    state = trainer.init_state(params)

    save_dir = os.path.join(cfg.logging.save_dir, cfg.logging.exp_name)
    save_run_config(cfg, save_dir)
    logger = MetricLogger(save_dir, cfg.logging.use_wandb)

    batches = ds.batch_iterator(cfg.data.batch_size)
    key = jax.random.PRNGKey(cfg.train.seed)
    step = 0
    for epoch in range(num_epochs):
        for _ in range(steps_per_epoch):
            key, sk = jax.random.split(key)
            state, loss, _ = trainer.train_step(state, next(batches), sk)
            step += 1
            if step % cfg.logging.log_every == 0:
                logger.log(step, loss=float(loss))
        print(f"epoch {epoch}: loss {float(loss):.5f}")
        _save_stage1_ckpt(os.path.join(save_dir, "weights"), state, epoch)
    logger.close()
    return state


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="which", required=True)
    ph = sub.add_parser("headnet")
    ph.add_argument("--dataset", choices=["ares", "gimo", "kinpoly"], required=True)
    ph.add_argument("--data_root_folder", required=True)
    ph.add_argument("--epochs", type=int, default=250)
    ph.add_argument("--raw_flow", action="store_true",
                    help="train from raw flow frames through an inline "
                         "ResNet-18 with augmentation (input_of_feats=False)")
    pg = sub.add_parser("gravitynet")
    pg.add_argument("--motion_path", required=True)
    pg.add_argument("--epochs", type=int, default=2000)
    for q in (ph, pg):
        q.add_argument("--config", default=None)
        q.add_argument("--set", nargs="*", default=[])
    args = p.parse_args(argv)
    cfg = load_config(args.config, overrides=args.set)
    if args.which == "headnet":
        run_headnet(cfg, args.dataset, args.data_root_folder, args.epochs,
                    input_of_feats=not args.raw_flow)
    else:
        run_gravitynet(cfg, args.motion_path, args.epochs)


if __name__ == "__main__":
    main()
