"""TrajARNet (kin-poly baseline) training CLI.

Mirror of the reference's kinpoly exp_arnet scripts
(kinpoly/scripts/exp_arnet_all.py): trains the autoregressive kinematic
policy on StateAR expert windows with Adam + grad clipping; the whole
rollout + loss + update is one jitted step.

  python -m egoego_release_tpu.training.train_trajar \
      --expert_path mocap_annotations.p --rest_offsets rest.npy \
      [--epochs 100 --fr_num 90 --batch_size 8]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp
import optax

from egoego_release_tpu.data.kinpoly import StateARDataset
from egoego_release_tpu.models.trajar import TrajARNet, trajar_loss


def make_train_step(model: TrajARNet, optimizer, rest_offsets):
    rest = jnp.asarray(rest_offsets)

    @jax.jit
    def step(params, opt_state, batch):
        data = {k: jnp.asarray(v) for k, v in batch.items()
                if k in ("head_pose", "head_vels", "obj_pose", "obj_head_relative_poses")}
        gt_qpos = jnp.asarray(batch["qpos"])

        def loss_fn(p):
            out = model.apply(p, data, init_qpos=gt_qpos[:, 0])
            return trajar_loss(out, gt_qpos, rest)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step


def run(expert_path: str, rest_offsets, epochs: int = 100, fr_num: int = 90,
        batch_size: int = 8, lr: float = 5e-4, rnn_hdim: int = 512,
        mlp_hsize=(1024, 512), save_dir: str = "./results/trajar", seed: int = 0):
    ds = StateARDataset(expert_path, fr_num=fr_num, train=True, seed=seed)
    print(f"expert sequences: {len(ds)}")

    rest_t = tuple(map(tuple, np.asarray(rest_offsets).tolist()))
    model = TrajARNet(rnn_hdim=rnn_hdim, mlp_hsize=tuple(mlp_hsize),
                      rest_offsets=rest_t)
    batches = ds.batch_iterator(batch_size)
    first = next(batches)
    data0 = {k: jnp.asarray(v) for k, v in first.items()
             if k in ("head_pose", "head_vels", "obj_pose", "obj_head_relative_poses")}
    params = model.init(jax.random.PRNGKey(seed), data0)

    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))
    opt_state = optimizer.init(params)
    train_step = make_train_step(model, optimizer, rest_offsets)

    steps_per_epoch = max(1, len(ds) // batch_size)
    os.makedirs(save_dir, exist_ok=True)
    for epoch in range(epochs):
        for _ in range(steps_per_epoch):
            params, opt_state, loss = train_step(params, opt_state, next(batches))
        print(f"epoch {epoch}: loss {float(loss):.5f}")
    import orbax.checkpoint as ocp

    ocp.PyTreeCheckpointer().save(
        os.path.abspath(os.path.join(save_dir, "final")),
        jax.tree.map(np.asarray, params), force=True,
    )
    return params


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--expert_path", required=True)
    p.add_argument("--rest_offsets", default=None)
    p.add_argument("--smplh_path", default=None)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--fr_num", type=int, default=90)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--save_dir", default="./results/trajar")
    args = p.parse_args(argv)

    from egoego_release_tpu.eval.build import load_rest_offsets

    rest = load_rest_offsets(args.smplh_path, args.rest_offsets)
    run(args.expert_path, rest, epochs=args.epochs, fr_num=args.fr_num,
        batch_size=args.batch_size, lr=args.lr, save_dir=args.save_dir)


if __name__ == "__main__":
    main()
