"""Posereg baseline training CLI (VideoRegNet: OF features -> qpos).

Port of kinpoly/scripts/exp_pose_reg.py (the `baseline_posereg_*` statear
configs): per-frame pose regression from precomputed optical-flow features
with Adam + weight decay, NaN-loss skip (:210-213), per-epoch checkpointing.

Inputs follow the reference's statear layout (`data_file` expert pickle +
`of_file` feature pickle keyed by take, statear config
baseline_posereg_of_only_on_syn_amass_v1.yml:3-4): --expert_path plus
--of_feats_path ({take: (T, cnn_fdim) float}); records that already carry an
"of_feats" array need no separate pickle.

  python -m egoego_release_tpu.training.train_posereg \
      --cfg kinpoly/config/statear/baseline_posereg_of_only_on_syn_amass_v1.yml \
      --expert_path mocap_annotations.p --of_feats_path mocap_img_feats.p
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp
import optax

from egoego_release_tpu.data.formats import load_motion_dict
from egoego_release_tpu.models.posereg import VideoRegNet, posereg_loss

QPOS_DIM = 76


def load_windows(expert_path: str, of_feats_path: str | None, fr_num: int):
    """(of (N, fr, F), qpos (N, fr, 76)) windows, stride fr_num."""
    data = load_motion_dict(expert_path)
    of_data = load_motion_dict(of_feats_path) if of_feats_path else {}
    of_w, q_w = [], []
    for key, rec in data.items():
        name = rec.get("seq_name", str(key))
        feats = rec.get("of_feats")
        if feats is None:
            feats = of_data.get(name, of_data.get(key))
        if feats is None:
            continue
        feats = np.asarray(feats, np.float32)
        qpos = np.asarray(rec["qpos"], np.float32)
        t = min(len(feats), len(qpos))
        for s in range(0, t - fr_num + 1, fr_num):
            of_w.append(feats[s:s + fr_num])
            q_w.append(qpos[s:s + fr_num])
    if not of_w:
        raise ValueError("no windows: no OF features found for any take")
    return np.stack(of_w), np.stack(q_w)


def run(opt) -> float:
    model_specs = {}
    fr_num = opt.fr_num
    if opt.cfg:
        from egoego_release_tpu.utils.config import KinpolyConfig

        cfg = KinpolyConfig(opt.cfg)
        model_specs = cfg.model_specs
        fr_num = opt.fr_num or cfg.fr_num
    fr_num = fr_num or 90  # statear default window when neither flag nor cfg
    assert fr_num > 0, f"fr_num must be positive, got {fr_num}"

    of, qpos = load_windows(opt.expert_path, opt.of_feats_path, fr_num)
    net = VideoRegNet(
        out_dim=QPOS_DIM,
        v_hdim=int(model_specs.get("rnn_hdim", opt.v_hdim)),
        cnn_fdim=int(model_specs.get("cnn_fdim", of.shape[-1])),
        v_net_type=opt.v_net_type,
        causal=opt.causal,
    )
    key = jax.random.PRNGKey(opt.seed)
    params = net.init(key, jnp.asarray(of[:1]))
    tx = optax.adamw(opt.lr, weight_decay=opt.weight_decay)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, of_b, q_b):
        def loss_fn(p):
            return posereg_loss(net.apply(p, of_b), q_b)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        # NaN skip (exp_pose_reg.py:210-213): keep old state on bad batch
        ok = jnp.isfinite(loss)
        keep = lambda new, old: jax.tree.map(
            lambda a, b: jnp.where(ok, a, b), new, old)
        return keep(new_params, params), keep(new_opt, opt_state), loss

    n = len(of)
    rng = np.random.RandomState(opt.seed)
    last = float("nan")
    for epoch in range(opt.epochs):
        order = rng.permutation(n)
        losses = []
        for s in range(0, n, opt.batch_size):
            idx = order[s:s + opt.batch_size]
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(of[idx]), jnp.asarray(qpos[idx]))
            loss = float(loss)
            if np.isfinite(loss):
                losses.append(loss)
            else:
                print("WARNING: NaN loss, batch skipped")  # exp_pose_reg:210-213
        last = float(np.mean(losses)) if losses else float("nan")
        print(f"epoch {epoch}: loss {last:.5f}")
        if opt.save_dir and (epoch + 1) % opt.save_interval == 0:
            import orbax.checkpoint as ocp

            path = os.path.abspath(os.path.join(opt.save_dir, f"epoch_{epoch + 1}"))
            ocp.PyTreeCheckpointer().save(path, jax.device_get(params), force=True)
    return last


def parse_opt(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--expert_path", required=True)
    p.add_argument("--of_feats_path", default=None)
    p.add_argument("--cfg", default=None, help="statear YAML (model_specs)")
    p.add_argument("--fr_num", type=int, default=0)
    p.add_argument("--v_hdim", type=int, default=128)
    p.add_argument("--v_net_type", choices=["lstm", "tcn"], default="lstm")
    p.add_argument("--causal", action="store_true")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save_dir", default=None)
    p.add_argument("--save_interval", type=int, default=10)
    return p.parse_args(argv)


def main(argv=None):
    run(parse_opt(argv))


if __name__ == "__main__":
    main()
