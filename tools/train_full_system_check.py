"""FULL-SYSTEM capability check on the bundled demo sequence: overfit-train
ALL THREE models from scratch on real data — HeadNet (OF feats -> head
orientation + distance), GravityNet (SLAM trajectory -> floor normal +
scale), and the stage-2 diffusion model — then drive the COMPLETE
run_egoego pipeline (stage-1 blockwise eval -> gravity alignment ->
canonical sliding-window diffusion -> FK -> floor snap -> metric suite)
with the trained weights.

This closes the whole eval_egoego.py:118-446 flow end to end with trained
components (the reference's released checkpoints are license-gated and not
bundled; overfit weights on the bundled demo sequence are the reproducible
substitute).  Four conditioning regimes isolate each error source:

  stage1-random   untrained stage 1 -> stage 2          (sanity floor)
  stage1-trained  the full trained system               (the headline)
  gt-record-head  record head_qpos GT -> stage 2        (stage-1 error removed)
  gt-fk-head      FK-derived GT head -> stage 2         (skeleton-convention
                                                         mismatch also removed;
                                                         equals the stage-2
                                                         overfit check)

  python tools/train_full_system_check.py
  FULLSYS_S2_STEPS=2000 FULLSYS_S1_STEPS=800 python tools/train_full_system_check.py
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

DEMO_ROOT = "/root/reference/test_data/ares"
DEMO = os.path.join(DEMO_ROOT, "demo_ares_data.p")
STATS = os.path.join(DEMO_ROOT, "cano_min_max_mean_std_data_window_120.p")


def train_headnet(cfg, rec, steps, bs, key):
    """Overfit HeadFormer on random window crops of the demo sequence
    (trainer_head_estimation.py training batch semantics)."""
    from egoego_release_tpu.models.headnet import HeadFormer
    from egoego_release_tpu.training.trainer_stage1 import (
        Stage1Trainer, headnet_loss_fn, make_optimizer,
    )

    m = cfg.headnet
    model = HeadFormer(d_model=m.d_model, n_layers=m.n_dec_layers,
                      n_head=m.n_head, d_k=m.d_k, d_v=m.d_v, window=m.window)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, m.window, 512)), jnp.ones((1, m.window)))
    trainer = Stage1Trainer(
        model, headnet_loss_fn,
        make_optimizer(cfg.train.learning_rate, step_size_epochs=max(steps // 2, 1)),
    )
    state = trainer.init_state(params)

    of = np.asarray(rec["of"], np.float32)              # (T, 512)
    head_pose = np.asarray(rec["head_pose"], np.float32)  # (T+1, 7)
    head_vels = np.asarray(rec["head_vels"], np.float32)  # (T, 6)
    t_total, w = of.shape[0], m.window
    rng = np.random.RandomState(0)

    t0 = time.time()
    for i in range(steps):
        starts = rng.randint(0, t_total - w + 1, size=bs)
        batch = {
            "of": np.stack([of[s:s + w] for s in starts]),
            "head_pose": np.stack([head_pose[s:s + w + 1] for s in starts]),
            "head_vels": np.stack([head_vels[s:s + w] for s in starts]),
            "seq_len": np.full((bs,), w, np.float32),
        }
        key, sk = jax.random.split(key)
        state, loss, _ = trainer.train_step(state, batch, sk)
        if (i + 1) % max(steps // 4, 1) == 0:
            print(f"headnet step {i + 1}/{steps}: loss {float(loss):.5f}",
                  flush=True)
    print(f"headnet trained in {time.time() - t0:.1f}s", flush=True)
    return model, state.params


def train_gravitynet(cfg, rec, steps, bs, key):
    """Overfit HeadNormalFormer via the rotation/scale augmentation dataset
    (amass_headpose_dataset.py semantics) built on the demo head trajectory."""
    from egoego_release_tpu.data.amass_headpose import AMASSHeadPoseDataset
    from egoego_release_tpu.models.gravitynet import HeadNormalFormer
    from egoego_release_tpu.training.trainer_stage1 import (
        Stage1Trainer, gravitynet_loss_fn, make_optimizer,
    )

    m = cfg.gravitynet
    model = HeadNormalFormer(d_model=m.d_model, n_layers=m.n_dec_layers,
                             n_head=m.n_head, d_k=m.d_k, d_v=m.d_v,
                             window=m.window)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, m.window, 18)), jnp.ones((1, m.window)),
    )
    trainer = Stage1Trainer(
        model, gravitynet_loss_fn,
        make_optimizer(cfg.train.learning_rate, step_size_epochs=max(steps // 2, 1)),
    )
    state = trainer.init_state(params)

    # "CMU-" prefix -> train split membership (amass_headpose.TRAIN_DATASETS)
    head_pose = np.asarray(rec["head_pose"], np.float32)
    ds = AMASSHeadPoseDataset({"CMU-demo": {"head_pose": head_pose}},
                              train=True, window=m.window)
    assert len(ds) == 1
    batches = ds.batch_iterator(1)

    t0 = time.time()
    for i in range(steps):
        items = [next(batches) for _ in range(bs)]
        batch = {k: np.concatenate([it[k] for it in items]) for k in items[0]}
        key, sk = jax.random.split(key)
        state, loss, _ = trainer.train_step(state, batch, sk)
        if (i + 1) % max(steps // 4, 1) == 0:
            print(f"gravitynet step {i + 1}/{steps}: loss {float(loss):.5f}",
                  flush=True)
    print(f"gravitynet trained in {time.time() - t0:.1f}s", flush=True)
    return model, state.params


def train_stage2(cfg_diff, ds, steps, bs, accum, key):
    from egoego_release_tpu.training.trainer_diffusion import DiffusionTrainer

    from egoego_release_tpu.diffusion import CondGaussianDiffusion

    diff = CondGaussianDiffusion(cfg_diff)
    trainer = DiffusionTrainer(diff, grad_accum=accum)
    state = trainer.init_state(jax.random.PRNGKey(0))
    batches = ds.batch_iterator(bs * accum, jax.random.PRNGKey(1))
    t0 = time.time()
    for i in range(steps):
        key, sk = jax.random.split(key)
        state, loss = trainer.train_step(state, next(batches), sk)
        if (i + 1) % max(steps // 4, 1) == 0:
            print(f"stage2 step {i + 1}/{steps}: loss {float(loss):.5f}",
                  flush=True)
    print(f"stage2 trained in {time.time() - t0:.1f}s", flush=True)
    return diff, state.ema_params


def main():
    jax.config.update("jax_default_prng_impl", "rbg")

    from egoego_release_tpu.data.amass import AMASSWindowDataset
    from egoego_release_tpu.data.formats import load_motion_dict
    from egoego_release_tpu.data.headpose import ARESDemoDataset
    from egoego_release_tpu.diffusion import DiffusionConfig
    from egoego_release_tpu.eval.pipeline import (
        EgoEgoPipeline, evaluate_sequence, gt_from_smpl_params, stage1_metrics,
    )
    from egoego_release_tpu.utils.config import load_config

    s1_steps = int(os.environ.get("FULLSYS_S1_STEPS", "1200"))
    s1_bs = int(os.environ.get("FULLSYS_S1_BS", "16"))
    s2_steps = int(os.environ.get("FULLSYS_S2_STEPS", "4000"))
    s2_bs = int(os.environ.get("FULLSYS_S2_BS", "32"))
    s2_accum = int(os.environ.get("FULLSYS_S2_ACCUM", "2"))
    save_dir = os.environ.get("FULLSYS_SAVE", "")
    tiny = os.environ.get("FULLSYS_TINY", "0") == "1"  # CPU plumbing smoke

    cfg = load_config(None)
    if tiny:
        from egoego_release_tpu.utils.config import Stage1ModelConfig

        small = dict(d_model=64, n_dec_layers=1, n_head=2, d_k=32, d_v=32)
        cfg = dataclasses.replace(
            cfg,
            headnet=Stage1ModelConfig(window=30, **small),
            gravitynet=Stage1ModelConfig(window=40, **small),
        )
    demo = ARESDemoDataset(DEMO_ROOT)
    rec = demo[0]  # full-sequence eval record (of/head_pose/slam fields)

    # GT body motion + FK (shared random-rest skeleton: SMPL assets are
    # license-gated, so GT and prediction are decoded through the same
    # synthetic skeleton — identical policy to tools/train_overfit_check.py)
    rng = np.random.RandomState(0)
    rest = np.concatenate(
        [np.zeros((1, 3)), rng.uniform(-0.2, 0.2, (21, 3))]
    ).astype(np.float32)
    motion = list(load_motion_dict(DEMO).values())[0]

    cfg_diff = DiffusionConfig()
    if tiny:
        cfg_diff = DiffusionConfig(
            d_model=64, n_head=2, n_dec_layers=1, d_k=32, d_v=32,
            window=60, timesteps=8,
        )
    ds2 = AMASSWindowDataset(DEMO, rest, window=cfg_diff.window, stats_path=STATS)

    # -- train all three models ------------------------------------------
    headnet, hn_trained = train_headnet(cfg, rec, s1_steps, s1_bs,
                                        jax.random.PRNGKey(10))
    gravitynet, gn_trained = train_gravitynet(cfg, rec, s1_steps, s1_bs,
                                              jax.random.PRNGKey(11))
    diff, s2_trained = train_stage2(cfg_diff, ds2, s2_steps, s2_bs, s2_accum,
                                    jax.random.PRNGKey(12))

    hn_random = headnet.init(jax.random.PRNGKey(99),
                             jnp.zeros((1, headnet.window, 512)),
                             jnp.ones((1, headnet.window)))
    gn_random = gravitynet.init(jax.random.PRNGKey(99),
                                jnp.zeros((1, gravitynet.window, 18)),
                                jnp.ones((1, gravitynet.window)))

    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        import orbax.checkpoint as ocp

        for name, tree in (("headnet", hn_trained), ("gravitynet", gn_trained),
                           ("stage2_ema", s2_trained)):
            ocp.PyTreeCheckpointer().save(
                os.path.join(os.path.abspath(save_dir), name),
                jax.tree.map(np.asarray, tree), force=True,
            )
        print(f"saved trained params under {save_dir}", flush=True)

    def build(hn_params, gn_params):
        return EgoEgoPipeline(
            diffusion=diff, diffusion_params=s2_trained, stats=ds2.stats,
            rest_offsets=jnp.asarray(rest),
            headnet=headnet, headnet_params=hn_params,
            gravitynet=gravitynet, gravitynet_params=gn_params,
        )

    pipe = build(hn_trained, gn_trained)
    gq, gp, fk_head_pose = gt_from_smpl_params(
        pipe, motion["trans"], motion["root_orient"], motion["body_pose"]
    )
    record_head_pose = np.asarray(rec["head_pose"][:-1], np.float32)

    results = {}

    # stage-1 head-pose metrics, trained vs random (eval_egoego.py:297-312)
    for tag, hn, gn in (("trained", hn_trained, gn_trained),
                        ("random", hn_random, gn_random)):
        s1 = build(hn, gn).stage1_head_pose(rec)
        hp = np.asarray(s1["head_pose"])
        t = min(hp.shape[0], record_head_pose.shape[0])
        hd, hrd, hte = stage1_metrics(hp[:t], record_head_pose[:t])
        # hd/hrd are the reference's Frobenius-norm pose/rotation distances
        # (eval_egoego.py s1_e_head / s1_o_head); hte is mm
        results[f"stage1_{tag}"] = {
            "head_pose_frob": round(hd, 4), "head_rot_frob": round(hrd, 4),
            "head_traj_err_mm": round(hte, 2),
            "pred_scale": round(float(np.asarray(s1["pred_scale"])), 4),
        }
        results[f"_hp_{tag}"] = hp  # conditioning for the e2e pass below

    # end-to-end MPJPE under the four conditioning regimes
    # (demo floor offset: run_egoego.py:136)
    conds = {
        "stage1_trained": results.pop("_hp_trained"),
        "stage1_random": results.pop("_hp_random"),
        "gt_record_head": record_head_pose,
        "gt_fk_head": np.asarray(fk_head_pose),
    }
    for tag, hp in conds.items():
        hp = np.array(hp, np.float32)
        if tag.startswith("stage1"):
            hp[:, 2] += -0.13
        md, _ = evaluate_sequence(
            pipe, hp, gq, gp, jax.random.PRNGKey(7), sample_bs=1
        )
        results[f"e2e_{tag}"] = {
            "mpjpe_mm": round(float(md["mpjpe"]), 2),
            "head_trans_dist_mm": round(float(md["head_trans_dist"]), 2),
            "pred_fs_mm": round(float(md["pred_fs"]), 2),
        }
        print(f"e2e {tag}: {results[f'e2e_{tag}']}", flush=True)

    print(json.dumps({
        "metric": "full-system capability check (demo sequence, all models "
                  "trained from scratch)",
        "s1_steps": s1_steps, "s2_steps": s2_steps,
        **results,
    }))


if __name__ == "__main__":
    main()
