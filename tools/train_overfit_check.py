"""End-to-end stage-2 learning check (the BASELINE.md round-2 loop, now a
reproducible tool): train the FULL release stage-2 model on the bundled
demo sequence's windows, then run GT-head-conditioned canonical
sliding-window sampling + FK + the metric suite, comparing random-init vs
trained MPJPE.  Closes train -> EMA -> canonical chain -> FK -> metrics on
real data and real hardware.

  python tools/train_overfit_check.py                 # 4000 steps, ~10 min
  OVERFIT_STEPS=500 OVERFIT_BS=32 python tools/train_overfit_check.py
  OVERFIT_REMAT=1 OVERFIT_BS=128 ...                  # round-3 remat config
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

DEMO = "/root/reference/test_data/ares/demo_ares_data.p"
STATS = "/root/reference/test_data/ares/cano_min_max_mean_std_data_window_120.p"


def main():
    jax.config.update("jax_default_prng_impl", "rbg")

    from egoego_release_tpu.data.amass import AMASSWindowDataset
    from egoego_release_tpu.data.formats import load_motion_dict
    from egoego_release_tpu.diffusion import CondGaussianDiffusion, DiffusionConfig
    from egoego_release_tpu.eval import metrics as metrics_mod
    from egoego_release_tpu.eval.pipeline import EgoEgoPipeline, gt_from_smpl_params
    from egoego_release_tpu.training.trainer_diffusion import DiffusionTrainer

    steps = int(os.environ.get("OVERFIT_STEPS", "4000"))
    bs = int(os.environ.get("OVERFIT_BS", "32"))
    accum = int(os.environ.get("OVERFIT_ACCUM", "2"))
    remat = os.environ.get("OVERFIT_REMAT", "0") == "1"

    rng = np.random.RandomState(0)
    rest = np.concatenate(
        [np.zeros((1, 3)), rng.uniform(-0.2, 0.2, (21, 3))]
    ).astype(np.float32)

    cfg = dataclasses.replace(DiffusionConfig(), remat=remat)
    diff = CondGaussianDiffusion(cfg)
    trainer = DiffusionTrainer(diff, grad_accum=accum)
    state = trainer.init_state(jax.random.PRNGKey(0))

    ds = AMASSWindowDataset(DEMO, rest, window=cfg.window, stats_path=STATS)
    print(f"windows: {len(ds)}")
    batches = ds.batch_iterator(bs * accum, jax.random.PRNGKey(1))

    rec = list(load_motion_dict(DEMO).values())[0]

    def eval_mpjpe(params, key):
        pipe = EgoEgoPipeline(
            diffusion=diff, diffusion_params=params, stats=ds.stats,
            rest_offsets=jnp.asarray(rest),
        )
        gq, gp, head_pose = gt_from_smpl_params(
            pipe, rec["trans"], rec["root_orient"], rec["body_pose"]
        )
        aa, root = pipe.stage2_generate(head_pose, key, sample_bs=1)
        pj_rot, pj_pos = pipe.fk(root, aa)
        t = min(pj_pos.shape[1], gp.shape[0])
        md = metrics_mod.compute_metrics_for_smpl(
            gq[:t], gp[:t], jnp.float32(0.0),
            pj_rot[0, :t], pj_pos[0, :t], jnp.float32(0.0),
        )
        return float(np.asarray(md["mpjpe"]))

    mpjpe0 = eval_mpjpe(state.params, jax.random.PRNGKey(2))
    print(f"random-init MPJPE: {mpjpe0:.1f} mm", flush=True)

    t0 = time.time()
    key = jax.random.PRNGKey(3)
    for i in range(steps):
        key, sk = jax.random.split(key)
        state, loss = trainer.train_step(state, next(batches), sk)
        if (i + 1) % max(steps // 8, 1) == 0:
            print(f"step {i + 1}/{steps}: loss {float(loss):.5f}", flush=True)
    dt = time.time() - t0

    mpjpe1 = eval_mpjpe(state.ema_params, jax.random.PRNGKey(2))
    print(json.dumps({
        "metric": "stage-2 end-to-end learning check (demo windows)",
        "steps": steps, "micro_bs": bs, "grad_accum": accum, "remat": remat,
        "train_seconds": round(dt, 1),
        "window_grads_per_sec": round(bs * accum * steps / dt, 1),
        "mpjpe_random_init_mm": round(mpjpe0, 2),
        "mpjpe_trained_mm": round(mpjpe1, 2),
    }))


if __name__ == "__main__":
    main()
