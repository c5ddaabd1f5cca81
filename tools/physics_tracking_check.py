"""Physics-sim tracking capability: track the demo expert in REAL MuJoCo.

Upgrades the physics-RL story from learning checks (+X% return) to a
metric-grade result, mirroring what UHC/copycat's controller actually does
(kinpoly/copycat: stable-PD + implicit RFC tracking an expert take —
humanoid_im.py step semantics, reproduced in rl/mujoco_env.py):

  1. the bundled demo sequence -> kinpoly qpos expert record
     (preprocess/qpos.py, as in tools/train_kinematic_tracking.py)
  2. OPEN-LOOP stable-PD rollout: each 30 Hz control step PD-tracks the
     expert's NEXT frame as the kinematic target (zero policy residual),
     with/without the implicit residual-force helper (copycat.yml rfc)
  3. score per-frame SIMULATED body positions (mj FK of the rolled state)
     against the expert's FK — root-centered + global MPJPE in mm

This isolates the physics/controller stack itself: the PD gains, torque
computation, RFC and contact handling must keep a 75-DOF humanoid upright
and on-trajectory for 140 frames of real human motion with NO learned
policy.  PPO on top (rl/train_physics_agent.py) learns residuals on this
controller; the reference's own cc policies do the same.

  python tools/physics_tracking_check.py            # both rfc modes
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DEMO = "/root/reference/test_data/ares/demo_ares_data.p"
XML = ("/root/reference/kinpoly/assets/mujoco_models/"
       "humanoid_smpl_neutral_mesh.xml")


def fk_positions(env, qpos):
    """mj FK (no dynamics) of a qpos -> (nbody, 3) world body positions."""
    env.data.qpos[: qpos.shape[0]] = qpos
    env.data.qvel[:] = 0
    env._mj.mj_kinematics(env.model, env.data)
    return env.data.xpos[1:].copy()  # skip world


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")  # host physics, tiny jits

    import joblib

    from egoego_release_tpu.preprocess.qpos import convert_motion_pickle
    from egoego_release_tpu.rl.mujoco_env import MujocoHumanoidEnv

    rng = np.random.RandomState(0)
    rest = np.concatenate(
        [np.zeros((1, 3)), rng.uniform(-0.2, 0.2, (21, 3))]
    ).astype(np.float32)
    expert_path = "/tmp/_phys_expert.p"
    if not os.path.exists(expert_path):
        convert_motion_pickle(DEMO, expert_path, rest)
    rec = list(joblib.load(expert_path).values())[0]
    qpos_e = np.asarray(rec["qpos"], np.float64)
    qvel_e = np.asarray(rec["qvel"], np.float64)
    t_total = qpos_e.shape[0]

    out = {"metric": "physics-sim open-loop stable-PD expert tracking "
                     "(MuJoCo 3, demo sequence %d frames)" % t_total,
           "frames": t_total}
    for rfc in (True, False):
        env = MujocoHumanoidEnv(XML, residual_force=rfc)
        # precompute expert FK once (separate data pass, sim untouched after)
        ref = np.asarray([fk_positions(env, q) for q in qpos_e[1:]])

        env.reset(qpos_e[0], qvel_e[0])
        action = np.zeros(env.action_dim)
        sim = []
        t0 = time.time()
        for t in range(1, t_total):
            env.do_simulation(action, qpos_e[t][7:])
            sim.append(env.get_wbody_pos().reshape(-1, 3))
        wall = time.time() - t0
        sim = np.asarray(sim)

        global_mm = float(np.linalg.norm(sim - ref, axis=-1).mean() * 1000)
        simc = sim - sim[:, 0:1]
        refc = ref - ref[:, 0:1]
        per_frame_root = np.linalg.norm(simc - refc, axis=-1).mean(-1) * 1000
        root_height = float(sim[-1, 0, 2])
        out["rfc" if rfc else "no_rfc"] = {
            "root_centered_mpjpe_mm": round(float(per_frame_root.mean()), 2),
            # pose-control quality while still upright: the root is
            # UNACTUATED, so open-loop PD cannot balance dynamic motion
            # (that is the learned residual's job — copycat cc policies);
            # the early window isolates the joint-tracking stack itself
            "first10_root_centered_mpjpe_mm": round(
                float(per_frame_root[:10].mean()), 2
            ),
            "first30_root_centered_mpjpe_mm": round(
                float(per_frame_root[:30].mean()), 2
            ),
            "global_mpjpe_mm": round(global_mm, 2),
            "final_root_height_m": round(root_height, 3),
            "sim_seconds": round(wall, 1),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
