"""Capability run: train the AR policy in the vectorized kinematic env to
metric-grade expert tracking (VERDICT r2 item 4).

The reference's kinematic-policy baselines (AgentAR over statear
policy_specs, kinpoly/relive/core/agent_ar.py) train a per-dataset policy
to track expert motion.  This tool reproduces that capability end to end on
REAL bundled motion:

  1. the reference demo sequence (test_data/ares/demo_ares_data.p, 140
     frames of AMASS-retargeted human motion) is converted to a kinpoly
     expert record (qpos/qvel/head_pose/head_vels) via preprocess/qpos.py
  2. PPO trains the 80-dim AR policy in the vectorized kinematic env with a
     REFERENCE statear config's policy_specs (dynamic_supervision_v3 reward
     + its shipped weights — baseline_kinpoly_of_only_on_syn_amass_v1.yml),
     random window starts (StateARDataset train mode)
  3. capability eval: a DETERMINISTIC (mean-action) rollout over the FULL
     140-frame sequence — longer than any training window — scoring
     per-frame FK MPJPE (root-centered, mm, metric-suite convention),
     global-frame MPJPE, and head distance vs the expert

Prints a JSON line; record the result in BASELINE.md.

  python tools/train_kinematic_tracking.py                # 400 iters
  KIN_ITERS=50 KIN_ENVS=8 python tools/train_kinematic_tracking.py

Round-4 addition — CROSS-TAKE mode (KIN_CROSS_TAKE=1): the statear
protocol holds out whole TAKES, not spans
(kinpoly/relive/data_loaders/statear_smpl_dataset.py:31 train/test take
lists).  The bundle carries two real motions: the demo take (140 frames,
locomotion) and kinpoly/sample_data/standing_neutral.pkl (187 frames,
gentle standing sway; no root translation in the pickle, so the rest
qpos's root position is held constant when building its expert record).
Cross-take mode trains on one take and cold-start-evaluates on the OTHER
(both directions), the genuine generalization number the within-take
holdout (KIN_HOLDOUT) cannot give."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

DEMO = "/root/reference/test_data/ares/demo_ares_data.p"
NEUTRAL = "/root/reference/kinpoly/sample_data/standing_neutral.pkl"
CFG = ("/root/reference/kinpoly/config/statear/"
       "baseline_kinpoly_of_only_on_syn_amass_v1.yml")


def neutral_expert_record(rest_offsets):
    """kinpoly's bundled standing_neutral.pkl (pose_aa (T, 72) SMPL local
    axis-angle + one rest qpos; the reset pose asset of
    kinpoly/relive/envs/humanoid_ar_v1.py) -> expert record through the same
    motion_to_expert codec as the demo take.  The pickle has no root
    translation track, so the rest qpos's root position is held constant;
    the take's content is joint-space motion (gentle standing sway)."""
    import joblib

    from egoego_release_tpu.preprocess.qpos import motion_to_expert

    d = joblib.load(NEUTRAL)
    pose_aa22 = np.asarray(d["pose_aa"], np.float32).reshape(-1, 24, 3)[:, :22]
    trans = np.tile(np.asarray(d["qpos"][:3], np.float32),
                    (pose_aa22.shape[0], 1))
    rec = motion_to_expert(trans, pose_aa22, np.asarray(rest_offsets))
    rec["seq_name"] = "standing_neutral"
    return rec


def eval_tracking(env, agent, state, expert_rec, rest_offsets, start=0):
    """Deterministic mean-action rollout from frame `start` to the end of
    the sequence; per-frame FK error vs the expert.  `start>0` rolls from
    the expert's state at that frame (zero initial velocity, matching the
    reference's cold-start rollout at a take boundary)."""
    from egoego_release_tpu.rl.env import EnvState
    from egoego_release_tpu.models.trajar import QVEL_DIM

    qpos_e = jnp.asarray(expert_rec["qpos"])[:, None]        # (T, 1, 76)
    head_e = jnp.asarray(expert_rec["head_pose"])[:, None]
    hvel_e = jnp.asarray(expert_rec["head_vels"])[:, None]
    t_total = qpos_e.shape[0]
    expert = {"qpos": qpos_e, "head_pose": head_e, "head_vels": hvel_e}
    expert = env.prepare_expert(expert)

    from egoego_release_tpu.models.trajar import step_qpos

    def step_fn(carry, _):
        env_state = carry
        obs = env.obs(env_state, expert)
        mean, _ = agent.policy.apply(state["policy"], obs)
        # free rollout: no fail_safe freeze (env.step latches done at
        # head_dist>0.5 m, which would freeze the pose and corrupt the
        # tracking metric); the capability claim is the raw rollout
        act = jnp.clip(mean, -20.0, 20.0)
        nq, nv = step_qpos(env_state.qpos, act)
        env_state = EnvState(qpos=nq, qvel=nv, t=env_state.t + 1,
                             done=env_state.done)
        return env_state, env_state.qpos

    init = EnvState(
        qpos=qpos_e[start],
        qvel=jnp.zeros((1, QVEL_DIM)),
        t=jnp.full((1,), start, jnp.int32),
        done=jnp.zeros((1,), bool),
    )
    _, qpos_traj = jax.lax.scan(step_fn, init, None, length=t_total - 1 - start)
    qpos_traj = jnp.concatenate(
        [qpos_e[start:start + 1], qpos_traj], axis=0)[:, 0]  # (T-start, 76)

    _, pred_jpos = env._body_pose(qpos_traj)
    _, gt_jpos = env._body_pose(qpos_e[start:, 0])
    # root-centered MPJPE x1000 (eval_metrics_imu_rec.py:297-301 convention)
    pred_c = pred_jpos - pred_jpos[:, 0:1]
    gt_c = gt_jpos - gt_jpos[:, 0:1]
    per_frame = jnp.linalg.norm(pred_c - gt_c, axis=-1).mean(axis=-1) * 1000.0
    mpjpe = float(per_frame.mean())
    g_mpjpe = float(jnp.linalg.norm(pred_jpos - gt_jpos, axis=-1).mean() * 1000.0)
    head_dist = float(
        jnp.linalg.norm(pred_jpos[:, 15] - gt_jpos[:, 15], axis=-1).mean() * 1000.0
    )
    return {"mpjpe_mm": mpjpe, "global_mpjpe_mm": g_mpjpe,
            "head_dist_mm": head_dist,
            "per_frame_mpjpe_mm": np.asarray(per_frame)}


def bc_pretrain(env, agent, expert_rec, key, steps=2000, lr=1e-3):
    """Supervised pretraining of the actor mean on expert transitions (the
    role of the reference's ARNet supervised stage that AgentAR fine-tunes):
    obs_t -> inverse_step_qpos(qpos_t, qpos_{t+1}), exact by construction
    (tests/test_trajar.py::test_inverse_step_qpos_roundtrip).

    expert_rec: one expert record OR a list of records — a list trains ONE
    policy JOINTLY on every take (the statear multi-take protocol,
    statear_smpl_dataset.py:31: windows are sampled across the cfg take
    list): phase 1 concatenates all takes' (obs, target) pairs into one
    regression batch; phase 2 runs the closed-loop scan per take and
    averages the losses."""
    import optax

    from egoego_release_tpu.models.trajar import inverse_step_qpos
    from egoego_release_tpu.rl.env import EnvState

    recs = expert_rec if isinstance(expert_rec, (list, tuple)) else [expert_rec]

    obs_parts, target_parts, take_tensors = [], [], []
    for rec in recs:
        qpos = jnp.asarray(rec["qpos"])          # (T, 76)
        qvel_fd = jnp.asarray(rec["qvel"])       # (T-1, 75): vel t -> t+1
        t_total = qpos.shape[0]
        b = t_total - 1
        # state velocity at step t = the velocity that PRODUCED qpos_t
        # (zero at 0)
        qvel = jnp.concatenate(
            [jnp.zeros((1, qvel_fd.shape[1])), qvel_fd], axis=0
        )
        # every expert step becomes one "env" in the batch (t indexes the
        # expert)
        expert = {
            k: jnp.repeat(jnp.asarray(rec[k])[:, None], b, axis=1)
            for k in ("qpos", "head_pose", "head_vels")
        }
        state = EnvState(
            qpos=qpos[:-1], qvel=qvel[:b],
            t=jnp.arange(b, dtype=jnp.int32), done=jnp.zeros((b,), bool),
        )
        obs_parts.append(env.obs(state, expert))
        target_parts.append(inverse_step_qpos(qpos[:-1], qpos[1:]))
        take_tensors.append((qpos, qvel, b))
    obs = jnp.concatenate(obs_parts, axis=0)
    target = jnp.concatenate(target_parts, axis=0)

    params = agent.policy.init(key, obs[:1])
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def bc_step(params, opt_state):
        def loss_fn(p):
            mean, _ = agent.policy.apply(p, obs)
            return jnp.mean((mean - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(steps):
        params, opt_state, loss = bc_step(params, opt_state)

    # phase 2 — CLOSED-LOOP supervision (the reference ARNet's scheduled
    # sampling, traj_ar_smpl_net.py forward): roll the policy's own states
    # and supervise each step toward the action that reaches the NEXT expert
    # frame from the CURRENT (drifted) state; dynamics are stop_gradient
    # (DAgger-style), so open-loop compounding error becomes training signal.
    # Multi-take: one scan per take inside the same loss (the python loop
    # unrolls at trace time; takes have fixed, distinct lengths).
    from egoego_release_tpu.models.trajar import step_qpos

    take_cl = []
    for rec, (tq, tv, tb) in zip(recs, take_tensors):
        take_cl.append((
            {k: jnp.asarray(rec[k])[:, None]
             for k in ("qpos", "head_pose", "head_vels")},
            tq, tv, tb,
        ))

    cl_steps = max(steps // 2, 50)
    cl_opt = optax.adam(
        optax.cosine_decay_schedule(lr * 0.3, cl_steps, alpha=0.05)
    )
    cl_opt_state = cl_opt.init(params)

    @jax.jit
    def closed_loop_step(params, cl_opt_state):
        def take_loss(p, expert_b1, qpos, qvel, b):
            def step_fn(carry, t):
                st = carry
                o = env.obs(st, expert_b1)
                mean, _ = agent.policy.apply(p, o)
                tgt = inverse_step_qpos(st.qpos, qpos[t + 1][None])
                # cap the corrective-velocity targets: from a drifted state
                # the exact inverse angv can reach pi/dt ~ 94 rad/s, and
                # those outliers dominate the gradient; +-12 is a bounded
                # correction rate that still closes any gap in a few frames
                tgt = jnp.clip(tgt, -12.0, 12.0)
                # weight the 6 root-velocity dims: global xy/heading come
                # ONLY from integrating them (step_qpos ignores the quat
                # slots), so they control all long-horizon drift
                w = jnp.ones((80,)).at[74:].set(5.0)
                l = jnp.mean(w * (mean - tgt) ** 2)
                # clip the propagated action: an out-of-distribution state
                # early in closed-loop training can otherwise runaway-amplify
                # through the qvel obs terms (x30/step) to inf
                act = jnp.clip(jax.lax.stop_gradient(mean), -20.0, 20.0)
                nq, nv = step_qpos(st.qpos, act)
                st = EnvState(qpos=nq, qvel=nv, t=st.t + 1, done=st.done)
                return st, l

            init = EnvState(
                qpos=qpos[:1], qvel=jnp.zeros((1, qvel.shape[1])),
                t=jnp.zeros((1,), jnp.int32), done=jnp.zeros((1,), bool),
            )
            _, ls = jax.lax.scan(step_fn, init, jnp.arange(b))
            return ls.mean()

        def loss_fn(p):
            losses = [take_loss(p, e, tq, tv, tb)
                      for (e, tq, tv, tb) in take_cl]
            return jnp.mean(jnp.stack(losses))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, cl_opt_state = cl_opt.update(grads, cl_opt_state)
        return optax.apply_updates(params, updates), cl_opt_state, loss

    for i in range(cl_steps):
        params, cl_opt_state, loss = closed_loop_step(params, cl_opt_state)
        if (i + 1) % max(cl_steps // 8, 1) == 0:
            print(f"  closed-loop {i + 1}/{cl_steps}: loss {float(loss):.4f}",
                  flush=True)
    return params, float(loss)


def trim_record(rec: dict, n: int) -> dict:
    """First-n-frames view of an expert record: arrays with leading dim T
    slice to n, finite-difference arrays (leading dim T-1) to n-1."""
    t = rec["qpos"].shape[0]
    out = {}
    for k, v in rec.items():
        if isinstance(v, np.ndarray) and v.ndim >= 1 and v.shape[0] == t:
            out[k] = v[:n]
        elif isinstance(v, np.ndarray) and v.ndim >= 1 and v.shape[0] == t - 1:
            out[k] = v[:n - 1]
        else:
            out[k] = v
    return out


def main():
    # CPU-pinned like tools/train_physics_controller.py: this workload is
    # thousands of tiny per-step jitted calls (BC scans, per-iter PPO), so
    # axon tunnel round trips would dominate — and a long-running TPU
    # client would also starve any concurrent bench of the single chip
    # (one client at a time; a held chip is indistinguishable from the
    # listening-but-sick relay mode to a prober).  The tracking metric is
    # hardware-independent.
    jax.config.update("jax_platforms", "cpu")

    from egoego_release_tpu.preprocess.qpos import convert_motion_pickle
    from egoego_release_tpu.rl import train_agent as ta

    iters = int(os.environ.get("KIN_ITERS", "400"))
    num_envs = int(os.environ.get("KIN_ENVS", "32"))
    seed = int(os.environ.get("KIN_SEED", "0"))
    bc_steps = int(os.environ.get("KIN_BC_STEPS", "2000"))
    # KIN_HOLDOUT=n trains on frames [0, n) ONLY and reports the tracking
    # error on the unseen span [n, T) two ways (VERDICT r3 item 4):
    # continuation of the full-sequence rollout past the training boundary,
    # and a cold-start rollout beginning AT the boundary (an unseen pseudo-
    # take, the statear held-out-take protocol scaled to the single bundled
    # sequence — statear_smpl_dataset.py:31 train/test take lists)
    holdout = int(os.environ.get("KIN_HOLDOUT", "0"))
    cross_take = os.environ.get("KIN_CROSS_TAKE", "") == "1"
    multi_take = os.environ.get("KIN_MULTI_TAKE", "") == "1"

    rng = np.random.RandomState(0)
    rest = np.concatenate(
        [np.zeros((1, 3)), rng.uniform(-0.2, 0.2, (21, 3))]
    ).astype(np.float32)

    expert_path = "/tmp/_kin_expert.p"
    convert_motion_pickle(DEMO, expert_path, rest)

    import joblib

    expert_rec = list(joblib.load(expert_path).values())[0]

    if multi_take:
        # VERDICT r4 #3: train ONE policy on MULTIPLE takes (the statear
        # protocol trains across cfg-resolved take LISTS,
        # statear_smpl_dataset.py:31) and evaluate held-out.  Take list =
        # the two bundled real takes + mirror/heading-rotation augmented
        # variants built with preprocess/augment.py (the augment_amass.py
        # port).  Three protocols:
        #   A joint-real: train jointly on [demo, standing_neutral]; does
        #     one policy hold BOTH takes near the single-take numbers?
        #   B heldout-take (both directions): train jointly on
        #     [take, take_flip, take_rot], cold-start eval the OTHER real
        #     take — upgrade of the round-4 single-take cross-take rows
        #     (70.2 / 123.6 mm)
        #   C take-list PPO: ta.train over the multi-take expert pickle
        #     through StateARDataset(takes=...) — the take-list TRAINING
        #     path, previously exercised only by eval
        from egoego_release_tpu.preprocess.augment import (
            _aa_to_matrix_np,
            _matrix_to_aa_np,
            flip_smpl,
        )
        from egoego_release_tpu.preprocess.qpos import motion_to_expert

        def demo_motion():
            d = joblib.load(DEMO)
            rec = d if "trans" in d else list(d.values())[0]
            trans = np.asarray(rec["trans"], np.float32)
            aa22 = np.concatenate(
                [np.asarray(rec["root_orient"], np.float32),
                 np.asarray(rec["body_pose"], np.float32)], axis=-1
            ).reshape(trans.shape[0], 22, 3)
            return trans, aa22

        def neutral_motion():
            d = joblib.load(NEUTRAL)
            aa22 = np.asarray(d["pose_aa"], np.float32).reshape(
                -1, 24, 3)[:, :22]
            trans = np.tile(np.asarray(d["qpos"][:3], np.float32),
                            (aa22.shape[0], 1))
            return trans, aa22

        def flip_take(trans, aa22):
            """Sagittal mirror: joints via flip_smpl (R -> SRS + left/right
            swap), root path via S t (kept anchored at the original start)."""
            t = trans.shape[0]
            aa24 = np.concatenate(
                [aa22, np.zeros((t, 2, 3), aa22.dtype)], axis=1
            ).reshape(t, 72)
            aa_f = flip_smpl(aa24).reshape(t, 24, 3)[:, :22].astype(np.float32)
            tr = trans * np.array([-1, 1, 1], np.float32)
            tr = tr - tr[0:1] + trans[0:1]
            return tr, aa_f

        def rot_take(trans, aa22, angle=np.pi / 4):
            """Global heading rotation: Rz pre-multiplies the root orient
            and rotates the root path about its start."""
            rz = _aa_to_matrix_np(np.array([[0.0, 0.0, angle]]))[0]
            tr = (trans - trans[0:1]) @ rz.T + trans[0:1]
            root = _aa_to_matrix_np(aa22[:, 0])
            root_r = _matrix_to_aa_np(rz[None] @ root).astype(np.float32)
            aa_r = np.array(aa22, copy=True)
            aa_r[:, 0] = root_r
            return tr.astype(np.float32), aa_r

        motions = {"demo": demo_motion(), "standing_neutral": neutral_motion()}
        for name in ("demo", "standing_neutral"):
            tr, aa = motions[name]
            motions[f"{name}_flip"] = flip_take(tr, aa)
            motions[f"{name}_rot"] = rot_take(tr, aa)
        takes = {}
        for name, (tr, aa) in motions.items():
            rec = motion_to_expert(tr, aa, rest)
            rec["seq_name"] = name
            takes[name] = rec

        cfg = ta.KinpolyConfig(CFG)
        env, agent = ta.build_from_config(cfg, rest, num_envs)
        state0 = agent.init_state(jax.random.PRNGKey(seed))

        def ev(params, rec):
            return eval_tracking(env, agent, {"policy": params}, rec, rest)

        result = {
            "metric": "kinematic AR-policy MULTI-TAKE training (joint BC "
                      "closed-loop across take lists; statear protocol)",
            "bc_steps": bc_steps,
            "take_frames": {k: int(v["qpos"].shape[0])
                            for k, v in takes.items()},
        }

        # A: joint training on the two REAL takes
        t0 = time.time()
        params_ab, _ = bc_pretrain(
            env, agent, [takes["demo"], takes["standing_neutral"]],
            jax.random.PRNGKey(seed), steps=bc_steps,
        )
        result["joint_real"] = {
            "bc_seconds": round(time.time() - t0, 1),
            "demo_mpjpe_mm": round(ev(params_ab, takes["demo"])["mpjpe_mm"], 2),
            "standing_neutral_mpjpe_mm":
                round(ev(params_ab, takes["standing_neutral"])["mpjpe_mm"], 2),
        }
        print(f"joint_real: {result['joint_real']}", flush=True)

        # B: joint on [real, flip, rot] -> cold-start the OTHER real take
        result["heldout_take"] = {}
        for train_name, test_name in (("demo", "standing_neutral"),
                                      ("standing_neutral", "demo")):
            t0 = time.time()
            train_list = [takes[train_name], takes[f"{train_name}_flip"],
                          takes[f"{train_name}_rot"]]
            params_b, _ = bc_pretrain(
                env, agent, train_list, jax.random.PRNGKey(seed),
                steps=bc_steps,
            )
            seen = ev(params_b, takes[train_name])
            held = ev(params_b, takes[test_name])
            held0 = ev(state0["policy"], takes[test_name])
            result["heldout_take"][f"{train_name}+aug->{test_name}"] = {
                "bc_seconds": round(time.time() - t0, 1),
                "seen_take_mpjpe_mm": round(seen["mpjpe_mm"], 2),
                "heldout_take_mpjpe_mm": round(held["mpjpe_mm"], 2),
                "heldout_take_global_mpjpe_mm":
                    round(held["global_mpjpe_mm"], 2),
                "heldout_take_untrained_mpjpe_mm":
                    round(held0["mpjpe_mm"], 2),
            }
            print(f"{train_name}+aug->{test_name}: "
                  f"{result['heldout_take'][f'{train_name}+aug->{test_name}']}",
                  flush=True)

        # C: the take-list TRAINING path — PPO over the multi-take pickle
        # through StateARDataset(takes=...), warm-started from A's policy
        multi_path = "/tmp/_kin_expert_multi.p"
        joblib.dump(takes, multi_path)
        ppo_iters = int(os.environ.get("KIN_ITERS", "20"))
        out = ta.train(
            CFG, multi_path, rest, iters=ppo_iters, num_envs=num_envs,
            seed=seed, log_every=max(ppo_iters // 4, 1),
            init_policy_params=params_ab,
            takes=["demo", "standing_neutral"],
        )
        rewards = [h["reward_mean"] for h in out["history"]]
        result["take_list_ppo"] = {
            "iters": ppo_iters,
            "takes": ["demo", "standing_neutral"],
            "reward_first": round(float(rewards[0]), 4),
            "reward_last": round(float(rewards[-1]), 4),
            "demo_mpjpe_mm":
                round(ev(out["state"]["policy"], takes["demo"])["mpjpe_mm"], 2),
            "standing_neutral_mpjpe_mm":
                round(ev(out["state"]["policy"],
                         takes["standing_neutral"])["mpjpe_mm"], 2),
        }
        print(json.dumps(result))
        return

    if cross_take:
        if "KIN_ITERS" in os.environ or holdout:
            print("KIN_CROSS_TAKE=1 is BC-only (the convergence recipe: "
                  "PPO is net harmful on top of converged BC — BASELINE.md)"
                  "; ignoring KIN_ITERS/KIN_HOLDOUT", flush=True)
        cfg = ta.KinpolyConfig(CFG)
        env, agent = ta.build_from_config(cfg, rest, num_envs)
        takes = {"demo": expert_rec, "standing_neutral": neutral_expert_record(rest)}
        state0 = agent.init_state(jax.random.PRNGKey(seed))
        directions = {}
        for train_name, test_name in (("demo", "standing_neutral"),
                                      ("standing_neutral", "demo")):
            t0 = time.time()
            params, bc_loss = bc_pretrain(
                env, agent, takes[train_name], jax.random.PRNGKey(seed),
                steps=bc_steps,
            )
            st = {"policy": params}
            seen = eval_tracking(env, agent, st, takes[train_name], rest)
            held = eval_tracking(env, agent, st, takes[test_name], rest)
            held0 = eval_tracking(env, agent, state0, takes[test_name], rest)
            directions[f"{train_name}->{test_name}"] = {
                "bc_seconds": round(time.time() - t0, 1),
                "bc_loss": round(bc_loss, 6),
                "seen_take_mpjpe_mm": round(seen["mpjpe_mm"], 2),
                "heldout_take_mpjpe_mm": round(held["mpjpe_mm"], 2),
                "heldout_take_global_mpjpe_mm":
                    round(held["global_mpjpe_mm"], 2),
                "heldout_take_untrained_mpjpe_mm":
                    round(held0["mpjpe_mm"], 2),
            }
            print(f"{train_name}->{test_name}: "
                  f"{directions[f'{train_name}->{test_name}']}", flush=True)
        print(json.dumps({
            "metric": "kinematic AR-policy CROSS-TAKE tracking (BC closed-"
                      "loop train on one take, cold-start eval on the "
                      "other; statear held-out-take protocol)",
            "bc_steps": bc_steps,
            "take_frames": {k: int(v["qpos"].shape[0])
                            for k, v in takes.items()},
            "directions": directions,
        }))
        return
    train_rec = expert_rec
    if holdout > 0:
        train_rec = trim_record(expert_rec, holdout)
        train_path = "/tmp/_kin_expert_train.p"
        joblib.dump({train_rec.get("seq_name", "take"): train_rec}, train_path)
    else:
        train_path = expert_path
    cfg = ta.KinpolyConfig(CFG)
    env, agent = ta.build_from_config(cfg, rest, num_envs)

    t0 = time.time()
    bc_params, bc_loss = bc_pretrain(
        env, agent, train_rec, jax.random.PRNGKey(seed), steps=bc_steps
    )
    bc_time = time.time() - t0
    bc_state = {"policy": bc_params}
    metrics_bc = eval_tracking(env, agent, bc_state, expert_rec, rest)
    print(f"BC: {bc_steps} steps, loss {bc_loss:.6f}, tracking "
          f"{ {k: round(v, 2) for k, v in metrics_bc.items() if not isinstance(v, np.ndarray)} }",
          flush=True)

    t0 = time.time()
    if iters > 0:
        out = ta.train(
            CFG, train_path, rest, iters=iters, num_envs=num_envs, seed=seed,
            log_every=max(iters // 10, 1), init_policy_params=bc_params,
        )
    else:
        out = {"state": {"policy": bc_params}, "history": [{"reward_mean": 0.0}]}
    train_time = time.time() - t0

    # capability eval: deterministic rollout over the FULL 140-frame
    # sequence (training windows are fr_num=100 with random starts)
    metrics = eval_tracking(env, agent, out["state"], expert_rec, rest)

    # untrained-policy reference point (no BC, no PPO)
    state0 = agent.init_state(jax.random.PRNGKey(seed))
    metrics0 = eval_tracking(env, agent, state0, expert_rec, rest)

    def summarize(m):
        return {k: round(v, 2) for k, v in m.items()
                if not isinstance(v, np.ndarray)}

    result = {
        "metric": "kinematic AR-policy expert tracking "
                  "(BC pretrain + PPO fine-tune, dynamic_supervision_v3, "
                  "demo sequence 140 frames)",
        "iters": iters,
        "num_envs": num_envs,
        "bc_steps": bc_steps,
        "bc_seconds": round(bc_time, 1),
        "train_seconds": round(train_time, 1),
        "tracking_bc": summarize(metrics_bc),
        "tracking_final": summarize(metrics),
        "tracking_untrained": summarize(metrics0),
    }
    rewards = [h["reward_mean"] for h in out["history"]]
    result["reward_first10"] = round(float(np.mean(rewards[:10])), 4)
    result["reward_last10"] = round(float(np.mean(rewards[-10:])), 4)

    if holdout > 0:
        pf = metrics["per_frame_mpjpe_mm"]
        # held-out continuation: the full-rollout frames past the boundary
        cold = eval_tracking(env, agent, out["state"], expert_rec, rest,
                             start=holdout)
        result["holdout"] = {
            "train_frames": holdout,
            "seen_span_mpjpe_mm": round(float(pf[:holdout].mean()), 2),
            "unseen_tail_mpjpe_mm": round(float(pf[holdout:].mean()), 2),
            "cold_start_unseen_mpjpe_mm": round(cold["mpjpe_mm"], 2),
            "cold_start_unseen_global_mpjpe_mm":
                round(cold["global_mpjpe_mm"], 2),
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
