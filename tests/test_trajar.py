"""TrajARNet baseline: rollout shapes, integration semantics, training signal."""

import numpy as np
import jax
import jax.numpy as jnp

from egoego_release_tpu.models.trajar import (
    ACTION_DIM,
    QPOS_DIM,
    TrajARNet,
    inverse_step_qpos,
    step_qpos,
    trajar_loss,
)


def synth_data(b=2, t=6, seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(b, t, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    obj = np.zeros((b, t, 7), np.float32); obj[..., 3] = 1.0
    return {
        "head_pose": np.concatenate([rng.randn(b, t, 3).astype(np.float32), q], -1),
        "head_vels": (rng.randn(b, t, 6) * 0.1).astype(np.float32),
        "obj_pose": obj,
        "obj_head_relative_poses": (rng.randn(b, t, 7) * 0.1).astype(np.float32),
    }


def rest_tuple(seed=1):
    rng = np.random.RandomState(seed)
    rest = rng.randn(22, 3).astype(np.float32) * 0.1
    rest[0] = 0
    return tuple(map(tuple, rest.tolist())), rest


def test_step_qpos_integration():
    rng = np.random.RandomState(2)
    qpos = np.zeros((3, QPOS_DIM), np.float32)
    qpos[:, 3] = 1.0
    action = np.zeros((3, ACTION_DIM), np.float32)
    action[:, 74:77] = [1.0, 0.0, 0.0]  # 1 m/s +x root velocity
    nq, nv = step_qpos(jnp.asarray(qpos), jnp.asarray(action))
    np.testing.assert_allclose(np.asarray(nq[:, 0]), 1.0 / 30.0, atol=1e-6)
    # quaternion stays unit
    np.testing.assert_allclose(np.linalg.norm(np.asarray(nq[:, 3:7]), axis=-1), 1.0, atol=1e-5)
    # qvel reflects the applied velocity
    np.testing.assert_allclose(np.asarray(nv[:, 0]), 1.0, atol=1e-4)


def test_inverse_step_qpos_roundtrip():
    """step_qpos(qpos, inverse_step_qpos(qpos, next)) must land exactly on
    next (the supervised-pretraining identity the capability run uses)."""
    rng = np.random.RandomState(3)
    b = 16
    qpos = rng.randn(b, QPOS_DIM).astype(np.float32) * 0.3
    nxt = qpos + rng.randn(b, QPOS_DIM).astype(np.float32) * 0.05
    for arr in (qpos, nxt):
        arr[:, 3:7] /= np.linalg.norm(arr[:, 3:7], axis=-1, keepdims=True)
    action = inverse_step_qpos(jnp.asarray(qpos), jnp.asarray(nxt))
    rec, _ = step_qpos(jnp.asarray(qpos), action)
    rec = np.asarray(rec)
    np.testing.assert_allclose(rec[:, :3], nxt[:, :3], atol=1e-5)
    np.testing.assert_allclose(rec[:, 7:], nxt[:, 7:], atol=1e-6)
    # quats up to sign
    sign = np.sign(np.sum(rec[:, 3:7] * nxt[:, 3:7], axis=-1, keepdims=True))
    np.testing.assert_allclose(rec[:, 3:7], sign * nxt[:, 3:7], atol=1e-5)


def test_trajar_rollout_and_loss():
    rt, rest = rest_tuple()
    model = TrajARNet(rnn_hdim=16, mlp_hsize=(16,), rest_offsets=rt)
    data = {k: jnp.asarray(v) for k, v in synth_data().items()}
    params = model.init(jax.random.PRNGKey(0), data)
    out = model.apply(params, data)
    assert out["qpos"].shape == (2, 6, 76)
    assert out["qvel"].shape == (2, 6, 75)
    assert np.isfinite(np.asarray(out["qpos"])).all()

    gt = np.asarray(out["qpos"]) + 0.05
    loss = trajar_loss(out, jnp.asarray(gt), jnp.asarray(rest))
    assert np.isfinite(float(loss)) and float(loss) > 0

    # gradient flows through the autoregressive rollout
    def loss_fn(p):
        o = model.apply(p, data)
        return trajar_loss(o, jnp.asarray(gt), jnp.asarray(rest))

    g = jax.grad(loss_fn)(params)
    gnorm = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0


def test_trajar_training_cli_overfits(tmp_path):
    import joblib
    from egoego_release_tpu.training.train_trajar import run

    rng = np.random.RandomState(7)
    t = 12
    rec = {
        "qpos": np.tile(np.concatenate([[0, 0, 0.9], [1, 0, 0, 0], np.zeros(69)])[None],
                        (t, 1)).astype(np.float32),
        "qvel": np.zeros((t - 1, 75), np.float32),
        "head_pose": np.tile([0, 0, 1.6, 1, 0, 0, 0], (t, 1)).astype(np.float32),
        "head_vels": np.zeros((t, 6), np.float32),
        "obj_pose": np.tile([0, 0, 0, 1, 0, 0, 0], (t, 1)).astype(np.float32),
        "obj_head_relative_poses": np.zeros((t, 7), np.float32),
        "seq_name": "a",
    }
    path = str(tmp_path / "experts.p")
    joblib.dump({"a": rec}, path)
    _, rest = rest_tuple()

    params = run(path, rest, epochs=3, fr_num=t, batch_size=2, lr=1e-3,
                 rnn_hdim=16, mlp_hsize=(16,), save_dir=str(tmp_path / "out"))
    import os
    assert os.path.exists(tmp_path / "out" / "final")


def test_build_obs_xml_and_step_match_reference_trajarnet():
    """build_obs (MJCF-FK path) and step_qpos vs the reference's OWN
    TrajARNet.get_obs/step methods, bound onto a duck-typed module with the
    reference torch Humanoid as fk_model (mujoco_py shim -> real mujoco 3)."""
    import sys

    import numpy as np
    import pytest

    sys.path.insert(0, "/root/repo/tests")
    import reforacle

    reforacle.add_reference_paths()
    if "/root/reference/kinpoly" not in sys.path:
        sys.path.insert(0, "/root/reference/kinpoly")
    torch = pytest.importorskip("torch")
    pytest.importorskip("mujoco")
    import importlib

    tnet = importlib.import_module("relive.models.traj_ar_smpl_net")
    from relive.utils.torch_smpl_humanoid import Humanoid

    xml = ("/root/reference/kinpoly/assets/mujoco_models/"
           "humanoid_smpl_neutral_mesh.xml")

    class _Duck:
        pass

    ref = _Duck()
    for name in ["get_obs", "step", "set_sim"]:
        setattr(ref, name, getattr(tnet.TrajARNet, name).__get__(ref))
    ref.cfg = _Duck()
    ref.cfg.use_context = False
    ref.cfg.use_of = False
    ref.cfg.use_head = True
    ref.cfg.use_vel = True
    ref.cfg.add_noise = False
    ref.cfg.has_z = True
    ref.mode = "test"
    ref.fk_model = Humanoid(model_file=xml)
    ref.rnn_hdim = 512
    ref.dtype = torch.float64
    ref.device = "cpu"
    ref.sim = {}
    ref.qpos_lm, ref.qvel_lm, ref.pose_start = 74, 75, 7
    ref.pose_delta = False

    rng = np.random.RandomState(13)
    b, t = 2, 3
    qpos = np.zeros((b, 76))
    qpos[:, :3] = rng.randn(b, 3) * 0.2
    quat = rng.randn(b, 4)
    qpos[:, 3:7] = quat / np.linalg.norm(quat, axis=1, keepdims=True)
    qpos[:, 7:] = 0.3 * rng.randn(b, 69)
    qvel = 0.1 * rng.randn(b, 75)
    data = {
        "qpos": np.tile(qpos[:, None], (1, t, 1)),
        "head_pose": np.concatenate(
            [rng.randn(b, t, 3), rng.randn(b, t, 4)], axis=-1),
        "head_vels": rng.randn(b, t, 6),
        "obj_pose": rng.randn(b, t, 7),
        "obj_head_relative_poses": rng.randn(b, t, 7),
    }
    for k in ("head_pose",):
        q = data[k][..., 3:]
        data[k][..., 3:] = q / np.linalg.norm(q, axis=-1, keepdims=True)

    ref.set_sim(torch.from_numpy(qpos), torch.from_numpy(qvel))
    tdata = {k: torch.from_numpy(v) for k, v in data.items()}
    with torch.no_grad():
        ref_obs, _ = ref.get_obs(tdata, 1)

    from egoego_release_tpu.models.trajar import build_obs, step_qpos
    from egoego_release_tpu.ops.mujoco_xml import load_mujoco_skeleton

    skel = load_mujoco_skeleton(xml)
    head_idx = ref.fk_model.get_head_idx()
    data_t = {k: jnp.asarray(v[:, 1], jnp.float32)
              for k, v in data.items()}
    ours = build_obs(
        jnp.asarray(qpos), jnp.asarray(qvel),
        jnp.zeros((b, 0)),  # use_context False: no context block
        data_t, rest_offsets=None, use_vel=True,
        skeleton=skel, head_idx=head_idx)
    assert ours.shape == tuple(ref_obs.shape)
    np.testing.assert_allclose(np.asarray(ours), ref_obs.numpy(), atol=2e-5)

    # step: same action through the reference's step and our step_qpos
    action = rng.randn(b, 80)
    ref.set_sim(torch.from_numpy(qpos), torch.from_numpy(qvel))
    with torch.no_grad():
        ref_next_qpos, ref_next_qvel = ref.step(torch.from_numpy(action))
    nxt, nvel = step_qpos(jnp.asarray(qpos), jnp.asarray(action))
    np.testing.assert_allclose(np.asarray(nxt), ref_next_qpos.numpy(),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(nvel), ref_next_qvel.numpy(),
                               atol=1e-5)


def test_trajar_reference_loss_matches_reference():
    """trajar_reference_loss vs the reference's OWN TrajARNet.compute_loss
    (bound; only self.specs is read)."""
    import sys

    import numpy as np
    import pytest

    sys.path.insert(0, "/root/repo/tests")
    import reforacle

    reforacle.add_reference_paths()
    if "/root/reference/kinpoly" not in sys.path:
        sys.path.insert(0, "/root/reference/kinpoly")
    torch = pytest.importorskip("torch")
    import importlib

    tnet = importlib.import_module("relive.models.traj_ar_smpl_net")
    from egoego_release_tpu.models.trajar import trajar_reference_loss

    rng = np.random.RandomState(19)
    b, t, nb = 2, 5, 24

    def rq(n):
        q = rng.randn(n, 4)
        return (q / np.linalg.norm(q, axis=1, keepdims=True)).astype(np.float32)

    def qpos_seq():
        return np.concatenate([
            rng.randn(b, t, 3).astype(np.float32),
            rq(b * t).reshape(b, t, 4),
            rng.uniform(-1, 1, (b, t, 69)).astype(np.float32),
        ], axis=-1)

    def o2h():
        return np.concatenate([
            rng.randn(b, t, 3).astype(np.float32),
            rq(b * t).reshape(b, t, 4)], axis=-1)

    pred = {
        "qpos": qpos_seq(),
        "qvel": rng.randn(b, t, 75).astype(np.float32),
        "wbpos": rng.randn(b, t, nb * 3).astype(np.float32),
        "obj_2_head": o2h(),
    }
    data = {
        "qpos": qpos_seq(),
        "qvel": rng.randn(b, t, 75).astype(np.float32),
        "wbpos": rng.randn(b, t, nb * 3).astype(np.float32),
        "obj_head_relative_poses": o2h(),
        "target": rng.randn(b, t, 80).astype(np.float32),
    }
    specs = {"w_rp": 30, "w_rr": 40, "w_p": 2, "w_v": 3, "w_ee": 0.5,
             "w_op": 1.5, "w_or": 0.7}

    class _Duck:
        pass

    duck = _Duck()
    duck.specs = specs
    duck.compute_loss = tnet.TrajARNet.compute_loss.__get__(duck)

    feature_pred = {
        "qpos": torch.from_numpy(pred["qpos"]),
        "qvel": torch.from_numpy(pred["qvel"]),
        "pred_wbpos": torch.from_numpy(pred["wbpos"]),
        "obj_2_head": torch.from_numpy(pred["obj_2_head"]),
        "action": torch.from_numpy(rng.randn(b, t, 80).astype(np.float32)),
    }
    tdata = {k: torch.from_numpy(v) for k, v in data.items()}
    with torch.no_grad():
        ref_loss, ref_comps = duck.compute_loss(feature_pred, tdata)

    ours, comps = trajar_reference_loss(
        {k: jnp.asarray(v) for k, v in pred.items()},
        {k: jnp.asarray(v) for k, v in data.items()}, specs)
    np.testing.assert_allclose(float(ours), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose([float(c) for c in comps], ref_comps,
                               rtol=1e-4)
