"""TrajARNet baseline: rollout shapes, integration semantics, training signal."""

import numpy as np
import jax
import jax.numpy as jnp

from egoego_release_tpu.models.trajar import (
    ACTION_DIM,
    QPOS_DIM,
    TrajARNet,
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
