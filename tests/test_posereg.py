"""Posereg baseline family (VideoRegNet): shapes, causality, learning."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from egoego_release_tpu.models.posereg import VideoRegNet, posereg_loss


def _data(rng, b=2, t=10, d=32):
    return rng.randn(b, t, d).astype(np.float32)


def test_videoregnet_lstm_shapes():
    rng = np.random.RandomState(0)
    x = jnp.asarray(_data(rng))
    net = VideoRegNet(out_dim=7, v_hdim=16, cnn_fdim=32, mlp_dim=(24, 12))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out.shape == (2, 10, 7)
    assert np.isfinite(np.asarray(out)).all()


def test_videoregnet_tcn_causality():
    """causal TCN: changing a future frame must not affect earlier outputs;
    the bidirectional LSTM must (it sees the whole sequence)."""
    rng = np.random.RandomState(1)
    x = _data(rng, b=1, t=12)
    x2 = x.copy()
    x2[:, -1] += 10.0

    tcn = VideoRegNet(out_dim=5, v_hdim=16, cnn_fdim=32, v_net_type="tcn",
                      causal=True, mlp_dim=(16,))
    p = tcn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    a = np.asarray(tcn.apply(p, jnp.asarray(x)))
    b = np.asarray(tcn.apply(p, jnp.asarray(x2)))
    np.testing.assert_allclose(a[:, :-1], b[:, :-1], atol=1e-6)
    assert np.abs(a[:, -1] - b[:, -1]).max() > 1e-4

    bi = VideoRegNet(out_dim=5, v_hdim=16, cnn_fdim=32, mlp_dim=(16,))
    p = bi.init(jax.random.PRNGKey(0), jnp.asarray(x))
    a = np.asarray(bi.apply(p, jnp.asarray(x)))
    b = np.asarray(bi.apply(p, jnp.asarray(x2)))
    assert np.abs(a[:, 0] - b[:, 0]).max() > 1e-6  # backward pass propagates


def test_videoregnet_learns():
    """A few gradient steps reduce the squared-error loss
    (video_reg_net.py compute_loss semantics)."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(_data(rng, b=4, t=8, d=16))
    target = jnp.asarray(rng.randn(4, 8, 3).astype(np.float32) * 0.1)

    net = VideoRegNet(out_dim=3, v_hdim=16, cnn_fdim=16, mlp_dim=(16,))
    params = net.init(jax.random.PRNGKey(0), x)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(
            lambda p: posereg_loss(net.apply(p, x), target)
        )(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    params, opt_state, loss0 = step(params, opt_state)
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state)
    assert float(loss) < 0.3 * float(loss0)


def test_train_posereg_cli_overfits(tmp_path):
    """training/train_posereg.py (exp_pose_reg.py port): loss drops on a tiny
    fixture, checkpoint written, of-feats via separate pickle (of_file
    contract) work."""
    import joblib
    import os

    from egoego_release_tpu.training.train_posereg import parse_opt, run

    rng = np.random.RandomState(0)
    t, f = 16, 24
    rec = {"qpos": rng.randn(t, 76).astype(np.float32) * 0.1,
           "seq_name": "s1-take1"}
    expert = str(tmp_path / "mocap_annotations.p")
    joblib.dump({"s1-take1": rec}, expert)
    of = str(tmp_path / "mocap_img_feats.p")
    joblib.dump({"s1-take1": rng.randn(t, f).astype(np.float32)}, of)

    opt = parse_opt([
        "--expert_path", expert, "--of_feats_path", of,
        "--fr_num", "8", "--v_hdim", "16", "--epochs", "1",
        "--batch_size", "2", "--lr", "3e-3",
        "--save_dir", str(tmp_path / "ckpt"), "--save_interval", "1",
    ])
    first = run(opt)
    opt2 = parse_opt([
        "--expert_path", expert, "--of_feats_path", of,
        "--fr_num", "8", "--v_hdim", "16", "--epochs", "12",
        "--batch_size", "2", "--lr", "3e-3",
    ])
    last = run(opt2)
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first
    assert os.path.isdir(tmp_path / "ckpt" / "epoch_1")
