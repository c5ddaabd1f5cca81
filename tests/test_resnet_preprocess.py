"""ResNet-18 encoder + preprocessing CLI tests.

torchvision is not in this image, so the converter oracle is a functional
torch ResNet-18 forward built directly from the (synthetic,
torchvision-layout) state_dict — independent of the flax implementation.
"""

import os

import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from egoego_release_tpu.models.resnet import (
    ResNet18,
    convert_torchvision_resnet18,
    flow_to_input,
)


def make_torchvision_sd(seed=0):
    g = torch.Generator().manual_seed(seed)
    r = lambda *s: torch.randn(*s, generator=g) * 0.05
    sd = {"conv1.weight": r(64, 3, 7, 7)}

    def bn(key, c):
        sd[key + ".weight"] = torch.ones(c) + r(c) * 0.1
        sd[key + ".bias"] = r(c)
        sd[key + ".running_mean"] = r(c)
        sd[key + ".running_var"] = torch.ones(c) + r(c).abs() * 0.1

    bn("bn1", 64)
    chans = [64, 128, 256, 512]
    in_c = 64
    for stage in range(1, 5):
        c = chans[stage - 1]
        for blk in range(2):
            p = f"layer{stage}.{blk}"
            first_in = in_c if blk == 0 else c
            sd[f"{p}.conv1.weight"] = r(c, first_in, 3, 3)
            bn(f"{p}.bn1", c)
            sd[f"{p}.conv2.weight"] = r(c, c, 3, 3)
            bn(f"{p}.bn2", c)
            if blk == 0 and (first_in != c or stage > 1):
                sd[f"{p}.downsample.0.weight"] = r(c, first_in, 1, 1)
                bn(f"{p}.downsample.1", c)
        in_c = c
    sd["fc.weight"] = r(512, 512)
    sd["fc.bias"] = r(512)
    return sd


@torch.no_grad()
def torch_resnet18_forward(sd, x):
    """Functional torchvision-resnet18 forward (eval mode)."""

    def bnf(x, key):
        return F.batch_norm(
            x, sd[key + ".running_mean"], sd[key + ".running_var"],
            sd[key + ".weight"], sd[key + ".bias"], training=False,
        )

    x = F.conv2d(x, sd["conv1.weight"], stride=2, padding=3)
    x = F.relu(bnf(x, "bn1"))
    x = F.max_pool2d(x, 3, stride=2, padding=1)
    for stage in range(1, 5):
        for blk in range(2):
            p = f"layer{stage}.{blk}"
            res = x
            stride = 2 if (blk == 0 and stage > 1) else 1
            y = F.conv2d(x, sd[f"{p}.conv1.weight"], stride=stride, padding=1)
            y = F.relu(bnf(y, f"{p}.bn1"))
            y = F.conv2d(y, sd[f"{p}.conv2.weight"], padding=1)
            y = bnf(y, f"{p}.bn2")
            if f"{p}.downsample.0.weight" in sd:
                res = bnf(
                    F.conv2d(x, sd[f"{p}.downsample.0.weight"], stride=stride),
                    f"{p}.downsample.1",
                )
            x = F.relu(y + res)
    x = x.mean(dim=(2, 3))
    return x @ sd["fc.weight"].T + sd["fc.bias"]


def test_resnet_matches_torch_oracle():
    sd = make_torchvision_sd()
    variables = convert_torchvision_resnet18({k: v.numpy() for k, v in sd.items()})
    model = ResNet18()
    rng = np.random.RandomState(0)
    x = rng.randn(2, 64, 64, 3).astype(np.float32)  # small spatial for speed

    ours = model.apply(variables, jnp.asarray(x))
    oracle = torch_resnet18_forward(sd, torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(ours), oracle.numpy(), atol=5e-4)


def test_flow_to_input_pads_channel():
    flow = jnp.ones((1, 224, 224, 2))
    x = flow_to_input(flow)
    assert x.shape == (1, 224, 224, 3)
    assert float(x[..., 2].max()) == 0.0


def test_of_feats_cli_roundtrip(tmp_path):
    from egoego_release_tpu.preprocess.of_feats import build_encoder, extract_folder

    flow_dir = os.path.join(tmp_path, "seq", "raft_flows")
    os.makedirs(flow_dir)
    rng = np.random.RandomState(1)
    for i in range(3):
        np.save(os.path.join(flow_dir, f"{i:05d}.npy"),
                rng.randn(100, 120, 2).astype(np.float32))  # non-224 input
    encode = build_encoder(None)
    n = extract_folder(flow_dir, encode, batch=2)
    assert n == 3
    out_dir = flow_dir.replace("raft_flows", "raft_of_feats")
    feats = np.load(os.path.join(out_dir, "00000.npy"))
    assert feats.shape == (512,)
    assert np.isfinite(feats).all()


def test_qpos_expert_conversion():
    from egoego_release_tpu.preprocess.qpos import motion_to_expert

    rng = np.random.RandomState(2)
    t = 20
    trans = np.cumsum(rng.randn(t, 3).astype(np.float32) * 0.02, axis=0)
    aa = (rng.randn(t, 22, 3) * 0.2).astype(np.float32)
    rest = rng.randn(22, 3).astype(np.float32) * 0.1
    rest[0] = 0

    expert = motion_to_expert(trans, aa, rest)
    assert expert["qpos"].shape == (t, 76)
    assert expert["qvel"].shape == (t - 1, 75)
    assert expert["head_pose"].shape == (t, 7)
    assert expert["head_vels"].shape == (t, 6)
    assert expert["obj_head_relative_poses"].shape == (t, 7)
    for v in expert.values():
        if isinstance(v, np.ndarray):
            assert np.isfinite(v).all()

    # qpos roundtrip: decode back to SMPL and check the root trans survives
    from egoego_release_tpu.ops.geometry import qpos_to_smpl

    tr2, aa2 = qpos_to_smpl(jnp.asarray(expert["qpos"]))
    np.testing.assert_allclose(np.asarray(tr2), trans, atol=1e-4)
    from scipy.spatial.transform import Rotation as sR
    err = (sR.from_rotvec(np.asarray(aa2)[:, :22].reshape(-1, 3)).inv()
           * sR.from_rotvec(aa.reshape(-1, 3))).magnitude()
    assert err.max() < 1e-3


def test_ares_processing_cli(tmp_path):
    import joblib
    import jax.numpy as jnp
    from egoego_release_tpu.preprocess.ares import process_root

    rng = np.random.RandomState(5)
    # synthetic SMPL model npz
    V, J = 60, 52
    smplh = os.path.join(tmp_path, "smplh", "male")
    os.makedirs(smplh)
    parents = np.zeros(J, dtype=np.int64)
    parents[1:22] = [0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19]
    parents[22:] = 20
    w = np.abs(rng.randn(V, J)); w /= w.sum(-1, keepdims=True)
    np.savez(os.path.join(smplh, "model.npz"),
             v_template=rng.randn(V, 3) * 0.3,
             shapedirs=rng.randn(V, 3, 16) * 0.01,
             posedirs=rng.randn(V, 3, (J - 1) * 9) * 0.001,
             J_regressor=np.abs(rng.randn(J, V)) / V,
             weights=w, kintree_table=np.stack([parents, np.arange(J)]))

    # synthetic rendered sequence: flows + motion npz
    seq = os.path.join(tmp_path, "rendered", "office_0", "seq1")
    os.makedirs(os.path.join(seq, "raft_flows"))
    t = 20
    for i in range(t - 1):
        np.save(os.path.join(seq, "raft_flows", f"{i:05d}.npy"),
                rng.randn(8, 8, 2).astype(np.float32))
    np.savez(os.path.join(seq, "ori_motion_seq.npz"),
             root_orient=(rng.randn(t, 3) * 0.2).astype(np.float32),
             pose_body=(rng.randn(t, 63) * 0.2).astype(np.float32),
             trans=np.cumsum(rng.randn(t, 3) * 0.01, 0).astype(np.float32),
             betas=np.zeros(16, np.float32), gender="male")

    out = process_root(os.path.join(tmp_path, "rendered"),
                       os.path.join(tmp_path, "smplh"),
                       os.path.join(tmp_path, "out"))
    data = joblib.load(out)
    rec = data["office_0-seq1"]
    assert rec["head_qpos"].shape == (t, 7)
    assert len(rec["of_files"]) == t - 1
    # scene split: office_0 is an ARES TEST scene
    test = joblib.load(os.path.join(tmp_path, "out", "test_ares_smplh_motion.p"))
    assert len(test) == 1


def test_gravitynet_upper_bound_and_jvel_norm():
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation as sR
    from egoego_release_tpu.models.gravitynet import gravitynet_eval_upper_bound
    from egoego_release_tpu.diffusion.gaussian_diffusion import (
        NormStats, normalize_jvel, de_normalize_jvel,
    )

    rng = np.random.RandomState(6)
    t = 15
    slam_rot = sR.random(t, random_state=7).as_matrix().astype(np.float32)
    slam_trans = np.cumsum(rng.randn(t, 3) * 0.01, 0).astype(np.float32)
    gt_rot = sR.random(random_state=8).as_matrix().astype(np.float32)
    out = gravitynet_eval_upper_bound(
        jnp.asarray(gt_rot), jnp.asarray(slam_rot), jnp.asarray(slam_trans),
        jnp.float32(3.0), jnp.asarray([1.0, 2.0, 3.0]),
    )
    np.testing.assert_allclose(np.asarray(out["head_trans"][0]), [1, 2, 3], atol=1e-5)
    d_out = np.linalg.norm(np.diff(np.asarray(out["head_trans"]), 0, 0) if False else
                           np.diff(np.asarray(out["head_trans"]), axis=0), axis=1)
    d_in = np.linalg.norm(np.diff(slam_trans, axis=0), axis=1)
    np.testing.assert_allclose(d_out, 3.0 * d_in, rtol=1e-3)

    stats = NormStats(jnp.zeros((22, 3)), jnp.ones((22, 3)),
                      jnp.full((22, 3), -2.0), jnp.full((22, 3), 2.0))
    v = jnp.asarray(rng.randn(5, 22, 3).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(de_normalize_jvel(normalize_jvel(v, stats), stats)),
        np.asarray(v), atol=1e-5,
    )
