"""VPoser v1 decoder: functional torch oracle + GIMO extraction CLI fixture.

The oracle re-implements the human_body_prior v1 decode path
(utils/gimo_utils/extract_pose_params.py consumes it) with plain torch ops on
random weights — independent of the JAX implementation under test.
"""

import os
import pickle

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from egoego_release_tpu.models.vposer import (  # noqa: E402
    LATENT_D,
    NUM_JOINTS,
    NUM_NEURONS,
    convert_vposer_state_dict,
    vposer_decode,
)
from egoego_release_tpu.ops.rotations import axis_angle_to_matrix  # noqa: E402


def _random_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)
    def lin(n_in, n_out):
        return (
            torch.randn(n_out, n_in, generator=g) * 0.2,
            torch.randn(n_out, generator=g) * 0.1,
        )
    w1, b1 = lin(LATENT_D, NUM_NEURONS)
    w2, b2 = lin(NUM_NEURONS, NUM_NEURONS)
    w3, b3 = lin(NUM_NEURONS, NUM_JOINTS * 6)
    return {
        "bodyprior_dec_fc1.weight": w1, "bodyprior_dec_fc1.bias": b1,
        "bodyprior_dec_fc2.weight": w2, "bodyprior_dec_fc2.bias": b2,
        "bodyprior_dec_out.weight": w3, "bodyprior_dec_out.bias": b3,
    }


def _oracle_decode_matrot(sd, latent):
    """Functional torch VPoser v1 decode (eval mode): fc1 -> lrelu(0.2) ->
    fc2 -> lrelu(0.2) -> out -> ContinousRotReprDecoder (column 6d)."""
    import torch.nn.functional as F

    x = torch.as_tensor(latent, dtype=torch.float32)
    x = F.leaky_relu(F.linear(x, sd["bodyprior_dec_fc1.weight"], sd["bodyprior_dec_fc1.bias"]), 0.2)
    x = F.leaky_relu(F.linear(x, sd["bodyprior_dec_fc2.weight"], sd["bodyprior_dec_fc2.bias"]), 0.2)
    x = F.linear(x, sd["bodyprior_dec_out.weight"], sd["bodyprior_dec_out.bias"])
    a = x.reshape(-1, 3, 2)
    b1 = F.normalize(a[:, :, 0], dim=1)
    dot = torch.sum(b1 * a[:, :, 1], dim=1, keepdim=True)
    b2 = F.normalize(a[:, :, 1] - dot * b1, dim=-1)
    b3 = torch.cross(b1, b2, dim=1)
    m = torch.stack([b1, b2, b3], dim=-1)
    return m.reshape(*latent.shape[:-1], NUM_JOINTS, 3, 3).numpy()


def test_vposer_decode_matches_torch_oracle():
    sd = _random_state_dict()
    params = convert_vposer_state_dict(sd)
    latent = np.random.RandomState(1).randn(5, LATENT_D).astype(np.float32)

    ref = _oracle_decode_matrot(sd, latent)
    ours = np.asarray(vposer_decode(params, latent, "matrot"))
    assert ours.shape == (5, NUM_JOINTS, 3, 3)
    np.testing.assert_allclose(ours, ref, atol=2e-5)

    # rotations are proper: R R^T = I, det = +1
    rrt = np.einsum("...ij,...kj->...ik", ours, ours)
    np.testing.assert_allclose(rrt, np.broadcast_to(np.eye(3), rrt.shape), atol=1e-5)
    assert np.all(np.linalg.det(ours) > 0.99)

    # aa output reconstructs the same rotation matrices
    aa = np.asarray(vposer_decode(params, latent, "aa"))
    assert aa.shape == (5, NUM_JOINTS, 3)
    np.testing.assert_allclose(np.asarray(axis_angle_to_matrix(aa)), ref, atol=1e-4)


def test_gimo_extraction_cli(tmp_path):
    from egoego_release_tpu.preprocess.gimo_pose import extract_all

    sd = _random_state_dict(seed=3)
    ckpt_path = tmp_path / "vposer_snapshot.pt"
    torch.save({"state_dict": sd}, ckpt_path)

    # build a 2-frame segmented_ori_data fixture
    rng = np.random.RandomState(7)
    smplx = tmp_path / "root" / "sceneA" / "seq1" / "smplx_local"
    os.makedirs(smplx)
    for i in range(2):
        rec = {
            "latent": torch.tensor(rng.randn(LATENT_D), dtype=torch.float32),
            "trans": torch.tensor(rng.randn(3), dtype=torch.float32),
            "orient": torch.tensor(rng.randn(3), dtype=torch.float32),
            "beta": torch.tensor(rng.randn(10), dtype=torch.float32),
        }
        with open(smplx / f"{i:04d}.pkl", "wb") as f:
            pickle.dump(rec, f)

    n = extract_all(str(tmp_path / "root"), str(tmp_path / "out"), str(ckpt_path))
    assert n == 1
    out = np.load(tmp_path / "out" / "sceneA" / "seq1.npz")
    assert out["poses"].shape == (2, NUM_JOINTS, 3)
    assert out["root_trans"].shape == (2, 3)
    assert out["root_orient"].shape == (2, 3)
    assert out["beta"].shape == (10,)
    assert np.isfinite(out["poses"]).all()
