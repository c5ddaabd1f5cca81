"""PWC-DC net vs the reference's own PWCNet.py module.

The CUDA correlation_package is replaced by a pure-torch refstub
(tests/refstubs/correlation_package) implementing the published cost-volume
op; the reference PWCDCNet then runs on CPU torch (with two compat patches:
the removed nn.init.kaiming_normal alias and the unconditional .cuda() in
warp()) and serves as the numerical oracle for the JAX port.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests")
import reforacle  # noqa: E402

from egoego_release_tpu.models.pwcnet import (  # noqa: E402
    convert_pwcnet,
    correlation,
    init_pwcnet,
    pwcnet_forward,
    warp,
)


@pytest.fixture(scope="module")
def ref_net():
    import torch

    reforacle.add_reference_paths()
    if "/root/reference/kinpoly" not in sys.path:
        sys.path.insert(0, "/root/reference/kinpoly")
    if not hasattr(torch.nn.init, "kaiming_normal"):  # removed alias
        torch.nn.init.kaiming_normal = torch.nn.init.kaiming_normal_
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self  # warp() masks (:166)
    try:
        import importlib

        pw = importlib.import_module("relive.data_process.PWCNet")
        torch.manual_seed(0)
        net = pw.PWCDCNet().eval()
    finally:
        torch.Tensor.cuda = orig_cuda
    return net


def test_correlation_matches_naive_loop():
    rng = np.random.RandomState(0)
    x1 = rng.randn(2, 6, 7, 5).astype(np.float32)
    x2 = rng.randn(2, 6, 7, 5).astype(np.float32)
    out = np.asarray(correlation(x1, x2, md=2))
    b, h, w, c = x1.shape
    md = 2
    x2p = np.pad(x2, ((0, 0), (md, md), (md, md), (0, 0)))
    for dy in range(-md, md + 1):
        for dx in range(-md, md + 1):
            k = (dy + md) * (2 * md + 1) + (dx + md)
            want = (x1 * x2p[:, md + dy:md + dy + h,
                             md + dx:md + dx + w]).mean(-1)
            np.testing.assert_allclose(out[..., k], want, atol=1e-6)


def test_warp_matches_torch_grid_sample(ref_net):
    import torch

    rng = np.random.RandomState(1)
    x = rng.randn(2, 8, 10, 3).astype(np.float32)
    flo = (rng.randn(2, 8, 10, 2) * 2).astype(np.float32)

    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        with torch.no_grad():
            ref = ref_net.warp(
                torch.from_numpy(x.transpose(0, 3, 1, 2)),
                torch.from_numpy(flo.transpose(0, 3, 1, 2)),
            ).numpy().transpose(0, 2, 3, 1)
    finally:
        torch.Tensor.cuda = orig_cuda
    ours = np.asarray(warp(x, flo))
    np.testing.assert_allclose(ours, ref, atol=2e-6)


def test_pwcnet_forward_matches_reference(ref_net):
    import torch

    params = convert_pwcnet(
        {k: v.numpy() for k, v in ref_net.state_dict().items()})
    rng = np.random.RandomState(2)
    im = rng.rand(1, 64, 64, 6).astype(np.float32)

    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        with torch.no_grad():
            ref_flow = ref_net(
                torch.from_numpy(im.transpose(0, 3, 1, 2))
            ).numpy().transpose(0, 2, 3, 1)
    finally:
        torch.Tensor.cuda = orig_cuda

    ours = np.asarray(pwcnet_forward(params, im[..., :3], im[..., 3:]))
    assert ours.shape == ref_flow.shape  # (1, 16, 16, 2)
    np.testing.assert_allclose(ours, ref_flow, atol=5e-4)


def test_pwcnet_training_pyramid(ref_net):
    import torch

    params = convert_pwcnet(
        {k: v.numpy() for k, v in ref_net.state_dict().items()})
    rng = np.random.RandomState(3)
    im = rng.rand(1, 64, 64, 6).astype(np.float32)

    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        ref_net.train()
        with torch.no_grad():
            ref_flows = ref_net(torch.from_numpy(im.transpose(0, 3, 1, 2)))
        ref_net.eval()
    finally:
        torch.Tensor.cuda = orig_cuda

    ours = pwcnet_forward(params, im[..., :3], im[..., 3:], training=True)
    assert len(ours) == len(ref_flows) == 5
    for o, r in zip(ours, ref_flows):
        np.testing.assert_allclose(
            np.asarray(o), r.numpy().transpose(0, 2, 3, 1), atol=5e-4)


def test_random_init_runs_and_jits():
    import jax

    params = init_pwcnet(jax.random.PRNGKey(0))
    rng = np.random.RandomState(4)
    im1 = rng.rand(2, 64, 64, 3).astype(np.float32)
    im2 = rng.rand(2, 64, 64, 3).astype(np.float32)
    flow = jax.jit(pwcnet_forward)(params, im1, im2)
    assert flow.shape == (2, 16, 16, 2)
    assert np.isfinite(np.asarray(flow)).all()
