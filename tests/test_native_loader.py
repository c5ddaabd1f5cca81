"""Native C++ npy batch loader vs numpy, on synthetic and real fixture files."""

import os

import numpy as np
import pytest

from egoego_release_tpu.data import native_loader


def test_native_loader_builds_and_matches_numpy(tmp_path):
    rng = np.random.RandomState(0)
    paths = []
    ref = []
    for i in range(10):
        if i % 2 == 0:
            a = rng.randn(512).astype(np.float32)
        else:
            a = rng.randn(512).astype(np.float64)  # f8 payloads get converted
        p = os.path.join(tmp_path, f"{i}.npy")
        np.save(p, a)
        paths.append(p)
        ref.append(a.astype(np.float32))
    out = native_loader.load_npy_batch(paths, 512, n_threads=4)
    np.testing.assert_allclose(out, np.stack(ref), atol=1e-6)
    # the native lib should actually be in use on this image (g++ present)
    assert native_loader._lib() is not None


def test_native_loader_bad_file_falls_back(tmp_path):
    good = os.path.join(tmp_path, "good.npy")
    np.save(good, np.ones(8, np.float32))
    bad = os.path.join(tmp_path, "bad.npy")
    np.save(bad, np.ones((4, 2), np.int32))  # unsupported dtype for native
    out = native_loader.load_npy_batch([good, bad], 8)
    np.testing.assert_allclose(out[0], 1.0)
    np.testing.assert_allclose(out[1], 1.0)  # numpy fallback converted ints


@pytest.mark.skipif(
    not os.path.exists("/root/reference/test_data/ares/demo_ares_data.p"),
    reason="fixture not available",
)
def test_native_loader_on_real_fixture():
    import glob

    files = sorted(glob.glob(
        "/root/reference/test_data/ares/frl_apartment_4/*/raft_of_feats/*.npy"
    ))[:20]
    out = native_loader.load_npy_batch(files, 512)
    ref = np.stack([np.load(f).astype(np.float32) for f in files])
    np.testing.assert_allclose(out, ref, atol=1e-6)
