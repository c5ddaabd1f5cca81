"""Device floor-height clustering vs the host numpy/sklearn oracle.

The host `determine_floor_height_and_contacts` (itself golden-tested
against the reference in test_preprocess_amass.py) serves as the
independent oracle; `ops.floor.floor_height` must reproduce its
floor-height output on everything except the documented knife-edge
deviations (f32 eps rounding, sklearn's expansion-order border ties),
which the fixtures below deliberately avoid by keeping cluster gaps away
from [eps, 2*eps] boundaries.
"""

import numpy as np
import jax.numpy as jnp

from egoego_release_tpu.ops import floor as floor_mod
from egoego_release_tpu.ops.geometry import determine_floor_height_and_contacts

EPS = 0.005


def _seq_from_toes(left_z, right_z, left_xy=None, right_xy=None):
    """Build a (T, 22, 3) sequence with prescribed toe trajectories; all
    other joints move fast enough to be irrelevant."""
    t = len(left_z)
    rng = np.random.RandomState(0)
    seq = np.cumsum(rng.randn(t, 22, 3).astype(np.float32) * 0.5, axis=0)
    seq[:, 10] = 0.0
    seq[:, 11] = 0.0
    if left_xy is not None:
        seq[:, 10, :2] = left_xy
    if right_xy is not None:
        seq[:, 11, :2] = right_xy
    seq[:, 10, 2] = left_z
    seq[:, 11, 2] = right_z
    return seq


def _check(seq, atol=1e-6):
    want = determine_floor_height_and_contacts(seq, fps=30)[0]
    got = float(floor_mod.floor_height(jnp.asarray(seq)))
    np.testing.assert_allclose(got, float(want), atol=atol)
    return got


def test_no_static_frames_returns_zero():
    rng = np.random.RandomState(1)
    # every toe moves >> FLOOR_VEL_THRESH per frame
    seq = np.cumsum(rng.randn(20, 22, 3).astype(np.float32) * 0.2, axis=0)
    got = _check(seq)
    assert got == 0.0


def test_single_cluster_exact_median():
    # both toes static at jittered heights around one level (odd count)
    z = 0.03 + np.linspace(-0.001, 0.001, 15).astype(np.float32)
    seq = _seq_from_toes(z, z + 0.0005)
    _check(seq)


def test_two_clusters_picks_min_median():
    # floor cluster at ~0.02, raised cluster at ~0.30 (gap >> 2*eps)
    t = 24
    z_l = np.full(t, 0.02, np.float32)
    z_l[:8] += np.linspace(0, 0.002, 8)
    z_r = np.full(t, 0.30, np.float32)
    z_r[-8:] -= np.linspace(0, 0.002, 8)
    seq = _seq_from_toes(z_l, z_r)
    got = _check(seq)
    assert abs(got - (0.02 - 0.01)) < 0.01  # floor cluster wins


def test_noise_only_forms_one_cluster():
    # static heights pairwise > eps apart and < min_samples per ball:
    # every point is DBSCAN noise; the reference treats the -1 label as a
    # cluster, so the floor is the median of ALL the noise points
    z = np.asarray([0.00, 0.02, 0.05, 0.09, 0.14, 0.20], np.float32)
    z = np.repeat(z, 2)[:12]  # repeats are 0-distance pairs: count 2 < 3
    seq = _seq_from_toes(z, z + 1.0)  # right toe far above, also sparse
    _check(seq)


def test_noise_cluster_can_win_the_floor():
    # a tight cluster ABOVE scattered noise points BELOW: the noise
    # median undercuts the cluster median (reference quirk :235).  The
    # right toe dwells two frames per level (so one static sample per
    # level), levels spaced 0.042 >> eps -> every sample is noise.
    z_l = np.full(20, 0.5, np.float32)           # tight cluster at 0.5
    z_r = np.repeat(np.linspace(0.0, 0.38, 10), 2).astype(np.float32)
    seq = _seq_from_toes(z_l, z_r)
    got = _check(seq)
    assert got < 0.4  # the scattered-noise median beat the 0.5 cluster


def test_even_sized_cluster_mean_of_middles():
    z = np.asarray([0.010, 0.011, 0.013, 0.018] * 3, np.float32)
    seq = _seq_from_toes(z, z + 2.0)  # right toe sparse/high
    _check(seq)


def test_border_point_joins_cluster():
    # .0249's ball holds only {.020, .0249} (< min_samples) -> border of
    # the .016-.020 core run; it must still count toward the median.
    # (It sits LAST so the repeated final velocity keeps it static.)
    z = np.asarray(
        [0.50, 0.60, 0.70, 0.016, 0.017, 0.018, 0.019, 0.020, 0.0249],
        np.float32,
    )
    seq = _seq_from_toes(z, z + 3.0)
    got = _check(seq)
    # cluster = the six low heights, median (.018+.019)/2, offset -0.01
    np.testing.assert_allclose(got, 0.0185 - 0.01, atol=1e-6)


def test_partially_static_mixed_motion():
    # left toe alternates static/fast; right toe static throughout
    t = 30
    z_l = np.zeros(t, np.float32)
    z_l[::2] = np.linspace(0, 3.0, 15)  # big jumps -> those frames move
    z_r = np.full(t, 0.015, np.float32)
    seq = _seq_from_toes(z_l, z_r)
    _check(seq)


def test_realistic_fk_sequences_match_host():
    # walking-like global joints: slow vertical toe oscillation with
    # contact plateaus — the shape the eval paths actually see
    rng = np.random.RandomState(7)
    for s in range(4):
        t = 40
        seq = rng.randn(t, 22, 3).astype(np.float32) * 0.05
        phase = np.linspace(0, 4 * np.pi, t)
        seq[:, 10, 2] = np.maximum(0.02, 0.1 * np.sin(phase + s))
        seq[:, 11, 2] = np.maximum(0.02, 0.1 * np.cos(phase + s))
        seq[:, 10, :2] = np.cumsum(rng.randn(t, 2) * 0.001, 0)
        seq[:, 11, :2] = np.cumsum(rng.randn(t, 2) * 0.001, 0)
        _check(seq)


def test_batched_matches_per_sequence():
    rng = np.random.RandomState(11)
    seqs = []
    for s in range(5):
        t = 25
        seq = rng.randn(t, 22, 3).astype(np.float32) * 0.03
        seq[:, 10, 2] = 0.02 + 0.001 * rng.randn(t)
        seq[:, 11, 2] = 0.02 + 0.3 * (s % 2) + 0.001 * rng.randn(t)
        seqs.append(seq)
    batch = jnp.asarray(np.stack(seqs))
    got = np.asarray(floor_mod.floor_heights(batch))
    want = np.asarray(
        [float(floor_mod.floor_height(jnp.asarray(s))) for s in seqs]
    )
    np.testing.assert_array_equal(got, want)


def test_minimal_two_frames():
    z = np.asarray([0.02, 0.02], np.float32)
    seq = _seq_from_toes(z, z)
    _check(seq)


def test_bridging_point_merges_clusters():
    """At min_samples=3 a point within eps of two groups is always CORE
    (its ball already holds >= 3 points), so it chains them into one
    cluster — there is no ambiguous border assignment at this parameter
    setting, and device/sklearn must agree on the merged median."""
    z = np.asarray(
        [0.0000, 0.0005, 0.0010, 0.0045, 0.0080, 0.0085, 0.0085], np.float32
    )
    z = np.concatenate([z, np.asarray([5.0] * 5, np.float32)])
    seq = _seq_from_toes(z, z + 9.0)
    _check(seq)
