"""Floor-height estimation as a fixed-shape XLA program.

Device twin of the floor-height result of
`ops.geometry.determine_floor_height_and_contacts` (reference
egoego/utils/process_amass_dataset.py:160-338): per-sequence toe-contact
clustering — static toe frames (speed < FLOOR_VEL_THRESH), 1-D DBSCAN
(eps=0.005, min_samples=3) over their heights with the noise label
participating as a cluster, floor = the minimum cluster median, offset by
FLOOR_HEIGHT_OFFSET; 0.0 when no frame is static.

Why a device version exists: the batched/pipelined eval paths previously
fetched every (N, T, 22, 3) joint-position array through the axon tunnel
purely to run this host-side scalar clustering (a full round trip per
fetch, plus the floors' upload and an extra program dispatch — BASELINE.md
round-4 host-work analysis).  Computing the floors inside the already-
dispatched GT-prep / metric programs removes those round trips entirely.

The whole program is O(M log M) in M = 2T static candidates: one sort,
vectorized `searchsorted` neighbourhood counts, cumulative scans for the
cluster labels, and segment-reduce + two gathers for the cluster medians —
1-D DBSCAN clusters are CONTIGUOUS ranges in sorted order (see
`_cluster_labels`), so no pairwise matrix is ever built.

Documented deviation vs the host implementation (sklearn DBSCAN), also
recorded in REFERENCE_PARITY.md: eps-ball membership is decided in float32
(`h + eps` rounding) where sklearn compares |hi - hj| <= eps in float64,
so only point pairs within one f32 ulp of exactly eps apart can cluster
differently.  Border assignment is NOT a deviation despite the
nearest-core rule below: at min_samples=3 a point within eps of two
clusters is always itself core (its closed ball already holds >= 3
points), so every true border point has exactly one reachable cluster and
the nearest-core rule coincides with sklearn's expansion order
(tests/test_floor_device.py::test_bridging_point_merges_clusters).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from egoego_release_tpu.ops.geometry import (
    FLOOR_HEIGHT_OFFSET,
    FLOOR_VEL_THRESH,
)

_EPS = 0.005
_MIN_SAMPLES = 3
_LEFT_TOE, _RIGHT_TOE = 10, 11  # SMPL-22 leftToeBase / rightToeBase


def _toe_speed(seq: jnp.ndarray) -> jnp.ndarray:
    """Per-frame displacement norm, final frame repeating the last value
    (process_amass_dataset.py's np.append(vel, vel[-1]))."""
    v = jnp.linalg.norm(seq[1:] - seq[:-1], axis=-1)
    return jnp.concatenate([v, v[-1:]])


def _cluster_labels(hs: jnp.ndarray, n_valid: jnp.ndarray):
    """1-D DBSCAN labels over sorted heights `hs` (invalid entries pushed to
    the end as +inf).  Returns (labels, core) where labels[i] in [0, M) is
    point i's cluster, M marks noise/invalid.

    Sorted 1-D structure makes every step a scan:
    - a point is core iff its closed eps-ball holds >= min_samples valid
      points (two searchsorted calls);
    - consecutive core points belong to one cluster iff their gap <= eps,
      so cluster ids are a cumsum over gap-breaks;
    - a border point attaches to the nearest core within eps (a border
      point can only ever reach ONE cluster at min_samples=3 — module
      docstring); nothing can sit strictly between a border point and the
      core it reaches (it would land in the border's ball and promote it
      to core), so every cluster's member set is a CONTIGUOUS range of the
      sorted order (noise fills the gaps) — which is what lets the caller
      take medians with segment reductions instead of per-cluster masks.
    """
    m = hs.shape[0]
    pos = jnp.arange(m)
    valid = pos < n_valid

    hi = jnp.searchsorted(hs, hs + _EPS, side="right")
    lo = jnp.searchsorted(hs, hs - _EPS, side="left")
    core = valid & (hi - lo >= _MIN_SAMPLES)

    core_h = jnp.where(core, hs, -jnp.inf)
    prev_core_h = jax.lax.cummax(core_h)
    prev_excl = jnp.concatenate(
        [jnp.asarray([-jnp.inf], hs.dtype), prev_core_h[:-1]]
    )
    new_cluster = core & (hs - prev_excl > _EPS)
    core_label = jnp.cumsum(new_cluster) - 1

    next_core_h = jnp.flip(
        jax.lax.cummin(jnp.flip(jnp.where(core, hs, jnp.inf)))
    )
    lab_fwd = jax.lax.cummax(jnp.where(core, core_label, -1))
    big = jnp.asarray(m, core_label.dtype)
    lab_bwd = jnp.flip(
        jax.lax.cummin(jnp.flip(jnp.where(core, core_label, big)))
    )

    d_prev = hs - prev_core_h
    d_next = next_core_h - hs
    take_prev = d_prev <= d_next
    border_dist = jnp.where(take_prev, d_prev, d_next)
    border_label = jnp.where(take_prev, lab_fwd, lab_bwd)
    border = valid & ~core & (border_dist <= _EPS)

    labels = jnp.where(
        core, core_label, jnp.where(border, border_label, big)
    )
    return jnp.where(valid, labels, big), core


def floor_height(jpos: jnp.ndarray) -> jnp.ndarray:
    """(T, 22, 3) global joint positions -> scalar f32 offset floor height.

    Matches `determine_floor_height_and_contacts(jpos, fps=30)[0]` up to the
    module-docstring deviations (fps only affects the terrain-discard
    heuristic, which the eval paths never consume).
    """
    lt, rt = jpos[:, _LEFT_TOE], jpos[:, _RIGHT_TOE]
    static = (
        jnp.concatenate([_toe_speed(lt), _toe_speed(rt)]) < FLOOR_VEL_THRESH
    )
    h = jnp.concatenate([lt[:, 2], rt[:, 2]]).astype(jnp.float32)
    m = h.shape[0]
    n_valid = jnp.sum(static)

    hs = jnp.sort(jnp.where(static, h, jnp.inf))
    labels, _core = _cluster_labels(hs, n_valid)
    pos = jnp.arange(m)

    # contiguous-range medians for the real clusters (segment id m = the
    # noise/invalid dump bin, excluded here and handled below)
    starts = jax.ops.segment_min(pos, labels, num_segments=m + 1)[:m]
    ends = jax.ops.segment_max(pos, labels, num_segments=m + 1)[:m]
    sizes_all = jax.ops.segment_sum(
        jnp.ones_like(pos), labels, num_segments=m + 1
    )
    sizes = sizes_all[:m]
    exists = sizes > 0
    s_safe = jnp.where(exists, starts, 0)
    lo_med = hs[jnp.clip(s_safe + (sizes - 1) // 2, 0, m - 1)]
    hi_med = hs[jnp.clip(s_safe + sizes // 2, 0, m - 1)]
    med = (lo_med + hi_med) * 0.5
    del ends  # start+size gathers cover the contiguous range
    cluster_min = jnp.min(jnp.where(exists, med, jnp.inf))

    # the noise "cluster" (label -1 participates like any other in the
    # reference, :235) is NOT contiguous: take its median by noise-rank
    is_noise = (labels == m) & (pos < n_valid)
    n_noise = jnp.sum(is_noise)
    nrank = jnp.cumsum(is_noise)  # 1-based among noise points
    lo_n = jnp.sum(jnp.where(is_noise & (nrank == (n_noise - 1) // 2 + 1), hs, 0.0))
    hi_n = jnp.sum(jnp.where(is_noise & (nrank == n_noise // 2 + 1), hs, 0.0))
    noise_med = jnp.where(n_noise > 0, (lo_n + hi_n) * 0.5, jnp.inf)

    floor = jnp.minimum(cluster_min, noise_med)
    return jnp.where(
        n_valid > 0, floor - jnp.float32(FLOOR_HEIGHT_OFFSET), jnp.float32(0.0)
    )


def floor_heights(jpos: jnp.ndarray) -> jnp.ndarray:
    """(N, T, 22, 3) -> (N,) f32 per-sequence offset floor heights."""
    return jax.vmap(floor_height)(jpos)
