"""Functional PoseTrajectory3D stand-in.

Implements the evo behaviors the reference uses
(head_normal_estimation_transformer.py:189-212, ares_headpose_dataset.py):
construction from positions/wxyz-quaternions/timestamps and
`align(traj_ref, correct_scale, correct_only_scale, n)` via the standard
Umeyama closed form (Umeyama 1991), applied the way evo applies it:
scale first, then the rigid transform.
"""

import numpy as np


def umeyama_alignment(x: np.ndarray, y: np.ndarray, with_scale: bool = False):
    """x, y: (3, N) source/target point sets.  Returns (r, t, c) with
    y ~ c * r @ x + t."""
    if x.shape != y.shape:
        raise ValueError("data matrices must have the same shape")
    m, n = x.shape
    mean_x = x.mean(axis=1)
    mean_y = y.mean(axis=1)
    sigma_x = 1.0 / n * (np.linalg.norm(x - mean_x[:, None]) ** 2)
    outer_sum = (y - mean_y[:, None]) @ (x - mean_x[:, None]).T
    cov_xy = outer_sum * 1.0 / n
    u, d, v = np.linalg.svd(cov_xy)
    if np.count_nonzero(d > np.finfo(d.dtype).eps) < m - 1:
        raise ValueError("Degenerate covariance rank, Umeyama alignment is not possible")
    s = np.eye(m)
    if np.linalg.det(u) * np.linalg.det(v) < 0.0:
        s[m - 1, m - 1] = -1
    r = u @ s @ v
    c = 1.0 / sigma_x * np.trace(np.diag(d) @ s) if with_scale else 1.0
    t = mean_y - c * r @ mean_x
    return r, t, c


class PoseTrajectory3D:
    def __init__(self, positions_xyz=None, orientations_quat_wxyz=None, timestamps=None):
        self._positions_xyz = np.asarray(positions_xyz, dtype=np.float64).copy()
        self._orientations_quat_wxyz = np.asarray(
            orientations_quat_wxyz, dtype=np.float64
        ).copy()
        self.timestamps = np.asarray(timestamps, dtype=np.float64)

    @property
    def positions_xyz(self):
        return self._positions_xyz

    @property
    def orientations_quat_wxyz(self):
        return self._orientations_quat_wxyz

    def scale(self, s: float):
        self._positions_xyz = self._positions_xyz * s

    def transform(self, r: np.ndarray, t: np.ndarray):
        self._positions_xyz = (r @ self._positions_xyz.T).T + t

    def align(self, traj_ref, correct_scale=False, correct_only_scale=False, n=-1):
        with_scale = correct_scale or correct_only_scale
        if n == -1:
            xs = self._positions_xyz
            ys = traj_ref._positions_xyz
        else:
            xs = self._positions_xyz[:n]
            ys = traj_ref._positions_xyz[:n]
        r_a, t_a, s = umeyama_alignment(xs.T, ys.T, with_scale)
        if correct_only_scale:
            self.scale(s)
        elif correct_scale:
            self.scale(s)
            self.transform(r_a, t_a)
        else:
            self.transform(r_a, t_a)
        return r_a, t_a, s
