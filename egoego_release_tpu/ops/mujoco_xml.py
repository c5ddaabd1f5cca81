"""MuJoCo humanoid XML -> kinematic skeleton (no simulator).

Port of the skeleton-loading side of kinpoly's `Humanoid`
(kinpoly/relive/utils/torch_humanoid.py:17-240): parses the mujoco model XML
body tree (e.g. kinpoly/assets/mujoco_models/humanoid_smpl_neutral_mesh.xml)
into parents + rest offsets, and FKs qpos through it with batched JAX ops —
so kinpoly-format data can be decoded with the exact mujoco skeleton
constants instead of SMPL rest offsets.

Conventions verified against the bundled XMLs: body `pos` attributes are
world-frame rest positions (offsets = pos - parent pos); each non-root body
carries three hinge joints in z, y, x order, matching the qpos layout
[trans(3), root quat wxyz(4), 23 x ZYX euler].
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from egoego_release_tpu.ops import rotations as rot

Array = jax.Array


class MujocoSkeleton(NamedTuple):
    body_names: tuple[str, ...]
    parents: np.ndarray       # (J,) int, parents[0] = -1
    offsets: jnp.ndarray      # (J, 3) rest bone offsets (root = 0)
    rest_pos: jnp.ndarray     # (J, 3) world-frame rest positions

    @property
    def head_idx(self) -> int:
        return self.body_names.index("Head")


def load_mujoco_skeleton(xml_path: str) -> MujocoSkeleton:
    tree = ET.parse(xml_path)
    root_body = tree.getroot().find("worldbody").find("body")
    names, parents, pos = [], [], []

    def walk(body, parent_idx):
        idx = len(names)
        names.append(body.attrib["name"])
        parents.append(parent_idx)
        pos.append(np.fromstring(body.attrib["pos"], sep=" "))
        for child in body.findall("body"):
            walk(child, idx)

    walk(root_body, -1)
    rest_pos = np.stack(pos).astype(np.float32)
    parents = np.asarray(parents, dtype=np.int32)
    offsets = rest_pos.copy()
    offsets[1:] = rest_pos[1:] - rest_pos[parents[1:]]
    offsets[0] = 0.0
    return MujocoSkeleton(
        body_names=tuple(names),
        parents=parents,
        offsets=jnp.asarray(offsets),
        rest_pos=jnp.asarray(rest_pos),
    )


def _levels(parents: np.ndarray):
    depth = np.zeros(len(parents), dtype=np.int32)
    for j in range(1, len(parents)):
        depth[j] = depth[parents[j]] + 1
    return [
        (np.nonzero(depth == d)[0], parents[np.nonzero(depth == d)[0]])
        for d in range(1, depth.max() + 1)
    ]


def fk_generic(local_quat: Array, offsets: Array, parents: np.ndarray,
               root_trans: Array | None = None):
    """Level-parallel FK over an arbitrary kinematic tree (the generic form
    of ops/fk.fk_from_local_quat)."""
    offsets = jnp.broadcast_to(offsets, local_quat.shape[:-1] + (3,))
    gq, gp = local_quat, offsets
    for js, ps in _levels(parents):
        parent_q = gq[..., ps, :]
        parent_p = gp[..., ps, :]
        gq = gq.at[..., js, :].set(rot.quat_multiply(parent_q, local_quat[..., js, :]))
        gp = gp.at[..., js, :].set(
            rot.quat_apply(parent_q, offsets[..., js, :]) + parent_p
        )
    if root_trans is not None:
        gp = gp + root_trans[..., None, :]
    return gq, gp


def qpos_fk(skeleton: MujocoSkeleton, qpos: Array):
    """qpos (T, 76) -> world body quats (T, J, 4) + positions (T, J, 3),
    the `Humanoid.qpos_fk` wbquat/wbpos outputs (torch_humanoid.py:241)."""
    t = qpos.shape[0]
    j = len(skeleton.body_names)
    root_quat = qpos[:, 3:7]
    eulers = qpos[:, 7:].reshape(t, j - 1, 3)

    # intrinsic ZYX euler -> quaternion per body (same codec as ops/geometry)
    a, b, c = eulers[..., 0], eulers[..., 1], eulers[..., 2]
    ca, sa = jnp.cos(a), jnp.sin(a)
    cb, sb = jnp.cos(b), jnp.sin(b)
    cc, sc = jnp.cos(c), jnp.sin(c)
    m = jnp.stack(
        [
            ca * cb, ca * sb * sc - sa * cc, ca * sb * cc + sa * sc,
            sa * cb, sa * sb * sc + ca * cc, sa * sb * cc - ca * sc,
            -sb, cb * sc, cb * cc,
        ],
        axis=-1,
    ).reshape(eulers.shape[:-1] + (3, 3))
    joint_quat = rot.matrix_to_quat(m)

    local_quat = jnp.concatenate([root_quat[:, None, :], joint_quat], axis=1)
    return fk_generic(local_quat, skeleton.offsets, skeleton.parents,
                      root_trans=qpos[:, :3])
