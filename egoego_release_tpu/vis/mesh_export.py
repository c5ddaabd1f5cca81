"""Mesh export for visualization (host-side, optional).

Replaces the mesh-writing side of the reference's Blender pipeline
(egoego/vis/blender_vis_mesh_motion.py:103 save_verts_faces_to_mesh_file and
trainer gen_full_body_vis): runs SMPL-H LBS on the predicted motion and
writes per-frame .obj files that the reference's bpy scripts (or any DCC
tool) can consume unchanged.  Blender/ffmpeg invocation stays out of the
compute framework.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp


def save_obj(path: str, verts: np.ndarray, faces: np.ndarray) -> None:
    """Minimal OBJ writer (v/f records, 1-indexed faces)."""
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for tri in faces + 1:
            f.write(f"f {tri[0]} {tri[1]} {tri[2]}\n")


def export_obj_sequence(
    smplh_path: str,
    local_aa: np.ndarray,   # (T, 22, 3)
    root_pos: np.ndarray,   # (T, 3)
    out_dir: str,
    betas: np.ndarray | None = None,
    gender: str = "male",
    batch: int = 32,
) -> list[str]:
    """LBS the predicted motion and write one .obj per frame.  Returns paths."""
    from egoego_release_tpu.ops.smpl import lbs, load_smpl_npz

    model = load_smpl_npz(os.path.join(smplh_path, gender, "model.npz"))
    t = local_aa.shape[0]
    n_betas = model.shapedirs.shape[-1]
    if betas is None:
        betas = np.zeros((n_betas,), np.float32)

    # pad 22 -> 52 joints with zero hand poses (run_smpl_model:21-23)
    full_aa = np.zeros((t, model.parents.shape[0], 3), np.float32)
    full_aa[:, :22] = local_aa

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    faces = np.asarray(model.faces) if model.faces is not None else None
    assert faces is not None, "model npz has no faces ('f')"
    for start in range(0, t, batch):
        end = min(start + batch, t)
        _, verts = lbs(
            model,
            jnp.asarray(np.tile(betas[None], (end - start, 1))),
            jnp.asarray(full_aa[start:end]),
            jnp.asarray(root_pos[start:end].astype(np.float32)),
        )
        verts = np.asarray(verts)
        for i in range(end - start):
            path = os.path.join(out_dir, f"{start + i:05d}.obj")
            save_obj(path, verts[i], faces)
            paths.append(path)
    return paths
